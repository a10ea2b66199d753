"""Vectorized, jit-able negative samplers.

The reference burns most of each epoch in host-side python rejection loops
(``while (u, j) in train``: reference BPR.py:90-93, evaluation_adv.py:85-91,
SASRecLayers.py:322-326 — e.g. ~36 s batch-gen vs ~8 s train per ml-1m epoch,
see BASELINE.md). Rejection loops don't vectorize, so here sampling is
*fixed-round resampling*: draw R candidates per slot up front, take the first
one that does not collide with the user's train items. The residual
probability that all R draws collide is density^R (≲1e-20 at R=8 for these
datasets), which is far below the reference's run-to-run sampling variance.

Everything operates on the right-aligned history matrix ``hist [U, L]``
(0-padded), which doubles as the membership structure: ``j in train[u]`` is
``(hist[u] == j).any()``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def uniform_negatives(key, hist_rows, num_items: int, rounds: int = 8):
    """One uniform negative per row, rejecting the row's train items.

    Args:
      key: PRNG key.
      hist_rows: [B, L] int32 — train items of each slot's user (0-padded).
      num_items: catalog size (items are 1..num_items-1; 0 is the pad id).
      rounds: resampling rounds.

    Returns:
      [B] int32 negatives in [1, num_items).
    """
    b = hist_rows.shape[0]
    cand = jax.random.randint(key, (rounds, b), 1, num_items, dtype=jnp.int32)
    # [R, B] collision flags; hist is 0-padded and candidates are >= 1 so the
    # padding never collides.
    collide = (cand[:, :, None] == hist_rows[None, :, :]).any(-1)
    # Index of the first clean round per slot (fall back to the last draw).
    first_ok = jnp.argmax(~collide, axis=0)  # argmax of bool → first True
    any_ok = (~collide).any(axis=0)
    pick = jnp.where(any_ok, first_ok, rounds - 1)
    return cand[pick, jnp.arange(b)]


@partial(jax.jit, static_argnums=(1, 2, 3))
def sample_pair_epoch(key, num_pairs: int, batch_size: int, num_batches: int):
    """Shuffled batch index matrix for one epoch over the train pairs.

    Mirrors the reference's per-epoch shuffle + drop-remainder batching
    (evaluation_adv.py:59-72). Returns [num_batches, batch_size] int32.
    """
    need = num_batches * batch_size
    perm = jax.random.permutation(key, num_pairs)
    if need > num_pairs:
        # tiny datasets (num_pairs < batch_size): wrap the permutation so
        # one full batch still exists instead of a reshape error
        reps = -(-need // num_pairs)
        perm = jnp.tile(perm, reps)
    return perm[:need].reshape(num_batches, batch_size)


def sample_seq_batch(key, hist, eligible_users, maxlen: int,
                     num_items: int, batch_size: int, rounds: int = 8):
    """(user, seq, pos, neg) windows for sequence models.

    Semantics of the reference's ``WarpSampler``/``sample_function``
    (SASRecLayers.py:329-358): sample users with ≥2 train items; ``seq`` is
    the right-aligned window of the last ``maxlen`` items *excluding* the
    final one, ``pos`` the window shifted one step ahead, ``neg`` a uniform
    non-train item per non-pad position.

    Args:
      hist: [U, L] right-aligned train sequences (L ≥ maxlen + 1 is NOT
        required; shorter L just means shorter usable windows).
      eligible_users: [E] users with hist_len ≥ 2.

    Returns:
      (users [B], seq [B, maxlen], pos [B, maxlen], neg [B, maxlen]).
    """
    users, window, neg = sample_seq_window_batch(
        key, hist, eligible_users, maxlen, num_items, batch_size, rounds)
    return users, window[:, :-1], window[:, 1:], neg


def sample_seq_window_batch(key, hist, eligible_users, maxlen: int,
                            num_items: int, batch_size: int,
                            rounds: int = 8):
    """`sample_seq_batch` in packed form: (users, window [B, maxlen+1],
    neg [B, maxlen]) with seq = window[:, :-1] and pos = window[:, 1:]
    (identical PRNG draws — `sample_seq_batch` is a slice of this).

    Sequence models consume this through ``loss_window``: materializing
    the seq/pos overlap as ONE gather of 2T+1 rows per example (instead of
    3T) shrinks the backward's item-table scatter-add — the single most
    expensive non-matmul op of the SASRec step at reference geometry
    (~550 µs/step of ~2790, scripts/profile_seq_step.py)."""
    k_u, k_n = jax.random.split(key)
    idx = jax.random.randint(k_u, (batch_size,), 0, eligible_users.shape[0])
    users = eligible_users[idx]
    rows = hist[users]  # [B, L]
    L = rows.shape[1]
    if L >= maxlen + 1:
        window = rows[:, L - maxlen - 1:]
    else:
        window = jnp.pad(rows, ((0, 0), (maxlen + 1 - L, 0)))
    pos = window[:, 1:]   # [B, maxlen]

    # One negative per (slot, position): R resampling rounds, scanned so only
    # one [B, maxlen, L] collision tensor is live at a time.
    cand = jax.random.randint(k_n, (rounds, batch_size, maxlen), 1, num_items,
                              dtype=jnp.int32)

    def body(carry, cand_r):
        chosen, done = carry
        collide = (cand_r[:, :, None] == rows[:, None, :]).any(-1)  # [B, M]
        take = (~collide) & (~done)
        chosen = jnp.where(take, cand_r, chosen)
        return (chosen, done | ~collide), None

    init = (cand[-1], jnp.zeros((batch_size, maxlen), dtype=bool))
    (neg, _), _ = jax.lax.scan(body, init, cand)
    neg = jnp.where(pos != 0, neg, 0)  # pad positions carry no negative
    return users, window, neg
