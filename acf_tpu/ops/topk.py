"""HBM-efficient full-catalog top-K retrieval.

Serving-style recommendation needs the top-K items per user over the whole
catalog with the user's train items excluded. The naive route materializes
[B, num_items] scores in HBM and sorts; here scores are produced per item
tile under ``lax.map`` and reduced to per-tile top-K immediately, so only
[B, n_tiles·K] candidates ever exist before the final merge.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG = -3.0e38


@partial(jax.jit, static_argnames=("k", "item_tile"))
def topk_factored(u_repr, item_emb, hists, bias=None, k: int = 10,
                  item_tile: int = 4096):
    """Top-K (scores, item ids) per user for dot-factored scorers.

    Args:
      u_repr: [B, d] user representations.
      item_emb: [I, d] item table.
      hists: [B, L] train items to exclude (0-padded; id 0 always excluded).
      bias: optional [I] item bias.
      k: results per user.

    Returns:
      (scores [B, k], items [B, k]) sorted descending.
    """
    b, d = u_repr.shape
    num_items = item_emb.shape[0]
    n_tiles = -(-num_items // item_tile)
    pad = n_tiles * item_tile - num_items
    if pad:
        item_emb = jnp.pad(item_emb, ((0, pad), (0, 0)))
    if bias is not None and pad:
        bias = jnp.pad(bias, (0, pad))

    starts = jnp.arange(n_tiles) * item_tile

    def tile_fn(start):
        emb = jax.lax.dynamic_slice_in_dim(item_emb, start, item_tile)
        # HIGHEST: default-precision TPU matmuls truncate f32→bf16 and
        # reorder near-tie items vs the evaluator (CLAUDE.md gotcha)
        scores = jnp.dot(u_repr, emb.T,
                         precision=jax.lax.Precision.HIGHEST)  # [B, T]
        cols = start + jnp.arange(item_tile)
        if bias is not None:
            scores = scores + jax.lax.dynamic_slice_in_dim(
                bias, start, item_tile)[None, :]
        # mask pad id, catalog padding, and the user's train items
        invalid = (cols[None, :] == 0) | (cols[None, :] >= num_items)
        invalid = invalid | (cols[None, None, :] == hists[:, :, None]).any(1)
        scores = jnp.where(invalid, NEG, scores)
        s, idx = jax.lax.top_k(scores, k)
        return s, cols[idx]

    tile_scores, tile_items = jax.lax.map(tile_fn, starts)  # [n_tiles, B, k]
    all_s = jnp.swapaxes(tile_scores, 0, 1).reshape(b, n_tiles * k)
    all_i = jnp.swapaxes(tile_items, 0, 1).reshape(b, n_tiles * k)
    s, idx = jax.lax.top_k(all_s, k)
    return s, jnp.take_along_axis(all_i, idx, axis=1)


def _topk_core(model, k: int):
    """(params, ub, hb) -> (scores, items) for one user batch — the shared
    body of the single-batch and bulk serving programs."""
    fs = getattr(model, "factored_scorer", lambda: None)()
    if fs is not None:
        def core(params, ub, hb):
            # HIGHEST like the evaluator (eval/full_rank.py): encoder
            # matmuls otherwise truncate f32→bf16 on TPU and reorder
            # near-tie items vs the evaluator's rankings
            with jax.default_matmul_precision("highest"):
                reprs = fs[0](params, ub, hb)
            table, bias = fs[1](params)
            return topk_factored(reprs, table, hb, bias=bias, k=k)
    else:
        def core(params, ub, hb):
            with jax.default_matmul_precision("highest"):
                scores = model.score_all(params, ub, hb)
            rows = jnp.arange(ub.shape[0])
            scores = scores.at[:, 0].set(NEG)
            scores = scores.at[rows[:, None], hb].set(NEG)
            return jax.lax.top_k(scores, k)
    return core


def _rec_fn(model, key, build):
    """Per-model jit cache (instances hash by identity, same pattern as
    ``factored_scorer``). Folding scorer + table + top-K into as few
    dispatches as possible matters on remote-attached TPUs where each call
    carries ~15-20 ms fixed cost (see CLAUDE.md)."""
    cache = getattr(model, "_rec_fns", None)
    if cache is None:
        cache = model._rec_fns = {}
    fn = cache.get(key)
    if fn is None:
        fn = cache[key] = build()
    return fn


def _hist_dev(data):
    h = getattr(data, "_hist_dev", None)
    if h is None:
        h = jax.device_put(jnp.asarray(data.hist))
        try:
            data._hist_dev = h
        except AttributeError:  # frozen dataclass — just don't cache
            pass
    return h


def recommend(model, params, data, users, k: int = 10, batch_users: int = 512):
    """Serving entry point: top-K unseen items per user.

    Works for any model: uses the factored scorer when available, falls back
    to ``score_all`` + masked ``top_k``. Large requests (>= 4 batches) run
    as ONE device program (``lax.map`` over user batches, history table
    device-resident) — a single dispatch for the whole user base; smaller
    requests dispatch one jitted call per batch, converted to numpy once at
    the end so device work pipelines across batches.
    """
    import numpy as np

    users = np.asarray(users, dtype=np.int32)
    n = len(users)
    nb = -(-n // batch_users)
    if nb >= 4:
        # bulk: pad users (user 0 = pad row, sliced off), one dispatch
        hist = _hist_dev(data)
        up = np.zeros(nb * batch_users, dtype=np.int32)
        up[:n] = users

        def build():
            core = _topk_core(model, k)

            @jax.jit
            def fn(params, users_all, hist_all):
                def one(ub):
                    return core(params, ub, hist_all[ub])
                return jax.lax.map(one, users_all.reshape(nb, batch_users))
            return fn

        sc, it = _rec_fn(model, ("bulk", k, batch_users, nb), build)(
            params, jnp.asarray(up), hist)
        return (np.asarray(sc).reshape(-1, k)[:n],
                np.asarray(it).reshape(-1, k)[:n])

    fn = _rec_fn(model, ("one", k), lambda: jax.jit(_topk_core(model, k)))
    outs = []
    for s in range(0, n, batch_users):
        ub = jnp.asarray(users[s:s + batch_users])
        hb = jnp.asarray(data.hist[users[s:s + batch_users]])
        outs.append(fn(params, ub, hb))
    return (np.concatenate([np.asarray(sc) for sc, _ in outs]),
            np.concatenate([np.asarray(it) for _, it in outs]))


class SessionStream:
    """Stateful session-stream recommender (the serving surface for
    GRU4Rec's streaming API — reference ``predict_next_batch``,
    GRU4Rec.py:285-327).

    The reference serves session-based models statefully: a fixed number of
    parallel session slots, one event per slot per call, hidden state
    carried on the host between calls. This wraps any model exposing

      * ``init_state(batch_size) -> state``
      * ``step_state(params, state, items, reset_mask)
          -> (state, scores [B, I])``

    into a jitted push API: feed one item id per slot (0 = no event for
    that slot this tick — state untouched), get top-k next-item
    recommendations back. ``reset_mask`` starts a new session in a slot
    (the reference resets the corresponding hidden-state rows when a
    session id changes, GRU4Rec.py:314-318).

    Example::

        stream = SessionStream(model, params, batch_size=128, k=10)
        scores, items = stream.push(first_events)
        scores, items = stream.push(next_events)           # state carried
        stream.push(ev, reset_mask=(session_id != prev))   # new sessions

    The per-call program is one fused jit (GRU cell + catalog scores +
    top-k): state stays on device, only the [B, k] results land on host.
    """

    def __init__(self, model, params, batch_size: int, k: int = 10):
        import numpy as np

        if not hasattr(model, "step_state"):
            raise ValueError(
                f"{type(model).__name__} has no streaming step_state API "
                "(GRU4Rec-style session models only)")
        self.model = model
        self.params = params
        self.batch_size = int(batch_size)
        self.k = int(k)
        self.state = model.init_state(self.batch_size)
        self._np = np

        @jax.jit
        def _push(params, state, items, reset):
            state, scores = model.step_state(params, state, items, reset)
            scores = scores.at[:, 0].set(NEG)  # pad item never recommended
            s, i = jax.lax.top_k(scores, self.k)
            return state, s, i

        self._push = _push

    def push(self, items, reset_mask=None):
        """Consume one event per slot; return (scores [B, k], items [B, k])
        for the next-item prediction of every slot."""
        np = self._np
        items = jnp.asarray(np.asarray(items, dtype=np.int32))
        if items.shape != (self.batch_size,):
            raise ValueError(
                f"items must be [{self.batch_size}], got {items.shape}")
        if reset_mask is None:
            reset = jnp.zeros((self.batch_size,), dtype=bool)
        else:
            reset = jnp.asarray(np.asarray(reset_mask, dtype=bool))
        self.state, s, i = self._push(self.params, self.state, items, reset)
        return np.asarray(s), np.asarray(i)

    def reset(self):
        """Reset every slot (end of all sessions)."""
        self.state = self.model.init_state(self.batch_size)
