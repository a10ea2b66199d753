"""Decompose the SASRec/ASASRec train-step cost at Video scale (the
parity-run workload: U=31013, I=23745, d=64, maxlen=8, 2 blocks, bs 512).

Variants (1000-step scan per call so the axon fixed dispatch cost
(~15-20 ms/call) amortizes below 20 ns/step; donated carry; fresh-output
sync per the timing gotcha in CLAUDE.md):
  asasrec     — adversarial step, fused="always" Pallas encoder
  asasrec-xla — adversarial step, XLA encoder (the production default)
  sasrec      — clean step, fused encoder; sasrec-xla — XLA
  sasrec-fwd(-xla) — loss only, no grad/optimizer
  sample      — sample_seq_batch + embedding-sum only (sampling floor)
  noop        — scan floor

Filter with DECOMPOSE_ONLY=name,name; tune the fused kernel's chunks with
SASREC_FUSED_ROWS_{FWD,BWD}. Measured 2026-08-18 (1x v5e): XLA wins —
see docs/ROADMAP.md; the fused kernel is opt-in.

Prints one JSON line per variant.
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/acf_tpu_xla"))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from acf_tpu.models.sasrec import SASRec  # noqa: E402
from acf_tpu.sampling.negatives import (  # noqa: E402
    sample_seq_batch, sample_seq_window_batch,
)

U, I, D = 31_013, 23_745, 64
BS = int(os.environ.get("DECOMPOSE_BS", "512"))
MAXLEN = int(os.environ.get("DECOMPOSE_MAXLEN", "8"))  # 8=Video, 50=ml-1m
STEPS = int(os.environ.get("DECOMPOSE_STEPS", "1000"))
HIST_L = max(64, MAXLEN)  # right-aligned window uses the tail


def build_data(rng):
    hist = rng.integers(1, I, (U, HIST_L), dtype=np.int32)
    # zero-pad a left prefix so histories have realistic varied lengths
    lens = rng.integers(2, HIST_L, U)
    mask = np.arange(HIST_L)[None, :] < (HIST_L - lens[:, None])
    hist[mask] = 0
    return {
        "hist": jnp.asarray(hist),
        "eligible": jnp.asarray(np.arange(U, dtype=np.int32)),
    }


class TableASASRec(SASRec):
    """ASASRec forced onto the dense-table adversarial formulation (the
    pre-row-space path) for A/B measurement."""

    def loss(self, params, batch, key):
        users, seq, pos, neg = batch
        k_enc, _ = jax.random.split(key)
        reprs = self.encode(params, seq, train=True, key=k_enc)
        loss, auc = self._pointwise_loss(reprs, params["item_emb"], pos, neg)
        delta = self._delta_tree(params, seq, pos, neg)
        emb_plus = params["item_emb"] + delta["item_emb"]
        adv_loss, _ = self._pointwise_loss(reprs, emb_plus, pos, neg)
        return loss + self.reg_adv * adv_loss, {"loss": loss, "acc": auc}


def make_epoch(model, optimizer, mode: str):
    @partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(carry, data, key):
        params, opt_state = carry
        step_keys = jax.random.split(key, STEPS)

        def step(c, kk):
            prm, opt = c
            ks, kl = jax.random.split(kk)
            if mode == "train":  # the production path: packed-window batch
                users, window, neg = sample_seq_window_batch(
                    ks, data["hist"], data["eligible"], MAXLEN, I, BS)
                (_, aux), grads = jax.value_and_grad(
                    model.loss_window, has_aux=True)(
                    prm, (users, window, neg), kl)
                updates, opt = optimizer.update(grads, opt, prm)
                prm = optax.apply_updates(prm, updates)
                return (prm, opt), {"loss": aux["loss"]}
            users, seq, pos, neg = sample_seq_batch(
                ks, data["hist"], data["eligible"], MAXLEN, I, BS)
            if mode == "sample":
                s = jnp.sum(prm["item_emb"][seq])
                return (prm, opt), {"loss": s}
            if mode == "noop":
                s = jnp.sum(prm["item_emb"][0])
                return (prm, opt), {"loss": s}
            if mode == "fwd":
                l, _ = model.loss(prm, (users, seq, pos, neg), kl)
                return (prm, opt), {"loss": l}
            (_, aux), grads = jax.value_and_grad(model.loss, has_aux=True)(
                prm, (users, seq, pos, neg), kl)
            if mode == "grad":  # backward, no optimizer
                prm = jax.tree.map(lambda p, g: p - 0.0 * g, prm, grads)
                return (prm, opt), {"loss": aux["loss"]}
            updates, opt = optimizer.update(grads, opt, prm)
            prm = optax.apply_updates(prm, updates)
            return (prm, opt), {"loss": aux["loss"]}

        (params, opt_state), auxes = jax.lax.scan(
            step, (params, opt_state), step_keys)
        return (params, opt_state), jax.tree.map(jnp.mean, auxes)

    return epoch_fn


def time_epoch(epoch_fn, model, optimizer, data):
    params = model.init_params(jax.random.PRNGKey(0))
    carry = (params, optimizer.init(params))
    carry, aux = epoch_fn(carry, data, jax.random.PRNGKey(1))
    float(aux["loss"])
    best = float("inf")
    for t in range(3):
        t0 = time.perf_counter()
        carry, aux = epoch_fn(carry, data, jax.random.PRNGKey(2 + t))
        float(aux["loss"])
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def main():
    rng = np.random.default_rng(0)
    data = build_data(rng)
    adam = optax.adam(0.001, b2=0.98)
    clean = SASRec(U, I, D, maxlen=MAXLEN, fused="always")
    adv = SASRec(U, I, D, maxlen=MAXLEN, adversarial=True, eps=0.5,
                 reg_adv=1.0, fused="always")
    clean_xla = SASRec(U, I, D, maxlen=MAXLEN)
    adv_xla = SASRec(U, I, D, maxlen=MAXLEN, adversarial=True, eps=0.5,
                     reg_adv=1.0)
    # bf16 train-path A/B partners (the production default is f32; bf16 is
    # the measured +9%-clean-step opt-in — quality calibration over 2
    # seed-pairs in docs/PARITY.md: neutral for ASASRec, ≤0.003 HR risk
    # for clean SASRec)
    clean_bf16 = SASRec(U, I, D, maxlen=MAXLEN, train_dtype="bfloat16")
    adv_bf16 = SASRec(U, I, D, maxlen=MAXLEN, adversarial=True, eps=0.5,
                      reg_adv=1.0, train_dtype="bfloat16")

    adv_table = TableASASRec(U, I, D, maxlen=MAXLEN, adversarial=True,
                             eps=0.5, reg_adv=1.0)
    nodrop = SASRec(U, I, D, maxlen=MAXLEN, dropout_rate=0.0)
    sgd = optax.sgd(0.001)
    variants = [
        ("asasrec", make_epoch(adv, adam, "train"), adv),
        ("asasrec-xla", make_epoch(adv_xla, adam, "train"), adv_xla),
        ("sasrec", make_epoch(clean, adam, "train"), clean, adam),
        ("sasrec-xla", make_epoch(clean_xla, adam, "train"), clean_xla,
         adam),
        ("sasrec-fwd", make_epoch(clean, adam, "fwd"), clean, adam),
        ("sasrec-fwd-xla", make_epoch(clean_xla, adam, "fwd"), clean_xla,
         adam),
        ("sasrec-xla-bf16", make_epoch(clean_bf16, adam, "train"),
         clean_bf16, adam),
        ("asasrec-xla-bf16", make_epoch(adv_bf16, adam, "train"), adv_bf16),
        ("sasrec-fwd-xla-bf16", make_epoch(clean_bf16, adam, "fwd"),
         clean_bf16, adam),
        # legacy 3-gather (non-window) step for A/B vs loss_window
        ("sasrec-xla-3g", make_epoch(clean_xla, adam, "train3g"), clean_xla,
         adam),
        ("asasrec-xla-3g", make_epoch(adv_xla, adam, "train3g"), adv_xla),
    ]
    # fused Pallas kernel with bf16 in-kernel MXU dots (r2 rework:
    # whole-chunk [N,N] block-diag attention at T>=32)
    clean_bf16k = SASRec(U, I, D, maxlen=MAXLEN, fused="always",
                         train_dtype="bfloat16")
    adv_bf16k = SASRec(U, I, D, maxlen=MAXLEN, adversarial=True, eps=0.5,
                       reg_adv=1.0, fused="always", train_dtype="bfloat16")
    # packed block-diagonal attention (r3: the t>=32 gate removed — at the
    # T=8 parity geometry 16 users fill one 128-wide MXU tile)
    clean_pk = SASRec(U, I, D, maxlen=MAXLEN, pack_attention="always")
    adv_pk = SASRec(U, I, D, maxlen=MAXLEN, adversarial=True, eps=0.5,
                    reg_adv=1.0, pack_attention="always")
    variants += [
        ("sasrec-xla-packed", make_epoch(clean_pk, adam, "train"),
         clean_pk, adam),
        ("asasrec-xla-packed", make_epoch(adv_pk, adam, "train"),
         adv_pk, adam),
        ("sasrec-fwd-xla-packed", make_epoch(clean_pk, adam, "fwd"),
         clean_pk, adam),
        ("sasrec-bf16k", make_epoch(clean_bf16k, adam, "train"),
         clean_bf16k, adam),
        ("asasrec-bf16k", make_epoch(adv_bf16k, adam, "train"),
         adv_bf16k, adam),
        # overhead decomposition of the XLA step
        ("sasrec-xla-grad", make_epoch(clean_xla, adam, "grad"), clean_xla,
         adam),
        ("sasrec-xla-sgd", make_epoch(clean_xla, sgd, "train"), clean_xla,
         sgd),
        ("sasrec-xla-nodrop", make_epoch(nodrop, adam, "train"), nodrop,
         adam),
        ("sasrec-xla-nodrop-fwd", make_epoch(nodrop, adam, "fwd"), nodrop,
         adam),
        ("sample", make_epoch(clean, adam, "sample"), clean, adam),
        ("noop", make_epoch(clean, adam, "noop"), clean, adam),
    ]
    only = os.environ.get("DECOMPOSE_ONLY")
    if only:
        names = set(only.split(","))
        variants = [v for v in variants if v[0] in names]
    for entry_ in variants:
        name, fn, model = entry_[0], entry_[1], entry_[2]
        opt = entry_[3] if len(entry_) > 3 else adam
        us = time_epoch(fn, model, opt, data) * 1e6
        print(json.dumps({"variant": name, "us_per_step": round(us, 1),
                          "ex_per_s": round(BS / us * 1e6)}), flush=True)


if __name__ == "__main__":
    main()
