"""Micro-benchmarks for the SASRec T=50 step optimization levers, on-TPU.

Profiling (scripts/profile_seq_step.py, 1x v5e, B=512 T=50 d=64) shows the
clean train step (~2790 us) spends:
  ~1277 us in matmuls at ~5% MXU efficiency (batched [50,50]x[50,64]
          attention matmuls occupy ~15% of a 128x128 MXU tile),
  ~553 us in the item-table scatter-add of [B*3T, 64] row grads,
  ~259 us in layout copies (slicing q/k/v out of the merged QKV matmul).

Each experiment times a 200-step lax.scan (donated carry, fresh-output
sync) so the axon dispatch cost amortizes. Prints one JSON line each.
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

B, T, D, V = 512, 50, 64, 23_745
STEPS = int(os.environ.get("MICRO_STEPS", "200"))


def timeit(name, fn, *args):
    only = os.environ.get("MICRO_ONLY")
    if only and name not in only.split(","):
        return None
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    us = best / STEPS * 1e6
    print(json.dumps({"exp": name, "us_per_step": round(us, 1)}), flush=True)
    return us


def scan_over(body, init):
    @jax.jit
    def run(init):
        def step(c, i):
            return body(c, i), ()
        c, _ = jax.lax.scan(step, init, jnp.arange(STEPS))
        return c
    return run


def main():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, V, (B * 3 * T,), dtype=np.int32))
    ups = jnp.asarray(rng.standard_normal((B * 3 * T, D)), jnp.float32)
    table = jnp.zeros((V, D), jnp.float32)

    # --- scatter-add variants -------------------------------------------
    def scat_f32(c, i):
        return c.at[ids + (i % 2)].add(ups)

    timeit("scatter-f32", scan_over(scat_f32, table), table)

    def scat_bf16(c, i):
        u = ups.astype(jnp.bfloat16).astype(jnp.float32)
        return c.at[ids + (i % 2)].add(u)

    timeit("scatter-bf16ups", scan_over(scat_bf16, table), table)

    def scat_sorted(c, i):
        k = ids + (i % 2)
        order = jnp.argsort(k)
        ks = k[order]
        us_ = ups[order]
        return c.at[ks].add(us_, indices_are_sorted=True)

    timeit("scatter-sorted", scan_over(scat_sorted, table), table)

    def scat_3way(c, i):
        n = B * T
        for j in range(3):
            c = c.at[ids[j * n:(j + 1) * n] + (i % 2)].add(
                ups[j * n:(j + 1) * n])
        return c

    timeit("scatter-3way", scan_over(scat_3way, table), table)

    # one-hot MXU aggregation over a SMALL id set is how ops/sparse_step
    # dedups; here the id set is 76800 — matmul agg is O(B^2), skipped.

    # --- attention: plain vs packed-2 block-diag ------------------------
    q = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    causal = jnp.tril(jnp.ones((T, T), bool))
    neg = jnp.float32(-1e9)

    def attn_plain(c, i):
        qq, kk, vv = (x + c for x in (q, k, v))
        qq, kk, vv = (x.astype(jnp.bfloat16) for x in (qq, kk, vv))
        s = jnp.einsum("bqd,bkd->bqk", qq, kk)
        s = jnp.where(causal[None], s, neg)
        p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(jnp.bfloat16)
        o = jnp.einsum("bqk,bkd->bqd", p, vv)
        return c + jnp.sum(o.astype(jnp.float32)) * 1e-12

    timeit("attn-plain-fwd", scan_over(attn_plain, jnp.float32(0)),
           jnp.float32(0))

    P = 2  # users per MXU tile (2*50=100 <= 128)
    bd = jnp.kron(jnp.eye(P, dtype=jnp.int32),
                  causal.astype(jnp.int32)).astype(bool)  # block-diag causal

    def attn_packed(c, i):
        qq, kk, vv = (x + c for x in (q, k, v))
        qq, kk, vv = (x.reshape(B // P, P * T, D).astype(jnp.bfloat16)
                      for x in (qq, kk, vv))
        s = jnp.einsum("bqd,bkd->bqk", qq, kk)
        s = jnp.where(bd[None], s, neg)
        p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(jnp.bfloat16)
        o = jnp.einsum("bqk,bkd->bqd", p, vv)
        return c + jnp.sum(o.astype(jnp.float32)) * 1e-12

    timeit("attn-packed2-fwd", scan_over(attn_packed, jnp.float32(0)),
           jnp.float32(0))

    def grad_wrap(f):
        def body(c, i):
            g = jax.grad(lambda cc: f(cc, i))(c)
            return c + g * 1e-12
        return body

    timeit("attn-plain-grad", scan_over(grad_wrap(attn_plain),
                                        jnp.float32(0)), jnp.float32(0))
    timeit("attn-packed2-grad", scan_over(grad_wrap(attn_packed),
                                          jnp.float32(0)), jnp.float32(0))

    # --- QKV: merged+slice vs three matmuls vs major-dim split ----------
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((D, 3 * D)), jnp.float32) * 0.1

    def qkv_merged(c, i):
        xx = (x + c).astype(jnp.bfloat16)
        qkv = xx @ w3.astype(jnp.bfloat16)
        qq, kk, vv = (qkv[..., j * D:(j + 1) * D] for j in range(3))
        s = jnp.einsum("bqd,bkd->bqk", qq, kk)
        return c + jnp.sum(s.astype(jnp.float32)) * 1e-12

    def qkv_three(c, i):
        xx = (x + c).astype(jnp.bfloat16)
        w = w3.astype(jnp.bfloat16)
        qq = xx @ w[:, :D]
        kk = xx @ w[:, D:2 * D]
        vv = xx @ w[:, 2 * D:]
        s = jnp.einsum("bqd,bkd->bqk", qq, kk)
        return c + jnp.sum(s.astype(jnp.float32)) * 1e-12 \
            + jnp.sum(vv.astype(jnp.float32)) * 1e-12

    def qkv_major(c, i):
        xx = (x + c).astype(jnp.bfloat16)
        w = w3.astype(jnp.bfloat16).reshape(D, 3, D)
        qkv = jnp.einsum("btd,dce->cbte", xx, w)  # [3, B, T, D]
        qq, kk, vv = qkv[0], qkv[1], qkv[2]
        s = jnp.einsum("bqd,bkd->bqk", qq, kk)
        return c + jnp.sum(s.astype(jnp.float32)) * 1e-12 \
            + jnp.sum(vv.astype(jnp.float32)) * 1e-12

    timeit("qkv-merged-grad", scan_over(grad_wrap(qkv_merged),
                                        jnp.float32(0)), jnp.float32(0))
    timeit("qkv-three-grad", scan_over(grad_wrap(qkv_three),
                                       jnp.float32(0)), jnp.float32(0))
    timeit("qkv-major-grad", scan_over(grad_wrap(qkv_major),
                                       jnp.float32(0)), jnp.float32(0))


if __name__ == "__main__":
    main()
