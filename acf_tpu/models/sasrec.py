"""SASRec and its adversarial variants (ASASRec / ASASRec2), TPU-native.

Re-implements the reference's 2-block causal self-attention next-item model
(reference SASRec.py:32-481, layer semantics SASRecLayers.py:15-319) as one
pure-functional encoder. The reference keeps five copies of this model; this
is the single shared one.

Adversarial modes (reference SASRec.py:213-234, 368-414):
  * ``asasrec``  — FGSM delta on the item-embedding table only; the
    adversarial logits perturb the *target* item embeddings against the
    clean sequence representation (SASRec.py:356-363).
  * ``asasrec2`` — deltas additionally on the positional table, the Q
    dense kernel+bias and the FF conv kernels+biases; the whole encoder
    is re-run with perturbed weights (SASRec.py:269-354). Note the
    reference creates delta variables for K/V too but never assigns them
    (SASRec.py:378-387 updates only attention_denseQ), so K/V stay clean.

Deltas are ε-scaled row-normalized gradients of the *no-dropout* clean loss
(the reference computes ``update_emb`` with ``is_training=False``,
SASRec.py:453-454) under ``stop_gradient`` — one fused jitted step instead of
the reference's 1 + num_deltas ``sess.run`` round-trips per minibatch
(SASRec.py:452-465).

Intentional fixes of reference bugs (SURVEY.md §7.3): the pad-embedding row
is actually zero (the reference's ``zero_pad`` branch overwrites the zeroed
table, SASRecLayers.py:120-125); key/query masks come from the token ids
rather than post-LayerNorm activations (SASRecLayers.py:204-227).
"""

from __future__ import annotations

import dataclasses
import math
import jax
import jax.numpy as jnp

from acf_tpu.models.base import SequenceModel, project_rows, row_normalize
from acf_tpu.nn.layers import (
    dense, glorot_uniform, init_dense, init_layer_norm, layer_norm,
    trunc_normal,
)

_NEG_INF = -(2.0 ** 32) + 1  # the reference's mask value (SASRecLayers.py:208)


def _apply_mask(x, mask, keep: float):
    """Inverted dropout with a precomputed 0/1 mask — bit-identical to the
    previous inline ``dropout`` (same ``x / keep`` division)."""
    if mask is None:
        return x
    return jnp.where(mask > 0, x / keep, 0.0)


def _tf_l2_normalize(x, eps: float = 1e-12):
    """tf.nn.l2_normalize semantics: axis=1 for matrices (rows), all axes for
    vectors (reference SASRec.py:371, 382-386)."""
    if x.ndim >= 2:
        axis = 1
    else:
        axis = None
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps))


@dataclasses.dataclass(eq=False)
class SASRec(SequenceModel):
    """Self-attentive sequential recommendation.

    Defaults follow the reference (SASRec.py:33-36, run_adv_ori.py):
    hidden = dim, 2 blocks, 1 head, dropout 0.5, Adam(lr=1e-3, beta2=0.98).
    """

    num_blocks: int = 2
    num_heads: int = 1
    dropout_rate: float = 0.5
    l2_emb: float = 0.0
    # adversarial config
    adversarial: bool = False
    adv_mode: str = "asasrec"  # or "asasrec2"
    eps: float = 0.5
    reg_adv: float = 1.0
    eps_pos: float = 0.0    # run_adv_ori.py --eps_pos (asasrec2)
    eps_dense: float = 0.0  # run_adv_ori.py --eps_dense
    eps_conv: float = 0.0   # run_adv_ori.py --eps_conv
    adv_steps: int = 1      # >1 = PGD-style multi-step perturbation
                            # (MSAP, arXiv:2010.01329); 1 = reference FGSM
    fused: str = "auto"     # fused Pallas encoder kernel (ops/sasrec_fused):
                            # "auto" == "never" — measured SLOWER than XLA at
                            # reference scale (docs/ROADMAP.md); "always" =
                            # opt-in (interpret mode off-TPU)
    pack_attention: str = "auto"  # pack ⌊128/T⌋ users into one MXU tile as
                            # a block-diagonal causal attention. Bitwise-
                            # equal to the unpacked path in f32 (off-block
                            # scores are -2³²; exp underflows to exactly 0).
                            # MEASURED SLOWER end-to-end on v5e at T=50
                            # (clean step 3009 vs 2790 µs, fwd 960 vs 887 —
                            # the isolated-attention microbench win
                            # (micro_opt_bench.py: fwd 160 vs 206 µs)
                            # reverses once the 2× score FLOPs hit the
                            # backward), so "auto" == "never"; "always" =
                            # opt-in for re-measurement on future hardware.
    train_dtype: str = "float32"  # encoder compute dtype on the TRAIN path
                            # (loss / FGSM linearization). "bfloat16" runs
                            # encoder activations/matmuls in bf16 with f32
                            # LayerNorm moments/softmax/loss head — measured
                            # +9% on the clean T=50 step (docs/ROADMAP.md).
                            # Quality over 2 seed-pairs (docs/PARITY.md
                            # bf16 table): neutral within seed noise for
                            # ASASRec (−0.0002/−0.0006 HR); for clean
                            # SASRec treat as ≤0.003 HR risk (seed-2020
                            # pair −0.0026, ~1.4σ). f32 stays
                            # the default so quality claims rest on exact
                            # math; bf16 is the measured opt-in
                            # (--train_dtype bfloat16). Eval/serving always
                            # run f32 (ranking precision rules unchanged).

    # ------------------------------------------------------------------
    def init_params(self, key):
        d = self.dim
        keys = jax.random.split(key, 3 + 6 * self.num_blocks)
        ki = iter(range(len(keys)))
        # The reference's *effective* item-table init is truncnormal(0.01)
        # (SASRecLayers.py:123-125); pad row zeroed here (intent).
        item = trunc_normal(keys[next(ki)], (self.num_items, d), 0.01)
        item = item.at[0].set(0.0)
        params = {
            "item_emb": item,
            "pos_emb": glorot_uniform(keys[next(ki)], (self.maxlen, d)),
            "blocks": [],
            "ln_f": init_layer_norm(d),
        }
        for _ in range(self.num_blocks):
            blk = {
                "ln1": init_layer_norm(d),
                "wq": init_dense(keys[next(ki)], d, d),
                "wk": init_dense(keys[next(ki)], d, d),
                "wv": init_dense(keys[next(ki)], d, d),
                "ln2": init_layer_norm(d),
                "conv1": init_dense(keys[next(ki)], d, d),
                "conv2": init_dense(keys[next(ki)], d, d),
                "ln3": init_layer_norm(d),
            }
            params["blocks"].append(blk)
        return params

    # ------------------------------------------------------------------
    def _compute_dtype(self):
        """Resolved train-path compute dtype (None = plain f32 path)."""
        if self.train_dtype in ("float32", "f32"):
            return None
        return jnp.dtype(self.train_dtype)

    def _pack(self, b: int, t: int) -> int:
        """Users packed per attention tile (1 = unpacked). Any t with
        ⌊128/t⌋ ≥ 2 can pack (round 3 relaxed the old t ≥ 32 gate: the
        T=8 parity geometry packs 16 users per tile — 8/128 lanes → full
        tiles — and was never measured before)."""
        if self.pack_attention != "always" or self.num_heads != 1 \
                or 128 // t < 2:
            return 1
        p = 128 // t
        while p > 1 and b % p:
            p -= 1
        return max(p, 1)

    def _dropout_masks(self, key, b, t, pack: int = 1):
        """Precomputed 0/1 dropout masks (bool — ¼ the HBM traffic of the
        old f32 masks; same bernoulli draws: same key split, same call order,
        same shapes), hoisted so the fused-kernel path can consume them.
        With ``pack>1`` the attention-prob mask is drawn directly at the
        packed block-diagonal shape [B/P, 1, P·T, P·T] (off-block draws are
        multiplied into exact zeros, so they are inert)."""
        h = self.num_heads
        d = self.dim
        keep = 1.0 - self.dropout_rate
        keys = jax.random.split(key, 1 + 3 * self.num_blocks)

        def m(kk, shape):
            return jax.random.bernoulli(kk, keep, shape)

        p_shape = ((b, h, t, t) if pack == 1
                   else (b // pack, 1, pack * t, pack * t))
        return {
            "emb": m(keys[0], (b, t, d)),
            "blocks": [
                {"p": m(keys[1 + 3 * i], p_shape),
                 "f1": m(keys[2 + 3 * i], (b, t, d)),
                 "f2": m(keys[3 + 3 * i], (b, t, d))}
                for i in range(self.num_blocks)
            ],
        }

    def _attention(self, blk, q_in, ids_mask, p_mask, keep, cd=jnp.float32,
                   pack: int = 1):
        """One causal MHA with key/query masking
        (SASRecLayers.py:171-248). ``cd`` = compute dtype: activations and
        matmuls run in it; softmax normalizes in f32 (same exponent range,
        the renormalizing sum wants the mantissa). ``pack>1`` stacks that
        many users into one block-diagonal attention tile (profiled: the
        T=50 step's batched [50,50] score matmuls ran at ~5% MXU
        efficiency; packing raises tile occupancy at identical results —
        off-block logits are -2³² so their softmax weight underflows to
        exactly 0 and contributes exact zeros to the value sum)."""
        b, t, d = q_in.shape
        h = self.num_heads
        dh = d // h
        # Single merged QKV matmul: column-block-wise identical to three
        # separate denses (each output column is an independent dot product)
        # but one MXU kernel instead of three in the forward and two instead
        # of six in the backward — the SASRec step is kernel-count-bound at
        # these shapes (docs/ROADMAP.md step decomposition).
        w = jnp.concatenate(
            [blk["wq"]["w"], blk["wk"]["w"], blk["wv"]["w"]],
            axis=1).astype(cd)
        bias = jnp.concatenate(
            [blk["wq"]["b"], blk["wk"]["b"], blk["wv"]["b"]]).astype(cd)
        qkv = q_in @ w + bias
        causal = jnp.tril(jnp.ones((t, t), bool))
        if pack > 1:  # single-head packed form
            g, pt = b // pack, pack * t
            q, k, v = (qkv[..., j * d:(j + 1) * d].reshape(g, pt, d)
                       for j in range(3))
            scores = jnp.einsum("bqd,bkd->bqk", q, k) / math.sqrt(d)
            bd = jnp.kron(jnp.eye(pack, dtype=jnp.int32),
                          causal.astype(jnp.int32)).astype(bool)
            key_mask = ids_mask.reshape(g, 1, pt)
            scores = jnp.where(bd[None] & key_mask, scores, _NEG_INF)
            probs = jax.nn.softmax(scores.astype(jnp.float32),
                                   axis=-1).astype(cd)
            probs = probs * ids_mask.reshape(g, pt, 1)  # query masking
            probs = _apply_mask(
                probs, None if p_mask is None else p_mask[:, 0], keep)
            out = jnp.einsum("bqk,bkd->bqd", probs, v).reshape(b, t, d)
            return out + q_in
        q, k, v = (qkv[..., j * d:(j + 1) * d]
                   .reshape(b, t, h, dh).transpose(0, 2, 1, 3)
                   for j in range(3))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(dh)
        key_mask = ids_mask[:, None, None, :]  # [B,1,1,T]
        scores = jnp.where(causal[None, None] & key_mask, scores, _NEG_INF)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(cd)
        probs = probs * ids_mask[:, None, :, None]  # query masking
        probs = _apply_mask(probs, p_mask, keep)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        return out + q_in  # residual onto the normalized input

    def encode(self, params, seq, train: bool = False, key=None, dtype=None):
        """[B, T] item ids → [B, T, d] sequence representations."""
        x = params["item_emb"][seq] * math.sqrt(self.dim)  # √d scale (SASRecLayers.py:129-130)
        return self.encode_core(params, x, seq != 0, train=train, key=key,
                                dtype=dtype)

    def encode_core(self, params, x, ids_mask, train: bool = False, key=None,
                    dtype=None):
        """Encoder from pre-assembled (√d-scaled) input embeddings — the
        entry point for the explicit sharded path, where the item table is
        row-sharded and lookups happen outside (parallel/sharded_embedding).
        Only touches ``pos_emb``/``blocks``/``ln_f`` in ``params``.
        ``dtype`` = internal compute dtype (None → f32); the output is
        always f32. The fused Pallas kernel honors it too: its in-kernel
        MXU dots run in ``dtype`` with f32 accumulation (LayerNorm moments,
        softmax and the residual stream stay f32), so the fused path is
        only bit-exact vs ``encode_math`` when ``dtype`` is None/f32."""
        if key is None:
            key = jax.random.PRNGKey(0)
        b, t = x.shape[0], x.shape[1]
        use_dropout = train and self.dropout_rate > 0.0
        if self._use_fused(t):
            masks = self._dropout_masks(key, b, t) if use_dropout else None
            from acf_tpu.ops.sasrec_fused import fused_encoder
            return fused_encoder(self, params, x, ids_mask, masks,
                                 dtype=dtype)
        pack = self._pack(b, t)
        masks = self._dropout_masks(key, b, t, pack) if use_dropout else None
        return self.encode_math(params, x, ids_mask, masks, dtype=dtype,
                                pack=pack)

    def encode_math(self, params, x, ids_mask, masks, dtype=None,
                    pack: int = 1):
        """Pure-jnp encoder math given precomputed dropout masks (None =
        inference; with pack>1 the attention masks must be drawn at the
        packed shape — `_dropout_masks(key, b, t, pack)`). The fused Pallas
        kernel (ops/sasrec_fused.py) computes exactly this function (at
        dtype=None, pack=1). With ``dtype=bf16`` the activations, matmuls
        and residuals run in bf16 while LayerNorm moments, softmax and the
        final LN run in f32; at dtype=None every cast below is a no-op and
        the path is bit-identical to the pre-mixed-precision code."""
        t = x.shape[1]
        keep = 1.0 - self.dropout_rate
        cd = jnp.float32 if dtype is None else dtype

        def ln(p, v):  # moments in f32, activation back to compute dtype
            return layer_norm(p, v.astype(jnp.float32)).astype(cd)

        def dn(p, v):
            return v @ p["w"].astype(cd) + p["b"].astype(cd)

        maskf = ids_mask[:, :, None].astype(cd)
        x = (x + params["pos_emb"][None, -t:, :]).astype(cd)
        x = _apply_mask(x, None if masks is None else masks["emb"], keep)
        x = x * maskf
        for i, blk in enumerate(params["blocks"]):
            bm = None if masks is None else masks["blocks"][i]
            q_in = ln(blk["ln1"], x)
            x = self._attention(blk, q_in, ids_mask,
                                None if bm is None else bm["p"], keep, cd,
                                pack)
            x2 = ln(blk["ln2"], x)
            f = jax.nn.relu(dn(blk["conv1"], x2))
            f = _apply_mask(f, None if bm is None else bm["f1"], keep)
            f = dn(blk["conv2"], f)
            f = _apply_mask(f, None if bm is None else bm["f2"], keep)
            f = f + x2  # residual (SASRecLayers.py:314)
            x = ln(blk["ln3"], f)
            x = x * maskf
        x = layer_norm(params["ln_f"], x.astype(jnp.float32))  # f32 out
        return x

    def _use_fused(self, t: int) -> bool:
        """Route through the fused Pallas encoder kernel (opt-in only:
        single-head, windows at full maxlen). Measured on v5e at Video scale
        the kernel LOSES to XLA's own fusion (fwd 221 vs 162 µs/step, full
        step 579 vs 491 µs — docs/ROADMAP.md), so "auto" resolves to the
        XLA path; ``fused="always"`` keeps the kernel testable."""
        if self.num_heads != 1 or t != self.maxlen:
            return False
        return self.fused == "always"

    # ------------------------------------------------------------------
    def _pointwise_loss(self, reprs, item_emb, pos, neg):
        """Per-position sigmoid CE over (pos, neg) targets
        (SASRec.py:183-191), in stable softplus form."""
        pos_e = item_emb[pos]  # [B, T, d] (unscaled, as in SASRec.py:172)
        neg_e = item_emb[neg]
        pos_logit = jnp.sum(pos_e * reprs, -1)
        neg_logit = jnp.sum(neg_e * reprs, -1)
        ist = (pos != 0).astype(jnp.float32)
        n = jnp.maximum(ist.sum(), 1.0)
        loss = (jnp.sum(jnp.logaddexp(0.0, -pos_logit) * ist)
                + jnp.sum(jnp.logaddexp(0.0, neg_logit) * ist)) / n
        auc = jnp.sum(((jnp.sign(pos_logit - neg_logit) + 1) / 2) * ist) / n
        return loss, auc

    def _pointwise_loss_rows(self, reprs, pos_e, neg_e, pos):
        """`_pointwise_loss` with the target embedding rows given explicitly
        (the row-space adversarial hot path gathers + perturbs them without
        materializing a full perturbed table)."""
        pos_logit = jnp.sum(pos_e * reprs, -1)
        neg_logit = jnp.sum(neg_e * reprs, -1)
        ist = (pos != 0).astype(jnp.float32)
        n = jnp.maximum(ist.sum(), 1.0)
        loss = (jnp.sum(jnp.logaddexp(0.0, -pos_logit) * ist)
                + jnp.sum(jnp.logaddexp(0.0, neg_logit) * ist)) / n
        auc = jnp.sum(((jnp.sign(pos_logit - neg_logit) + 1) / 2) * ist) / n
        return loss, auc

    def _embed_rows(self, item_emb, seq, pos, neg):
        """One combined [B, 3T] gather for the encoder input and the pos/neg
        target rows (instead of three separate gathers — and one scatter-add
        instead of three in the backward; the step is kernel-count-bound at
        reference shapes)."""
        t = seq.shape[1]
        rows = item_emb[jnp.concatenate([seq, pos, neg], axis=1)]
        return rows[:, :t], rows[:, t:2 * t], rows[:, 2 * t:]

    def _clean_loss_fn(self, params, seq, pos, neg):
        """No-dropout clean loss — the FGSM linearization point
        (SASRec.py:453-454 runs the delta update with is_training=False)."""
        seq_e, pos_e, neg_e = self._embed_rows(params["item_emb"],
                                               seq, pos, neg)
        reprs = self.encode_core(params, seq_e * math.sqrt(self.dim),
                                 seq != 0, train=False,
                                 dtype=self._compute_dtype())
        loss, _ = self._pointwise_loss_rows(reprs, pos_e, neg_e, pos)
        return loss

    def adv_target_loss(self, params, batch, key):
        """FGSM linearization target: the no-dropout pointwise loss WITHOUT
        the l2_emb regularizer (the reference's delta update runs on the raw
        loss with is_training=False, SASRec.py:365-371, 453-454)."""
        users, seq, pos, neg = batch
        return self._clean_loss_fn(params, seq, pos, neg)

    def _eps_tree(self, params):
        """Per-leaf perturbation radii as a pytree of python floats: 0.0 for
        leaves the protocol leaves clean (the reference assigns dense deltas
        ONLY for the Q projection, SASRec.py:378-387; delta_denseK/V are
        created at SASRec.py:133-135 but never written)."""
        eps = jax.tree.map(lambda _: 0.0, params)
        eps["item_emb"] = self.eps
        if self.adv_mode == "asasrec2":
            if self.eps_pos:
                eps["pos_emb"] = self.eps_pos
            for bi in range(self.num_blocks):
                if self.eps_dense:
                    for name in ("wq",):
                        eps["blocks"][bi][name] = {"w": self.eps_dense,
                                                   "b": self.eps_dense}
                if self.eps_conv:
                    for name in ("conv1", "conv2"):
                        eps["blocks"][bi][name] = {"w": self.eps_conv,
                                                   "b": self.eps_conv}
        return eps

    def _delta_tree(self, params, seq, pos, neg):
        """FGSM deltas as a zero-filled copy of ``params`` with perturbed
        leaves set (SASRec.py:368-404). ``adv_steps>1`` iterates PGD-style:
        step size ε/adv_steps per leaf, gradient re-taken at the perturbed
        point, per-leaf projection back into its ε-ball; reduces exactly to
        the reference's single FGSM step at adv_steps=1."""
        # constant under outer autodiff (see the loss() hot-path note)
        params = jax.lax.stop_gradient(params)
        eps = self._eps_tree(params)

        def project(d, e):
            if e == 0.0:
                return jnp.zeros_like(d)
            # tf.nn.l2_normalize axis convention: rows for matrices, the
            # whole tensor for vectors (matches _tf_l2_normalize)
            return project_rows(d, e, axis=1 if d.ndim >= 2 else None)

        delta = jax.tree.map(jnp.zeros_like, params)
        for _ in range(self.adv_steps):
            shifted = jax.tree.map(jnp.add, params, delta)
            g = jax.lax.stop_gradient(
                jax.grad(self._clean_loss_fn)(shifted, seq, pos, neg))
            delta = jax.tree.map(
                lambda d, gl, e: project(
                    d + (e / self.adv_steps) * _tf_l2_normalize(gl), e),
                delta, g, eps)
        return delta

    def _window_rows(self, item_emb, window, neg):
        """One [B, 2T+1] gather for the packed sampler form: the seq and pos
        row sets share the window rows, so the backward scatter-add carries
        2T+1 update rows per example instead of 3T — profiled as the top
        non-matmul cost of the T=50 step (scripts/profile_seq_step.py)."""
        t = neg.shape[1]
        rows = item_emb[jnp.concatenate([window, neg], axis=1)]
        return rows[:, :t], rows[:, 1:t + 1], rows[:, t + 1:]

    def _clean_loss_fn_window(self, params, window, neg):
        """`_clean_loss_fn` in packed-window form (same value; the dense
        item-table grad aggregates identical per-occurrence cotangents)."""
        seq, pos = window[:, :-1], window[:, 1:]
        seq_e, pos_e, neg_e = self._window_rows(params["item_emb"],
                                                window, neg)
        reprs = self.encode_core(params, seq_e * math.sqrt(self.dim),
                                 seq != 0, train=False,
                                 dtype=self._compute_dtype())
        loss, _ = self._pointwise_loss_rows(reprs, pos_e, neg_e, pos)
        return loss

    def loss_window(self, params, batch, key):
        """Packed-window training loss (see SequenceModel.loss_window):
        mathematically identical to ``loss`` on the expanded batch — the
        shared-row gather only reassociates the backward's scatter sums.
        The asasrec2 / PGD paths perturb whole weight tensors, so they gain
        nothing from row packing and delegate to the generic expansion."""
        if self.adversarial and (self.adv_mode == "asasrec2"
                                 or self.adv_steps != 1):
            return super().loss_window(params, batch, key)
        users, window, neg = batch
        seq, pos = window[:, :-1], window[:, 1:]
        k_enc, _ = jax.random.split(key)
        seq_e, pos_e, neg_e = self._window_rows(params["item_emb"],
                                                window, neg)
        reprs = self.encode_core(params, seq_e * math.sqrt(self.dim),
                                 seq != 0, train=True, key=k_enc,
                                 dtype=self._compute_dtype())
        loss, auc = self._pointwise_loss_rows(reprs, pos_e, neg_e, pos)
        if self.l2_emb:
            loss = loss + self.l2_emb * jnp.sum(jnp.square(params["item_emb"]))
        aux = {"loss": loss, "acc": auc}
        if self.adversarial:
            # reference asasrec FGSM hot path (see loss()), with the inner
            # clean-loss backward also in packed-window form
            prm_c = jax.lax.stop_gradient(params)
            g_emb = jax.grad(
                lambda emb: self._clean_loss_fn_window(
                    {**prm_c, "item_emb": emb}, window, neg)
            )(prm_c["item_emb"])
            t = seq.shape[1]
            g_rows = g_emb[jnp.concatenate([pos, neg], axis=1)]
            pos_adv = pos_e + self.eps * row_normalize(g_rows[:, :t])
            neg_adv = neg_e + self.eps * row_normalize(g_rows[:, t:])
            adv_loss, adv_auc = self._pointwise_loss_rows(
                reprs, pos_adv, neg_adv, pos)
            loss = loss + self.reg_adv * adv_loss
            aux["loss_adv"] = adv_loss
            aux["acc_adv"] = adv_auc
        return loss, aux

    def loss(self, params, batch, key):
        users, seq, pos, neg = batch
        k_enc, k_adv = jax.random.split(key)
        seq_e, pos_e, neg_e = self._embed_rows(params["item_emb"],
                                               seq, pos, neg)
        reprs = self.encode_core(params, seq_e * math.sqrt(self.dim),
                                 seq != 0, train=True, key=k_enc,
                                 dtype=self._compute_dtype())
        loss, auc = self._pointwise_loss_rows(reprs, pos_e, neg_e, pos)
        if self.l2_emb:
            loss = loss + self.l2_emb * jnp.sum(jnp.square(params["item_emb"]))
        aux = {"loss": loss, "acc": auc}
        if self.adversarial:
            if self.adv_mode != "asasrec2" and self.adv_steps == 1:
                # hot path (reference asasrec config, SASRec.py:356-363):
                # the perturbed table is only ever read at the pos/neg rows
                # of the logit layer (the encoder stays clean), and row-wise
                # l2-normalize commutes with the row gather — so gather the
                # dense clean grad once and never materialize the delta
                # table, the full-table normalize, or the full-table
                # `emb + delta` add (~15 table-sized ops/step at Video scale)
                # stop_gradient the INPUTS (not just the result): the inner
                # grad graph must be constant under the outer autodiff trace,
                # both for semantics (reference FGSM linearizes at the clean
                # point) and because a second JVP level around the fused
                # encoder's custom-VJP pallas call trips pallas tracing
                prm_c = jax.lax.stop_gradient(params)
                g_emb = jax.grad(
                    lambda emb: self._clean_loss_fn(
                        {**prm_c, "item_emb": emb}, seq, pos, neg)
                )(prm_c["item_emb"])
                # row_normalize == tf.nn.l2_normalize(axis=1) on table rows:
                # gathered [B, 2T, d] rows normalize on the last axis
                t = seq.shape[1]  # one gather for both grad row sets
                g_rows = g_emb[jnp.concatenate([pos, neg], axis=1)]
                pos_adv = pos_e + self.eps * row_normalize(g_rows[:, :t])
                neg_adv = neg_e + self.eps * row_normalize(g_rows[:, t:])
                adv_loss, adv_auc = self._pointwise_loss_rows(
                    reprs, pos_adv, neg_adv, pos)
            else:
                delta = self._delta_tree(params, seq, pos, neg)
                emb_plus = params["item_emb"] + delta["item_emb"]
                if self.adv_mode == "asasrec2":
                    adv_params = jax.tree.map(jnp.add, params, delta)
                    aseq_e, apos_e, aneg_e = self._embed_rows(
                        emb_plus, seq, pos, neg)
                    adv_reprs = self.encode_core(
                        adv_params, aseq_e * math.sqrt(self.dim), seq != 0,
                        train=True, key=k_adv, dtype=self._compute_dtype())
                else:
                    adv_reprs = reprs  # clean encoder (SASRec.py:356-363)
                    t = seq.shape[1]  # perturbed table read only at pos/neg
                    rows = emb_plus[jnp.concatenate([pos, neg], axis=1)]
                    apos_e, aneg_e = rows[:, :t], rows[:, t:]
                adv_loss, adv_auc = self._pointwise_loss_rows(
                    adv_reprs, apos_e, aneg_e, pos)
            loss = loss + self.reg_adv * adv_loss
            aux["loss_adv"] = adv_loss
            aux["acc_adv"] = adv_auc
        return loss, aux

    # ------------------------------------------------------------------
    def score_all(self, params, users, hists):
        """Full-catalog scores from each user's last-position representation
        (reference test_logits, SASRec.py:176-181)."""
        seq = hists[:, -self.maxlen:]
        reprs = self.encode(params, seq, train=False)[:, -1, :]  # [B, d]
        return reprs @ params["item_emb"].T

    def score_some(self, params, users, hists, items):
        seq = hists[:, -self.maxlen:]
        reprs = self.encode(params, seq, train=False)[:, -1, :]
        return jnp.einsum("bd,bmd->bm", reprs, params["item_emb"][items])

    def factored_scorer(self):
        if not hasattr(self, "_fs"):
            def user_repr(params, users, hists):
                seq = hists[:, -self.maxlen:]
                return self.encode(params, seq, train=False)[:, -1, :]

            def table(params):
                return params["item_emb"], None

            self._fs = (user_repr, table)
        return self._fs
