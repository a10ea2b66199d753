"""The unified trainer.

Collapses the reference's three ~90%-duplicate driver stacks
(run.py:231-276, evaluation_adv.py:218-306, utils.py:281-448) into one:

  * a fully device-resident epoch — negative sampling, loss, FGSM delta and
    optimizer update inside ONE ``lax.scan`` under ``jit`` (the reference
    pays a ``Pool.map`` fork plus two ``sess.run`` feed_dict crossings per
    minibatch, evaluation_adv.py:264-276 / 345-347);
  * leave-one-out evaluation through :class:`acf_tpu.eval.FullRankEvaluator`;
  * best-NDCG tracking, per-user .hr/.ndcg dumps, NaN abort, periodic
    checkpoints, and the two-phase pretrain→adversarial APR staging
    (reference run_adv.py:97-120) — here a warm param handoff instead of a
    graph rebuild + Saver restore.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from acf_tpu.data.datasets import Interactions
from acf_tpu.eval.full_rank import FullRankEvaluator
from acf_tpu.sampling.negatives import (
    sample_pair_epoch, sample_seq_window_batch, uniform_negatives,
)
from acf_tpu.train.checkpoint import save_params
from acf_tpu.utils.io import OutputWriter


@dataclasses.dataclass
class TrainConfig:
    batch_size: int = 512
    epochs: int = 100
    verbose: int = 1          # evaluate every N epochs (reference --verbose)
    topk: int = 10
    ckpt_every: int = 0       # save params every N epochs; 0 = off
    ckpt_path: Optional[str] = None
    ckpt_backend: str = "npz"  # "npz" (single file) or "orbax" (directory
                               # checkpoint, sharding-aware, async periodic
                               # snapshots via AsyncSnapshotter)
    seed: int = 2019
    eval_batch_users: int = 512
    eval_sampled: bool = False  # rank against sampled negatives
                                # (reference --eval_mode sample)
    membership_len: Optional[int] = None  # cap on hist cols used for rejection
    # --save_model protocol (reference run.py:257-272): save params on every
    # new best NDCG to <save_model_path>.best.npz and after every epoch to
    # <save_model_path>.last.npz. None = off.
    save_model_path: Optional[str] = None
    # a ("data", "model") jax Mesh: TRAINING runs under GSPMD over it
    # (embedding tables row-sharded over "model" via shard_params, each
    # step's batch sharded over "data" via an in-step sharding constraint —
    # XLA inserts the lookup all-gathers and gradient reductions over ICI),
    # and evaluation of factored models runs through the sharded evaluator
    # (parallel/sharded_eval.py). None = single-device everything.
    mesh: Optional[object] = None
    # tables with fewer rows than this stay replicated under mesh training
    # (sharding tiny tables costs more in collectives than it saves in HBM)
    shard_min_rows: int = 1024


@jax.jit
def _norms2(p, q):
    return jnp.stack([jnp.linalg.norm(p), jnp.linalg.norm(q)])


def _data_constrainer(mesh):
    """See :func:`acf_tpu.parallel.mesh.data_constrainer` (moved there so
    model-owned ``make_epoch_fn`` builders share the same hook)."""
    from acf_tpu.parallel.mesh import data_constrainer

    return data_constrainer(mesh)


def make_pair_epoch_fn(model, optimizer, batch_size: int, num_batches: int,
                       mesh=None):
    """Build the jitted one-epoch function for pairwise models.

    ``data`` is a dict of device arrays: pairs_u [N], pairs_i [N],
    hist [U, L]. The whole epoch (shuffle → sample negatives → grad step ×
    num_batches) is a single XLA computation.

    Supports DNS (dynamic negative sampling, ``model.dns > 1``): sample
    ``dns`` candidates per positive and keep the one the current model
    scores highest (reference evaluation_adv.py:349-367).

    With ``mesh``, the per-step (u, pos) batch is sharding-constrained over
    the "data" axis and the program jits under GSPMD — same math, executed
    data-parallel with tables sharded as placed (see TrainConfig.mesh).
    """
    constrain = _data_constrainer(mesh)
    dns = getattr(model, "dns", 1)
    # closed-form fused-step gradients when the model provides them (MFBPR
    # APR path — one scatter-add per table instead of nested-autodiff's ~6).
    # The closed form aggregates duplicate rows with O(B²) equality matrices
    # on the MXU, so past the model's batch cap ([2B,2B] f32 ≈ 1 GB at
    # B=8192) autodiff is the cheaper program.
    manual_grads = getattr(model, "manual_grads", None)
    if manual_grads is not None and batch_size > getattr(
            model, "manual_grads_max_batch", 4096):
        manual_grads = None

    def _grads(prm, batch, kl):
        if manual_grads is not None:
            return manual_grads(prm, batch, kl)
        (_, aux), grads = jax.value_and_grad(model.loss, has_aux=True)(
            prm, batch, kl)
        return grads, aux

    @partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(carry, data, key):
        params, opt_state = carry
        k_perm, k_steps = jax.random.split(key)
        n = data["pairs_u"].shape[0]
        batches = sample_pair_epoch(k_perm, n, batch_size, num_batches)
        step_keys = jax.random.split(k_steps, num_batches)

        def step(c, xs):
            prm, opt = c
            idx, kk = xs
            kn, kl = jax.random.split(kk)
            u, pos = constrain(data["pairs_u"][idx], data["pairs_i"][idx])
            hist_rows = data["hist"][u]
            if dns <= 1:
                neg = uniform_negatives(kn, hist_rows, model.num_items)
            else:
                cands = jnp.stack(
                    [uniform_negatives(k, hist_rows, model.num_items)
                     for k in jax.random.split(kn, dns)], axis=1)  # [B, dns]
                scores = model.score_some(prm, u, hist_rows, cands)
                neg = jnp.take_along_axis(
                    cands, jnp.argmax(scores, axis=1)[:, None], axis=1)[:, 0]
            grads, aux = _grads(prm, (u, pos, neg), kl)
            updates, opt = optimizer.update(grads, opt, prm)
            prm = optax.apply_updates(prm, updates)
            return (prm, opt), aux

        (params, opt_state), auxes = jax.lax.scan(
            step, (params, opt_state), (batches, step_keys))
        stats = jax.tree.map(jnp.mean, auxes)
        return (params, opt_state), stats

    return epoch_fn


def make_seq_epoch_fn(model, optimizer, batch_size: int, num_batches: int,
                      mesh=None):
    """Jitted one-epoch function for sequence models (WarpSampler semantics:
    users sampled with replacement, SASRecLayers.py:329-358). With ``mesh``,
    each step's (users, seq, pos, neg) batch is sharding-constrained over
    "data" and the program jits under GSPMD (see TrainConfig.mesh)."""
    constrain = _data_constrainer(mesh)
    # packed-window loss when the model provides one (SequenceModel API);
    # wrappers with dynamic batch_kind (e.g. FGSMAdversarial around a seq
    # base) fall back to the equivalent expanded form. An instance can set
    # ``use_window_loss = False`` to force the expansion fallback (the
    # pre-window 3-gather program) — a per-instance A/B switch, used by
    # scripts/parity_video.py --legacy instead of mutating class state.
    _expand = lambda prm, b, k: model.loss(
        prm, (b[0], b[1][:, :-1], b[1][:, 1:], b[2]), k)
    loss_window = (getattr(model, "loss_window", _expand)
                   if getattr(model, "use_window_loss", True) else _expand)

    @partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(carry, data, key):
        params, opt_state = carry
        step_keys = jax.random.split(key, num_batches)

        def step(c, kk):
            prm, opt = c
            ks, kl = jax.random.split(kk)
            # packed-window batch: loss_window shares the seq/pos rows in
            # ONE 2T+1-row gather (⇒ 2T+1-row backward scatter, not 3T)
            users, window, neg = constrain(*sample_seq_window_batch(
                ks, data["hist"], data["eligible"],
                model.maxlen, model.num_items, batch_size))
            (_, aux), grads = jax.value_and_grad(
                loss_window, has_aux=True)(
                prm, (users, window, neg), kl)
            updates, opt = optimizer.update(grads, opt, prm)
            prm = optax.apply_updates(prm, updates)
            return (prm, opt), aux

        (params, opt_state), auxes = jax.lax.scan(
            step, (params, opt_state), step_keys)
        stats = jax.tree.map(jnp.mean, auxes)
        return (params, opt_state), stats

    return epoch_fn


class Trainer:
    """Epoch-driven trainer with reference-protocol evaluation and logging."""

    def __init__(self, model, data: Interactions, optimizer,
                 config: TrainConfig = TrainConfig(),
                 writer: Optional[OutputWriter] = None,
                 custom_epoch: Optional[Callable] = None):
        self.model = model
        self.data = data
        self.optimizer = optimizer
        self.cfg = config
        self.writer = writer or OutputWriter(None, None)

        # membership_len caps the history columns used for rejection
        # sampling. Models that consume dev["hist"] semantically (sequence
        # windows, GAN positive mixtures — marked uses_full_hist) are
        # exempt: truncating theirs would silently change the objective.
        ml = config.membership_len
        if getattr(model, "batch_kind", "pair") == "seq" or \
                getattr(model, "uses_full_hist", False):
            ml = None
        hist = data.hist if ml is None else data.hist[:, -ml:]
        self.dev = {
            "pairs_u": jnp.asarray(data.pairs_u),
            "pairs_i": jnp.asarray(data.pairs_i),
            "hist": jnp.asarray(hist),
            "hist_len": jnp.asarray(np.minimum(data.hist_len, hist.shape[1])),
            "eligible": jnp.asarray(
                np.nonzero(data.hist_len >= 2)[0].astype(np.int32)),
        }

        self.evaluator = self._make_evaluator(model)

        if hasattr(model, "extra_device_data"):
            self.dev.update(model.extra_device_data(data))

        self._custom_epoch = custom_epoch is not None
        if custom_epoch is not None:
            self.epoch_fn = custom_epoch
            self.num_batches = 1
        elif hasattr(model, "make_epoch_fn"):
            # models with bespoke training procedures (popularity
            # discriminators, GAN minimax, windowed instances) build their
            # own epoch program from the device data
            self.num_batches = max(data.num_pairs // config.batch_size, 1)
            self.epoch_fn = model.make_epoch_fn(
                optimizer, config.batch_size, self.num_batches, self.dev,
                mesh=config.mesh)
        elif model.batch_kind == "seq":
            # reference: num_batch = len(trainSeq) // batch_size (SASRec.py:449)
            n_seq_users = int((data.hist_len >= 1).sum())
            self.num_batches = max(n_seq_users // config.batch_size, 1)
            self.epoch_fn = make_seq_epoch_fn(
                model, optimizer, config.batch_size, self.num_batches,
                mesh=config.mesh)
        else:
            self.num_batches = max(data.num_pairs // config.batch_size, 1)
            self.epoch_fn = make_pair_epoch_fn(
                model, optimizer, config.batch_size, self.num_batches,
                mesh=config.mesh)

        if config.mesh is not None:
            # mesh training: dataset arrays replicated across the mesh (they
            # are indexed with data-sharded ids each step), tables with
            # >= shard_min_rows rows row-sharded over "model" — optimizer
            # slots inherit placement via zeros_like
            from acf_tpu.parallel.input_pipeline import replicate
            self.dev = {k: replicate(config.mesh, v)
                        for k, v in self.dev.items()}

        key = jax.random.PRNGKey(config.seed)
        self.key, k_init = jax.random.split(key)
        self.params = model.init_params(k_init)
        if config.mesh is not None:
            from acf_tpu.parallel.mesh import shard_params
            self.params = shard_params(config.mesh, self.params,
                                       min_rows=config.shard_min_rows)
        if hasattr(model, "init_opt_state"):
            self.opt_state = model.init_opt_state(self.optimizer, self.params)
        else:
            self.opt_state = optimizer.init(self.params)

        self.best = {"ndcg": -1.0, "epoch": -1, "result": None}
        self._multi_cache = {}
        self._snapshotter = None

    # ------------------------------------------------------------------
    def run_epoch(self):
        self.key, k = jax.random.split(self.key)
        (self.params, self.opt_state), stats = self.epoch_fn(
            (self.params, self.opt_state), self.dev, k)
        return jax.tree.map(float, jax.device_get(stats))

    def run_epochs(self, n: int):
        """Run ``n`` epochs as ONE device dispatch (a ``lax.scan`` over the
        epoch program). Bit-exact with ``n`` sequential :meth:`run_epoch`
        calls — the per-epoch keys are split from ``self.key`` in the same
        order — but pays the fixed host→device dispatch cost (~15-20 ms
        through the axon tunnel) once instead of ``n`` times. Returns the
        per-epoch stats stacked on a leading axis."""
        if n == 1 or self._custom_epoch:
            # custom epoch callables may do host-side work — don't trace them
            out = [self.run_epoch() for _ in range(n)]
            return jax.tree.map(lambda *xs: np.asarray(xs), *out)
        keys = []
        for _ in range(n):
            self.key, k = jax.random.split(self.key)
            keys.append(k)
        multi = self._multi_cache.get(n)
        if multi is None:
            epoch_fn = self.epoch_fn

            @partial(jax.jit, donate_argnums=(0,))
            def multi(carry, data, ks):
                def one(c, k):
                    return epoch_fn(c, data, k)
                return jax.lax.scan(one, carry, ks)

            self._multi_cache[n] = multi
        (self.params, self.opt_state), stats = multi(
            (self.params, self.opt_state), self.dev, jnp.stack(keys))
        return jax.tree.map(np.asarray, jax.device_get(stats))

    def profile_epoch(self, trace_dir: str):
        """Run one epoch + one evaluation under the JAX profiler (XPlane
        traces viewable in TensorBoard/Perfetto). The reference has no
        profiler at all (SURVEY.md §5) — its only signal is wall-clock
        prints."""
        with jax.profiler.trace(trace_dir):
            stats = self.run_epoch()
            res = self.evaluate()
        return stats, res

    def evaluate(self):
        if self.cfg.eval_sampled:
            return self.evaluator.evaluate(self.model.score_some, self.params,
                                           sampled=True)
        return self.evaluator.evaluate_model(self.model, self.params)

    def save_checkpoint(self, path: str, blocking: bool = True):
        """Full train state: params + optimizer slots + RNG key (enables
        bit-exact resume, unlike the reference's embeddings-only Saver,
        evaluation_adv.py:235). With the orbax backend and
        ``blocking=False``, serialization/IO overlap with subsequent
        training (periodic snapshots in :meth:`fit` use this)."""
        state = {"params": self.params, "opt": self.opt_state,
                 "key": self.key}
        if self.cfg.ckpt_backend == "orbax" and not blocking:
            if self._snapshotter is None:
                from acf_tpu.train.checkpoint import AsyncSnapshotter
                self._snapshotter = AsyncSnapshotter()
            self._snapshotter.save(path, state)
            return
        save_params(path, state, backend=self.cfg.ckpt_backend)

    def restore_checkpoint(self, path: str):
        from acf_tpu.train.checkpoint import load_params
        if self._snapshotter is not None:
            self._snapshotter.wait()
        like = {"params": self.params, "opt": self.opt_state, "key": self.key}
        state = load_params(path, like)
        self.params = state["params"]
        self.opt_state = state["opt"]
        # through-host copy: the orbax backend returns the key COMMITTED to
        # its restore device, which a jitted step would then refuse to mix
        # with mesh-placed params ("incompatible devices") — a fresh
        # trainer's key is uncommitted, so make the restored one match
        self.key = jnp.asarray(np.asarray(state["key"]))

    def load_pretrain(self, path: str):
        """Copy matching leaves from a checkpoint into the current params —
        the reference's ``load_pre_train`` by-layer-name handoff
        (BPR.py:59-65, IRGAN.py:29-34). Leaves present in the checkpoint
        with matching shape are loaded; everything else keeps its init."""
        data = dict(np.load(path if path.endswith(".npz") else path + ".npz"))
        # accept full train-state snapshots (save_checkpoint nests params
        # under "params/") as pretrain sources too
        for k in list(data):
            if k.startswith("params/"):
                data.setdefault(k[len("params/"):], data[k])
        from acf_tpu.train.checkpoint import path_name
        flat, treedef = jax.tree_util.tree_flatten_with_path(self.params)
        leaves = []
        loaded = []
        for p, leaf in flat:
            name = path_name(p)
            if name in data and data[name].shape == leaf.shape:
                leaves.append(jnp.asarray(data[name], leaf.dtype))
                loaded.append(name)
            else:
                leaves.append(leaf)
        self.params = jax.tree_util.tree_unflatten(treedef, leaves)
        return loaded

    def fit(self, epochs: Optional[int] = None, epoch_start: int = 0,
            tag: str = "", final: bool = True) -> dict:
        cfg = self.cfg
        epochs = cfg.epochs if epochs is None else epochs
        # When evaluation is sparse (verbose > 1) and nothing needs the host
        # between epochs (no per-epoch .last saves / periodic checkpoints),
        # run each inter-eval block of epochs as ONE device dispatch
        # (run_epochs) — the per-dispatch fixed cost is ~15-20 ms through
        # the axon tunnel vs ~100 ms of compute per ml-1m-scale epoch.
        # models can opt out of multi-epoch fusion (fuse_epochs = False) or
        # cap the per-dispatch block (max_fuse_epochs = N): APL's 25-epoch
        # fused scan reproducibly crashed the TPU worker ("kernel fault",
        # r3 zoo re-run) while 5-epoch blocks of the same program run fine —
        # the round-4 ablation probe (scripts/apl_probe.sh) isolated the
        # fault to the generator-phase softmax backward at large
        # block × steps × catalog extent, so APL fuses in capped blocks
        # instead of falling all the way back to per-epoch dispatch. See
        # models/apl.py and docs/ROADMAP.md.
        cap = getattr(self.model, "max_fuse_epochs", None)
        if not getattr(self.model, "fuse_epochs", True):
            cap = 1
        fuse = ((cfg.verbose or 0) > 1 and not cfg.save_model_path
                and not (cfg.ckpt_every and cfg.ckpt_path)
                and cap != 1)
        epoch = epoch_start
        while epoch < epochs:
            if fuse:
                # run through the next eval epoch (first e >= epoch with
                # e % verbose == 0), or to the end if no eval remains —
                # never more than max_fuse_epochs at once
                nxt = epoch + (-epoch) % cfg.verbose
                end = min(nxt, epochs - 1)
                if cap:
                    end = min(end, epoch + cap - 1)
            else:
                end = epoch
            n = end - epoch + 1
            t0 = time.time()
            stats_all = self.run_epochs(n)
            train_time = (time.time() - t0) / n
            losses = np.asarray(stats_all.get("loss", np.full(n, np.nan)),
                                dtype=np.float64)
            bad = np.nonzero(np.isnan(losses))[0]
            if bad.size:
                self.writer.line(
                    f"Epoch {epoch + int(bad[0])}: NaN loss, aborting")
                break
            stats = {k: float(np.asarray(v)[-1])
                     for k, v in stats_all.items()}
            epoch = end
            if cfg.verbose and epoch % cfg.verbose == 0:
                t1 = time.time()
                res = self.evaluate()
                eval_time = time.time() - t1
                hr, ndcg, auc = res.at_k(cfg.topk)
                norms = self._table_norms()
                # reference epoch-line format (evaluation_adv.py:323-325)
                self.writer.line(
                    "Epoch %d [%.1fs + %.1fs]: HR = %.4f, NDCG = %.4f "
                    "ACC = %.4f ACC_adv = %.4f [%.1fs], |P|=%.2f, |Q|=%.2f"
                    % (epoch, 0.0, train_time, hr, ndcg,
                       stats.get("acc", 0.0),
                       stats.get("acc_adv", stats.get("acc", 0.0)),
                       eval_time, norms[0], norms[1]))
                if ndcg > self.best["ndcg"]:
                    self.best = {"ndcg": ndcg, "epoch": epoch,
                                 "result": res, "hr": hr, "auc": auc}
                    # per-user dump column follows the reference: the
                    # full-rank drivers write the K=100 (last) column
                    # (evaluation_adv.py:292-294 raw_result[:, :, -1]); the
                    # sampled/Keras driver writes @topk (run.py:263-265)
                    col = (cfg.topk - 1) if cfg.eval_sampled else -1
                    self.writer.predictions(f"{tag}.hr", res.hr[:, col])
                    self.writer.predictions(f"{tag}.ndcg", res.ndcg[:, col])
                    if cfg.save_model_path:  # reference .best.h5, run.py:260-262
                        save_params(cfg.save_model_path + ".best", self.params)
            if cfg.save_model_path:  # reference .last.h5, run.py:271-272
                save_params(cfg.save_model_path + ".last", self.params)
            if cfg.ckpt_every and cfg.ckpt_path and epoch % cfg.ckpt_every == 0:
                # full train state (params + opt slots + RNG), so a crashed
                # run resumes bit-exactly — richer than the reference's
                # embeddings-only periodic Saver (evaluation_adv.py:303-306);
                # orbax backend: IO overlaps with the next training block
                self.save_checkpoint(f"{cfg.ckpt_path}-{epoch}",
                                     blocking=False)
            epoch += 1
        if self._snapshotter is not None:
            self._snapshotter.wait()
        # the reference writes the K=1..100 sweep only at the terminal epoch
        # (evaluation_adv.py:295-300) — not between APR phases
        if final and self.best["result"] is not None:
            self._write_best_sweep()
        return self.best

    def _write_best_sweep(self):
        res = self.best["result"]
        self.writer.line("Epoch %d is the best epoch" % self.best["epoch"])
        hr_k = res.hr.mean(0)
        ndcg_k = res.ndcg.mean(0)
        auc = float(res.auc.mean())
        # the reference sweeps K=1..100 in full-rank mode but only K=1..10
        # in sampled mode (utils.py:344 ``K = 100 if eval_mode == "all"
        # else 10``)
        k_max = 10 if self.cfg.eval_sampled else hr_k.shape[0]
        for k in range(min(k_max, hr_k.shape[0])):
            self.writer.line("K = %d: HR = %.4f, NDCG = %.4f AUC = %.4f"
                             % (k + 1, hr_k[k], ndcg_k[k], auc))

    def _table_norms(self):
        """(|P|, |Q|) for the epoch line (reference evaluation_adv.py:319-325);
        falls back to the item table for sequence/GAN models."""
        if not isinstance(self.params, dict):
            return 0.0, 0.0
        src = self.params.get("base", self.params.get("g", self.params))
        p = src.get("P", src.get("user_emb")) if isinstance(src, dict) else None
        q = src.get("Q", src.get("item_emb", src.get("emb"))) \
            if isinstance(src, dict) else None
        if p is not None and q is not None:
            # one fused dispatch + one transfer (a float() per norm costs a
            # ~15-20 ms round-trip each through the axon tunnel)
            np_, nq = np.asarray(_norms2(p, q))
            return float(np_), float(nq)
        np_ = float(jnp.linalg.norm(p)) if p is not None else 0.0
        nq = float(jnp.linalg.norm(q)) if q is not None else 0.0
        return np_, nq

    # ------------------------------------------------------------------
    def switch_model(self, model, reset_opt: bool = True):
        """Swap the model (e.g. clean → adversarial for APR phase 2) keeping
        params. ``reset_opt=True`` (the APR-MF protocol) resets optimizer
        slots: the reference rebuilds the graph, runs
        ``global_variables_initializer`` (fresh Adagrad accumulators) and
        Saver-restores ONLY the embeddings (run_adv.py:114-120,
        evaluation_adv.py:235). ``reset_opt=False`` carries slots across the
        switch — the ASASRec protocol, whose full-variable Saver restores
        Adam moments too (utils.py:306-315)."""
        old_eval_key = self._eval_key(self.model)
        self.model = model
        self._multi_cache = {}
        self._custom_epoch = False
        if reset_opt:
            if hasattr(model, "init_opt_state"):
                self.opt_state = model.init_opt_state(self.optimizer,
                                                      self.params)
            else:
                self.opt_state = self.optimizer.init(self.params)
        if hasattr(model, "make_epoch_fn"):
            self.epoch_fn = model.make_epoch_fn(
                self.optimizer, self.cfg.batch_size, self.num_batches,
                self.dev, mesh=self.cfg.mesh)
        elif model.batch_kind == "seq":
            self.epoch_fn = make_seq_epoch_fn(
                model, self.optimizer, self.cfg.batch_size, self.num_batches,
                mesh=self.cfg.mesh)
        else:
            self.epoch_fn = make_pair_epoch_fn(
                model, self.optimizer, self.cfg.batch_size, self.num_batches,
                mesh=self.cfg.mesh)
        # keep the evaluator (device uploads + corrections cache) when the
        # new model needs identical eval geometry — the common clean→adv
        # switch; independent best tracking per phase matches the
        # reference's separate per-phase processes (run_adv.py:97-120)
        if self._eval_key(model) != old_eval_key:
            self.evaluator = self._make_evaluator(model)
        self.best = {"ndcg": -1.0, "epoch": -1, "result": None}

    def _eval_key(self, model):
        return (min(self.cfg.eval_batch_users,
                    getattr(model, "eval_batch_users",
                            self.cfg.eval_batch_users)),
                getattr(model, "maxlen", None))

    def _make_evaluator(self, model):
        eval_bu, hist_len = self._eval_key(model)
        return FullRankEvaluator(self.data, batch_users=eval_bu,
                                 eval_hist_len=hist_len, mesh=self.cfg.mesh)


def fit_two_phase(clean_model, adv_model, data: Interactions, optimizer,
                  config: TrainConfig, adv_epoch: int,
                  writer: Optional[OutputWriter] = None, tag: str = "",
                  restore: Optional[tuple] = None,
                  pretrain: Optional[str] = None,
                  reset_opt: bool = True) -> dict:
    """APR protocol (reference run_adv.py:56-120): train the clean model for
    ``adv_epoch`` epochs, then continue adversarially to ``config.epochs``.

    ``restore=(path, epoch)`` resumes a crashed run from a full-state
    snapshot (the reference's --restore is a path-convention Saver restore,
    run_adv.py:97-120 / evaluation_adv.py:222-248): the snapshot is loaded
    into whichever phase ``epoch`` falls in and training continues from
    there.

    ``reset_opt``: whether phase 2 starts with fresh optimizer slots
    (True = APR-MF, whose Saver restores embeddings only,
    evaluation_adv.py:235) or carries them (False = ASASRec, whose
    full-variable Saver restores Adam moments, utils.py:306-315).
    """
    trainer = Trainer(clean_model, data, optimizer, config, writer)
    if pretrain:
        trainer.load_pretrain(pretrain)
    start = 0
    if restore is not None and restore[1] < adv_epoch:
        trainer.restore_checkpoint(restore[0])
        start = restore[1]
    if restore is None or restore[1] < adv_epoch:
        trainer.fit(epochs=adv_epoch, epoch_start=start, tag=tag, final=False)
        if config.ckpt_path:
            save_params(config.ckpt_path + "-pretrain", trainer.params)
        trainer.switch_model(adv_model, reset_opt=reset_opt)
        start = adv_epoch
    else:
        trainer.switch_model(adv_model, reset_opt=reset_opt)
        trainer.restore_checkpoint(restore[0])
        start = restore[1]
    best = trainer.fit(epochs=config.epochs, epoch_start=start, tag=tag)
    if config.ckpt_path:
        save_params(config.ckpt_path + "-final", trainer.params)
    return best
