import numpy as np
import optax
import pytest

from acf_tpu.models.apl import APL
from acf_tpu.models.irgan import IRGAN
from acf_tpu.models.naive import (
    AlreadyVisit, MostFrequentlyVisit, MostPopular, MostRecentlyVisit,
)
from acf_tpu.train import Trainer, TrainConfig
from tests.test_trainer import synthetic_data


def test_irgan_epoch_and_eval():
    data = synthetic_data(seed=11)
    model = IRGAN(data.num_users, data.num_items, 8)
    tr = Trainer(model, data, optax.sgd(0.001),
                 TrainConfig(batch_size=32, verbose=10**9))
    s = tr.run_epoch()
    assert np.isfinite(s["loss"]) and np.isfinite(s["d_loss"])
    before = tr.evaluate().at_k(10)
    for _ in range(20):
        tr.run_epoch()
    after = tr.evaluate().at_k(10)
    # discriminator signal should lift the generator above random-ish start
    assert after[2] > 0.5, (before, after)  # AUC


@pytest.mark.parametrize("loss_fn", ["log", "wgan", "hinge"])
def test_apl_epoch(loss_fn):
    data = synthetic_data(seed=12)
    model = APL(data.num_users, data.num_items, 8, loss_function=loss_fn)
    tr = Trainer(model, data, optax.sgd(0.05),
                 TrainConfig(batch_size=32, verbose=10**9))
    s = tr.run_epoch()
    assert np.isfinite(s["loss"]) and np.isfinite(s["d_loss"])
    if loss_fn == "wgan":
        # weight clipping applied
        assert float(abs(np.asarray(tr.params["c"]["P"])).max()) <= 0.05 + 1e-6


def test_apl_pretrained_protocol():
    """The reference never trains APL from scratch — its generator is
    initialized from a pretrained BPR checkpoint (APL.py:68-78). Replicate:
    pretrain MF-BPR, hand the embeddings to APL's generator, continue."""
    from acf_tpu.models.mf import MFBPR

    data = synthetic_data(seed=13)
    bpr = MFBPR(data.num_users, data.num_items, 8)
    pre = Trainer(bpr, data, optax.adagrad(0.1),
                  TrainConfig(batch_size=32, verbose=10**9))
    for _ in range(20):
        pre.run_epoch()
    bpr_ndcg = pre.evaluate().at_k(10)[1]

    model = APL(data.num_users, data.num_items, 8)
    tr = Trainer(model, data, optax.sgd(0.05),
                 TrainConfig(batch_size=32, verbose=10**9))
    tr.params["g"] = dict(pre.params)  # checkpoint-mediated handoff
    start = tr.evaluate().at_k(10)
    assert abs(start[1] - bpr_ndcg) < 1e-5  # generator == pretrained BPR
    p0 = np.asarray(tr.params["g"]["P"]).copy()
    for _ in range(5):
        s = tr.run_epoch()
    assert np.isfinite(s["loss"]) and np.isfinite(s["d_loss"])
    # both players actually move
    assert np.abs(np.asarray(tr.params["g"]["P"]) - p0).max() > 0
    after = tr.evaluate().at_k(10)
    assert after[1] > 0.5 * bpr_ndcg  # adversarial phase keeps ranking sane


def test_naive_baselines():
    data = synthetic_data(seed=14)
    for cls in (MostPopular, MostRecentlyVisit, MostFrequentlyVisit, AlreadyVisit):
        model = cls(data.num_users, data.num_items, 8, data=data)
        tr = Trainer(model, data, optax.sgd(0.1),
                     TrainConfig(batch_size=32, verbose=10**9))
        tr.run_epoch()  # no-op
        res = tr.evaluate()
        hr, ndcg, auc = res.at_k(10)
        assert 0 <= hr <= 1
        if cls is MostPopular:
            # scores are exactly the RAW global interaction counts incl.
            # duplicate visits (reference NaiveBaselines.py:9 groupby size)
            row = np.asarray(model.score_all(
                tr.params, np.array([1, 2]), None))[0]
            np.testing.assert_array_equal(row, data.item_count)
        if cls is AlreadyVisit:
            # train items are excluded from candidates, so AlreadyVisit
            # scores every candidate 0 → gt ties with everything
            assert hr >= 0


def test_irgan_pairwise_discriminator():
    data = synthetic_data(seed=15)
    model = IRGAN(data.num_users, data.num_items, 8, pairwise_d=True)
    tr = Trainer(model, data, optax.sgd(0.001),
                 TrainConfig(batch_size=32, verbose=10**9))
    s = tr.run_epoch()
    assert np.isfinite(s["loss"]) and np.isfinite(s["d_loss"])


def test_gan_pad_item_gets_no_mass():
    """The generators' softmax/sampling must exclude the pad item 0
    (the reference's catalogs have no pad id; IRGAN.py:186-192,
    APL.py:193-203): after a training epoch the pad row of every table that
    only receives gradient when item 0 is sampled must still equal its init."""
    import jax

    data = synthetic_data(seed=15)

    model = IRGAN(data.num_users, data.num_items, 8)
    init = model.init_params(jax.random.PRNGKey(2019 + 1))  # trainer splits
    tr = Trainer(model, data, optax.sgd(0.001),
                 TrainConfig(batch_size=32, verbose=10**9, seed=2019))
    q0_before = np.asarray(tr.params["g"]["Q"][0]).copy()
    d0_before = np.asarray(tr.params["d"]["Q"][0]).copy()
    for _ in range(3):
        tr.run_epoch()
    np.testing.assert_array_equal(np.asarray(tr.params["g"]["Q"][0]), q0_before)
    np.testing.assert_array_equal(np.asarray(tr.params["d"]["Q"][0]), d0_before)
    del init

    apl = APL(data.num_users, data.num_items, 8)
    tra = Trainer(apl, data, optax.sgd(0.05),
                  TrainConfig(batch_size=32, verbose=10**9))
    c0 = np.asarray(tra.params["c"]["Q"][0]).copy()
    for _ in range(3):
        tra.run_epoch()
    # critic pad row only moves if the fake one-hot leaks mass onto col 0
    np.testing.assert_allclose(np.asarray(tra.params["c"]["Q"][0]), c0,
                               atol=1e-7)


@pytest.mark.parametrize("loss_fn", ["log", "wgan", "hinge"])
def test_apl_manual_gen_grads_match_autodiff(loss_fn):
    """The closed-form generator-phase backward (models/apl.py
    gen_step_manual — round-5 fusion of the [B, I] softmax chain) is the
    same math as autodiff through the reference formulation: identical
    seeds must give float-tolerance-identical parameter trajectories."""
    data = synthetic_data(seed=31)
    kw = dict(loss_function=loss_fn)
    m_auto = APL(data.num_users, data.num_items, 8, manual_gen=False, **kw)
    m_man = APL(data.num_users, data.num_items, 8, manual_gen=True, **kw)
    opt = optax.sgd(0.05)
    ta = Trainer(m_auto, data, opt, TrainConfig(batch_size=32, seed=7,
                                                verbose=10**9))
    tm = Trainer(m_man, data, opt, TrainConfig(batch_size=32, seed=7,
                                               verbose=10**9))
    for _ in range(3):
        sa = ta.run_epoch()
        sm = tm.run_epoch()
    for side in ("g", "c"):
        for nm in ("P", "Q"):
            np.testing.assert_allclose(
                np.asarray(tm.params[side][nm]),
                np.asarray(ta.params[side][nm]),
                rtol=2e-4, atol=2e-6,
                err_msg=f"{loss_fn} {side}/{nm}")
    np.testing.assert_allclose(sm["loss"], sa["loss"], rtol=1e-4,
                               atol=1e-6)


@pytest.mark.parametrize("loss_fn", ["log", "hinge"])
def test_apl_fused_gen_matches_manual(loss_fn):
    """The Pallas streaming generator chain (ops/apl_gen_fused.py,
    interpret mode on CPU) draws the SAME jax.random noise as
    gen_step_manual, so epoch trajectories must agree to float tolerance."""
    data = synthetic_data(seed=33)
    kw = dict(loss_function=loss_fn)
    m_man = APL(data.num_users, data.num_items, 8, manual_gen=True, **kw)
    m_fus = APL(data.num_users, data.num_items, 8, fused_gen=True, **kw)
    opt = optax.sgd(0.05)
    tm = Trainer(m_man, data, opt, TrainConfig(batch_size=32, seed=11,
                                               verbose=10**9))
    tf_ = Trainer(m_fus, data, opt, TrainConfig(batch_size=32, seed=11,
                                                verbose=10**9))
    for _ in range(2):
        sm = tm.run_epoch()
        sf = tf_.run_epoch()
    for side in ("g", "c"):
        for nm in ("P", "Q"):
            np.testing.assert_allclose(
                np.asarray(tf_.params[side][nm]),
                np.asarray(tm.params[side][nm]),
                rtol=2e-4, atol=2e-6,
                err_msg=f"{loss_fn} {side}/{nm}")
    np.testing.assert_allclose(sf["loss"], sm["loss"], rtol=1e-4,
                               atol=1e-6)
