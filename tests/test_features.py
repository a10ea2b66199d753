"""DNS, sampled eval mode, and pretrain warm-start."""

import jax
import numpy as np
import optax

from acf_tpu.data import interactions_from_frame
from acf_tpu.models.mf import MFBPR
from acf_tpu.train import Trainer, TrainConfig
from acf_tpu.train.checkpoint import save_params
from tests.test_trainer import synthetic_data


def test_dns_epoch_runs_and_learns():
    data = synthetic_data(seed=21)
    model = MFBPR(data.num_users, data.num_items, 8, dns=4)
    tr = Trainer(model, data, optax.adagrad(0.1),
                 TrainConfig(batch_size=32, verbose=10**9))
    before = tr.evaluate().at_k(10)
    for _ in range(25):
        stats = tr.run_epoch()
    after = tr.evaluate().at_k(10)
    assert np.isfinite(stats["loss"])
    assert after[1] > before[1], (before, after)


def test_sampled_eval_mode():
    import pandas as pd
    rng = np.random.default_rng(3)
    rows = [(u, int(rng.integers(1, 40)), t)
            for t, u in enumerate(list(range(1, 30)) * 6)]
    df = pd.DataFrame(rows, columns=["uid", "iid", "timestamp"])
    data = interactions_from_frame(df, reindex=False, num_negatives=20)
    model = MFBPR(data.num_users, data.num_items, 8)
    tr = Trainer(model, data, optax.adagrad(0.1),
                 TrainConfig(batch_size=32, verbose=10**9, eval_sampled=True))
    res = tr.evaluate()
    hr, ndcg, auc = res.at_k(10)
    assert 0 <= hr <= 1 and 0 <= auc <= 1
    # position against 20 negatives → AUC granularity 1/20
    assert res.hr.shape[1] == 100


def test_load_pretrain_partial(tmp_path):
    data = synthetic_data(seed=22)
    src = Trainer(MFBPR(data.num_users, data.num_items, 8), data,
                  optax.adagrad(0.1), TrainConfig(batch_size=32))
    for _ in range(5):
        src.run_epoch()
    path = str(tmp_path / "pre")
    save_params(path, src.params)

    dst = Trainer(MFBPR(data.num_users, data.num_items, 8, adversarial=True),
                  data, optax.adagrad(0.1), TrainConfig(batch_size=32))
    loaded = dst.load_pretrain(path)
    assert set(loaded) == {"P", "Q"}
    np.testing.assert_allclose(np.asarray(dst.params["P"]),
                               np.asarray(src.params["P"]))
