import numpy as np
import optax

from acf_tpu.adversarial.popularity import PopularityAdversarial, popularity_split
from acf_tpu.models.mf import PointwiseMF, MFBPR
from acf_tpu.models.neumf import NeuMF
from acf_tpu.train import Trainer, TrainConfig
from tests.test_trainer import synthetic_data


def test_popularity_split():
    counts = np.array([0, 5, 1, 3, 0, 9])
    pop, rare = popularity_split(counts, 0.25)
    assert list(pop) == [5]
    assert set(rare) == {1, 2, 3}
    assert 0 not in set(pop) | set(rare) and 4 not in set(pop) | set(rare)


def test_amf_trains():
    data = synthetic_data(seed=3)
    base = PointwiseMF(data.num_users, data.num_items, 8)
    model = PopularityAdversarial(data.num_users, data.num_items, 8,
                                  base=base, weight=0.01, pop_percent=0.2)
    tr = Trainer(model, data, optax.adam(0.01),
                 TrainConfig(batch_size=32, verbose=10**9))
    before = tr.evaluate().at_k(10)
    for _ in range(30):
        stats = tr.run_epoch()
    after = tr.evaluate().at_k(10)
    assert np.isfinite(stats["loss"]) and np.isfinite(stats["d_loss"])
    assert after[1] > before[1], (before, after)


def test_abpr_and_aneumf_smoke():
    data = synthetic_data(seed=4)
    for base in (MFBPR(data.num_users, data.num_items, 8),
                 NeuMF(data.num_users, data.num_items, 8)):
        model = PopularityAdversarial(data.num_users, data.num_items, 8,
                                      base=base, weight=0.001)
        tr = Trainer(model, data, optax.adam(0.01),
                     TrainConfig(batch_size=32, verbose=10**9))
        stats = tr.run_epoch()
        assert np.isfinite(stats["loss"])
        res = tr.evaluate()
        assert 0 <= res.at_k(10)[0] <= 1
