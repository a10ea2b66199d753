import jax
import jax.numpy as jnp
import numpy as np
import optax

from acf_tpu.models.neumf import NeuMF
from acf_tpu.train import Trainer, TrainConfig
from tests.test_trainer import synthetic_data


def test_score_all_matches_logits():
    model = NeuMF(20, 30, 8)
    params = model.init_params(jax.random.PRNGKey(0))
    users = jnp.asarray([3, 7])
    scores = np.asarray(model.score_all(params, users, None))
    assert scores.shape == (2, 30)
    # spot-check against direct pair logits
    for b, u in enumerate([3, 7]):
        for i in (0, 13, 29):
            direct = float(model._logits(params, jnp.asarray([u]), jnp.asarray([i]))[0])
            np.testing.assert_allclose(scores[b, i], direct, rtol=1e-4, atol=1e-5)


def test_neumf_trains():
    data = synthetic_data(seed=7)
    model = NeuMF(data.num_users, data.num_items, 8)
    tr = Trainer(model, data, optax.adam(0.01),
                 TrainConfig(batch_size=32, verbose=10**9))
    before = tr.evaluate().at_k(10)
    for _ in range(25):
        stats = tr.run_epoch()
    after = tr.evaluate().at_k(10)
    assert after[1] > before[1], (before, after)
    assert stats["acc"] > 0.6
