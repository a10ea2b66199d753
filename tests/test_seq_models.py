import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from acf_tpu.models.caser import Caser
from acf_tpu.models.dream import DREAM
from acf_tpu.models.drcf import DRCF
from acf_tpu.models.gru4rec import GRU4Rec
from acf_tpu.train import Trainer, TrainConfig
from tests.test_sasrec import seq_data


MODELS = {
    "gru4rec": lambda d: GRU4Rec(d.num_users, d.num_items, dim=16, maxlen=8),
    "gru4rec_top1": lambda d: GRU4Rec(d.num_users, d.num_items, dim=16,
                                      maxlen=8, loss_type="top1"),
    "gru4rec_ce": lambda d: GRU4Rec(d.num_users, d.num_items, dim=16,
                                    maxlen=8, loss_type="ce"),
    "dream": lambda d: DREAM(d.num_users, d.num_items, dim=16, maxlen=8),
    "drcf": lambda d: DRCF(d.num_users, d.num_items, dim=16, maxlen=8),
    "caser": lambda d: Caser(d.num_users, d.num_items, dim=16, maxlen=5,
                             n_h=4, n_v=2, dropout_rate=0.2),
}


@pytest.mark.parametrize("name", list(MODELS))
def test_model_trains_and_scores(name):
    data = seq_data()
    model = MODELS[name](data)
    tr = Trainer(model, data, optax.adam(5e-3),
                 TrainConfig(batch_size=16, verbose=10**9))
    stats = tr.run_epoch()
    assert np.isfinite(stats["loss"]), (name, stats)
    res = tr.evaluate()
    hr, ndcg, auc = res.at_k(10)
    assert 0 <= hr <= 1 and 0 <= auc <= 1


@pytest.mark.parametrize("name", ["gru4rec", "dream", "caser"])
def test_model_learns_sequence_structure(name):
    data = seq_data()
    model = MODELS[name](data)
    tr = Trainer(model, data, optax.adam(1e-2),
                 TrainConfig(batch_size=16, verbose=10**9))
    before = tr.evaluate().at_k(10)
    for _ in range(25):
        tr.run_epoch()
    after = tr.evaluate().at_k(10)
    assert after[1] > before[1] + 0.03, (name, before, after)


def test_gru_state_freezes_on_padding():
    data = seq_data()
    m = MODELS["gru4rec"](data)
    params = m.init_params(jax.random.PRNGKey(0))
    # same effective sequence with different padding must give same state
    s1 = jnp.asarray([[0, 0, 0, 0, 0, 3, 4, 5]])
    s2 = jnp.asarray([[0, 0, 0, 0, 0, 0, 0, 0]])  # all pad
    h1 = m._hidden_states(params, s1)[:, -1]
    h2 = m._hidden_states(params, s2)[:, -1]
    assert float(jnp.abs(h2).max()) == 0.0  # all-pad → zero state
    # prefix positions before content keep zero state
    hs = m._hidden_states(params, s1)
    assert float(jnp.abs(hs[:, :5]).max()) == 0.0
    assert float(jnp.abs(h1).max()) > 0


def test_caser_windows():
    data = seq_data()
    m = MODELS["caser"](data)
    dev = m.extra_device_data(data)
    ws, wu, wp = (np.asarray(dev["win_seq"]), np.asarray(dev["win_user"]),
                  np.asarray(dev["win_pos"]))
    assert ws.shape[1] == 5 and wp.shape[1] == 3
    # each window is a contiguous slice of the user's history
    for j in range(0, len(ws), max(len(ws) // 20, 1)):
        u = wu[j]
        n = int(data.hist_len[u])
        h = data.hist[u, data.hist.shape[1] - n:]
        sub = ws[j].tolist()
        s = "".join(f"|{x}" for x in h.tolist())
        assert "".join(f"|{x}" for x in sub) in s


def test_gru4rec_streaming_state_matches_scan():
    import jax.numpy as jnp
    data = seq_data()
    m = MODELS["gru4rec"](data)
    params = m.init_params(jax.random.PRNGKey(0))
    seq = jnp.asarray([[0, 0, 0, 3, 4, 5, 6, 7]])
    hs = m._hidden_states(params, seq)
    state = m.init_state(1)
    for t in range(8):
        state, scores = m.step_state(params, state, seq[:, t])
    np.testing.assert_allclose(np.asarray(state), np.asarray(hs[:, -1]),
                               rtol=1e-5, atol=1e-6)
    # session reset zeroes the state
    state, _ = m.step_state(params, state, jnp.asarray([3]),
                            reset_mask=jnp.asarray([True]))
    fresh, _ = m.step_state(params, m.init_state(1), jnp.asarray([3]))
    np.testing.assert_allclose(np.asarray(state), np.asarray(fresh), rtol=1e-6)
