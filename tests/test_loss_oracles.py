"""Golden tests: each model family's loss against a tiny numpy oracle of the
reference formula (SURVEY.md §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np

from acf_tpu.models.caser import Caser
from acf_tpu.models.gru4rec import GRU4Rec
from acf_tpu.models.sasrec import SASRec
from acf_tpu.nn.layers import init_layer_norm, layer_norm
from acf_tpu.nn.rnn import gru_cell, init_gru
from tests.test_sasrec import seq_data


def softplus(x):
    return np.logaddexp(0.0, x)


def test_layer_norm_reference_formula():
    # reference normalize (SASRecLayers.py:39-43): eps INSIDE the sqrt
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 5, 8)).astype(np.float32)
    p = init_layer_norm(8)
    got = np.asarray(layer_norm(p, jnp.asarray(x)))
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    want = (x - mean) / np.sqrt(var + 1e-8)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gru_cell_tf_semantics():
    # TF GRUCell: gates σ(W_g·[x,h]+1), candidate tanh(W_c·[x, r*h])
    rng = np.random.default_rng(1)
    p = init_gru(jax.random.PRNGKey(0), 4, 4)
    x = rng.standard_normal((2, 4)).astype(np.float32)
    h = rng.standard_normal((2, 4)).astype(np.float32)
    got = np.asarray(gru_cell(p, jnp.asarray(x), jnp.asarray(h)))
    wg, bg = np.asarray(p["w_gates"]), np.asarray(p["b_gates"])
    wc, bc = np.asarray(p["w_cand"]), np.asarray(p["b_cand"])
    gates = 1 / (1 + np.exp(-(np.concatenate([x, h], -1) @ wg + bg)))
    r, u = gates[:, :4], gates[:, 4:]
    c = np.tanh(np.concatenate([x, r * h], -1) @ wc + bc)
    want = u * h + (1 - u) * c
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sasrec_loss_formula():
    data = seq_data()
    m = SASRec(data.num_users, data.num_items, 8, maxlen=6, dropout_rate=0.0,
               train_dtype="float32")  # numpy oracle is exact f32
    params = m.init_params(jax.random.PRNGKey(0))
    seq = jnp.asarray([[0, 0, 1, 2, 3, 4], [0, 0, 0, 0, 5, 6]])
    pos = jnp.asarray([[0, 1, 2, 3, 4, 5], [0, 0, 0, 5, 6, 7]])
    neg = jnp.asarray([[0, 9, 9, 9, 9, 9], [0, 0, 0, 8, 8, 8]])
    users = jnp.asarray([1, 2])
    loss, aux = m.loss(params, (users, seq, pos, neg), jax.random.PRNGKey(1))
    # oracle (SASRec.py:183-191) from the same encoder outputs
    reprs = np.asarray(m.encode(params, seq, train=False))
    E = np.asarray(params["item_emb"])
    pl = (E[np.asarray(pos)] * reprs).sum(-1)
    nl = (E[np.asarray(neg)] * reprs).sum(-1)
    ist = (np.asarray(pos) != 0).astype(float)
    want = ((softplus(-pl) * ist).sum() + (softplus(nl) * ist).sum()) / ist.sum()
    np.testing.assert_allclose(float(loss), want, rtol=1e-4)


def test_gru4rec_bpr_inbatch_oracle():
    data = seq_data()
    m = GRU4Rec(data.num_users, data.num_items, 8, maxlen=4)
    params = m.init_params(jax.random.PRNGKey(0))
    seq = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]])
    pos = jnp.asarray([[2, 3, 4, 5], [6, 7, 8, 9]])
    users = jnp.asarray([1, 2])
    loss, _ = m.loss(params, (users, seq, pos, pos), jax.random.PRNGKey(1))
    hs = np.asarray(m._hidden_states(params, seq))  # [2, 4, 8]
    W, b = np.asarray(params["W"]), np.asarray(params["b"])
    total, cnt = 0.0, 0
    for t in range(4):
        wt = W[np.asarray(pos)[:, t]]  # [2, 8]
        bt = b[np.asarray(pos)[:, t]]
        yhat = hs[:, t] @ wt.T + bt[None, :]
        for i in range(2):
            for j in range(2):
                total += -np.log(1 / (1 + np.exp(-(yhat[i, i] - yhat[i, j]))) + 1e-24)
                cnt += 1
    np.testing.assert_allclose(float(loss), total / cnt, rtol=1e-4)


def test_caser_loss_formula():
    data = seq_data()
    m = Caser(data.num_users, data.num_items, 8, maxlen=4, n_h=2, n_v=2,
              dropout_rate=0.0)
    params = m.init_params(jax.random.PRNGKey(0))
    users = jnp.asarray([1, 2])
    seq = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]])
    pos = jnp.asarray([[2, 3, 4], [6, 7, 8]])
    neg = jnp.asarray([[9, 9, 9], [8, 8, 8]])
    loss, _ = m.loss(params, (users, seq, pos, neg), jax.random.PRNGKey(1))
    x = np.asarray(m._user_repr(params, seq, users, train=False))
    W2, b2 = np.asarray(params["W2"]), np.asarray(params["b2"])
    ps = np.einsum("bd,bmd->bm", x, W2[np.asarray(pos)]) + b2[np.asarray(pos)]
    ns = np.einsum("bd,bmd->bm", x, W2[np.asarray(neg)]) + b2[np.asarray(neg)]
    want = softplus(-ps).mean() + softplus(ns).mean()
    np.testing.assert_allclose(float(loss), want, rtol=1e-4)
