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


def test_gru4rec_windowed_scan_matches_session_parallel_schedule():
    """Recurrence-equivalence oracle (VERDICT r1 #8): replay the reference's
    session-parallel minibatching schedule (GRU4Rec.py:240-277 — B lanes,
    ``minlen-1`` inner steps per chunk, exhausted lanes replaced by the next
    session with their state rows reset) in numpy, driving the SAME gru_cell,
    and assert the windowed-scan hidden states equal the schedule's state at
    every overlapping (session, step). Sessions have unequal lengths and
    lanes run multiple sessions back-to-back, so both the minlen chunking
    and the reset-on-handoff ≙ pad-freeze claim are exercised."""
    import jax.numpy as jnp

    from acf_tpu.nn.rnn import gru_cell

    data = seq_data()
    m = MODELS["gru4rec"](data)
    params = m.init_params(jax.random.PRNGKey(7))

    # five sessions, lengths 5,3,4,2,6 (item ids arbitrary nonzero)
    sessions = [np.array(s, dtype=np.int32) for s in
                ([3, 4, 5, 6, 7], [8, 2, 9], [5, 3, 8, 2], [7, 6],
                 [2, 5, 7, 3, 9, 4])]
    offsets = np.zeros(len(sessions) + 1, dtype=np.int64)
    offsets[1:] = np.cumsum([len(s) for s in sessions])
    flat = np.concatenate(sessions)

    # --- the reference schedule, verbatim semantics -------------------
    B = 2
    state = jnp.zeros((B, m.dim))
    iters = np.arange(B)
    maxiter = iters.max()
    start = offsets[iters].copy()
    end = offsets[iters + 1].copy()
    consumed = np.zeros(B, dtype=np.int64)  # inputs consumed in the lane's
    recorded = {}                           # (session, step) -> state row
    finished = False
    while not finished:
        minlen = int((end - start).min())
        for i in range(minlen - 1):
            in_idx = flat[start + i]                       # [B] inputs
            new = gru_cell(params["gru"], params["emb"][jnp.asarray(in_idx)],
                           state)
            state = new                                    # full-batch step
            for lane in range(B):
                recorded[(int(iters[lane]), int(consumed[lane]))] = \
                    np.asarray(state[lane]).copy()
            consumed += 1
        start = start + minlen - 1
        mask = np.arange(B)[(end - start) <= 1]
        for idx in mask:
            maxiter += 1
            if maxiter >= len(offsets) - 1:
                finished = True
                break
            iters[idx] = maxiter
            start[idx] = offsets[maxiter]
            end[idx] = offsets[maxiter + 1]
            consumed[idx] = 0
        if len(mask):  # reset_after_session=True
            state = state.at[jnp.asarray(mask)].set(0.0)

    assert len({s for s, _ in recorded}) >= 4  # lanes really advanced

    # --- the windowed scan over right-aligned session inputs ----------
    T = max(len(s) for s in sessions) - 1  # inputs = session minus target
    win = np.zeros((len(sessions), T), dtype=np.int32)
    for j, s in enumerate(sessions):
        win[j, T - (len(s) - 1):] = s[:-1]
    hs = np.asarray(m._hidden_states(params, jnp.asarray(win)))

    checked = 0
    for (sess, step), want in recorded.items():
        L = len(sessions[sess]) - 1
        got = hs[sess, T - L + step]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=f"session {sess} step {step}")
        checked += 1
    assert checked >= 10


def test_session_stream_serving_matches_score_all():
    """SessionStream (ops/topk.py — the serving surface for the reference's
    stateful predict_next_batch, GRU4Rec.py:285-327): pushing a session
    event-by-event must produce the same top-k as scoring the full
    history in one shot; 0-events leave slots untouched; reset_mask starts
    a session over."""
    import jax.numpy as jnp

    from acf_tpu.ops.topk import SessionStream

    data = seq_data()
    m = MODELS["gru4rec"](data)
    params = m.init_params(jax.random.PRNGKey(0))

    seq = np.array([[3, 4, 5, 6], [7, 8, 0, 9]], dtype=np.int32)
    stream = SessionStream(m, params, batch_size=2, k=5)
    for t in range(seq.shape[1]):
        scores, items = stream.push(seq[:, t])

    # oracle: full-history one-shot scores, pad col masked, top-5
    hists = jnp.asarray(np.array([[3, 4, 5, 6], [0, 7, 8, 9]],
                                 dtype=np.int32))
    full = m.score_all(params, jnp.asarray([1, 2]), hists)
    full = full.at[:, 0].set(-3.0e38)
    ws, wi = jax.lax.top_k(full, 5)
    np.testing.assert_array_equal(items, np.asarray(wi))
    np.testing.assert_allclose(scores, np.asarray(ws), rtol=1e-5, atol=1e-6)

    # reset slot 0 only → its next push equals a fresh session's
    s_reset, i_reset = stream.push(np.array([3, 0], dtype=np.int32),
                                   reset_mask=np.array([True, False]))
    fresh = SessionStream(m, params, batch_size=1, k=5)
    s_fresh, i_fresh = fresh.push(np.array([3], dtype=np.int32))
    np.testing.assert_array_equal(i_reset[0], i_fresh[0])
    np.testing.assert_allclose(s_reset[0], s_fresh[0], rtol=1e-6)
    # slot 1 had no event and no reset → unchanged prediction
    np.testing.assert_array_equal(i_reset[1], items[1])


def test_session_stream_rejects_stateless_models():
    from acf_tpu.models.mf import MFBPR
    from acf_tpu.ops.topk import SessionStream

    m = MFBPR(10, 10, 4)
    with pytest.raises(ValueError, match="step_state"):
        SessionStream(m, m.init_params(jax.random.PRNGKey(0)), 2)
