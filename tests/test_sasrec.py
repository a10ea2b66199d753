import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from acf_tpu.data import interactions_from_frame
from acf_tpu.models.sasrec import SASRec
from acf_tpu.train import Trainer, TrainConfig


def seq_data(num_users=40, num_items=25, seed=0):
    """Markov-chain-ish sequences: item i tends to be followed by i+1."""
    rng = np.random.default_rng(seed)
    rows, t = [], 0
    for u in range(1, num_users):
        i = int(rng.integers(1, num_items))
        for _ in range(12):
            rows.append((u, i, t)); t += 1
            i = i + 1 if i + 1 < num_items and rng.random() < 0.8 \
                else int(rng.integers(1, num_items))
    return interactions_from_frame(
        pd.DataFrame(rows, columns=["uid", "iid", "timestamp"]), reindex=False)


def make_model(data, **kw):
    return SASRec(data.num_users, data.num_items, dim=16, maxlen=8,
                  dropout_rate=0.2, **kw)


def test_encode_shapes_and_padding_invariance():
    data = seq_data()
    m = make_model(data)
    params = m.init_params(jax.random.PRNGKey(0))
    seq = jnp.asarray([[0, 0, 0, 0, 1, 2, 3, 4], [0, 0, 0, 0, 0, 0, 0, 5]])
    out = m.encode(params, seq)
    assert out.shape == (2, 8, 16)
    # changing a PAD position's id from 0 stays 0 → but changing an item in
    # the *future* must not affect earlier positions (causality):
    seq2 = seq.at[0, 7].set(9)
    out2 = m.encode(params, seq2)
    np.testing.assert_allclose(np.asarray(out[0, :7]), np.asarray(out2[0, :7]),
                               atol=1e-5)


def test_pad_row_is_zero():
    data = seq_data()
    m = make_model(data)
    params = m.init_params(jax.random.PRNGKey(0))
    assert float(jnp.abs(params["item_emb"][0]).max()) == 0.0


def test_loss_finite_and_deltas():
    data = seq_data()
    m = make_model(data, adversarial=True, eps=0.5)
    params = m.init_params(jax.random.PRNGKey(0))
    seq = jnp.asarray([[0, 0, 0, 0, 1, 2, 3, 4]])
    pos = jnp.asarray([[0, 0, 0, 1, 2, 3, 4, 5]])
    neg = jnp.asarray([[0, 0, 0, 9, 9, 9, 9, 9]])
    users = jnp.asarray([1])
    loss, aux = m.loss(params, (users, seq, pos, neg), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert float(aux["loss_adv"]) >= float(aux["loss"]) - 1e-3
    # delta rows are eps-normalized or zero
    delta = m._delta_tree(params, seq, pos, neg)
    norms = np.linalg.norm(np.asarray(delta["item_emb"]), axis=1)
    nz = norms[norms > 1e-9]
    np.testing.assert_allclose(nz, 0.5, rtol=1e-4)
    # only items appearing in the batch loss get a delta
    touched = set(np.asarray(seq).ravel()) | set(np.asarray(pos).ravel()) | \
        set(np.asarray(neg).ravel())
    for i in range(data.num_items):
        if i not in touched:
            assert norms[i] < 1e-9
    # asasrec2 perturbs dense kernels too
    m2 = make_model(data, adversarial=True, adv_mode="asasrec2",
                    eps_dense=0.3, eps_conv=0.2)
    d2 = m2._delta_tree(params, seq, pos, neg)
    assert float(jnp.abs(d2["blocks"][0]["wq"]["w"]).max()) > 0
    assert float(jnp.abs(d2["blocks"][0]["conv1"]["w"]).max()) > 0
    loss2, aux2 = m2.loss(params, (users, seq, pos, neg), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss2))


def test_sasrec_training_improves():
    data = seq_data()
    m = make_model(data)
    opt = optax.adam(1e-2, b2=0.98)
    tr = Trainer(m, data, opt, TrainConfig(batch_size=16, verbose=10**9))
    before = tr.evaluate().at_k(10)
    for _ in range(30):
        stats = tr.run_epoch()
    after = tr.evaluate().at_k(10)
    # sequences are strongly next-item predictable → large gain expected
    assert after[1] > before[1] + 0.1, (before, after)


def test_score_all_matches_score_some():
    data = seq_data()
    m = make_model(data)
    params = m.init_params(jax.random.PRNGKey(0))
    users = jnp.asarray([1, 2])
    hists = jnp.asarray(data.hist[np.array([1, 2])])
    all_scores = np.asarray(m.score_all(params, users, hists))
    items = jnp.asarray([[3, 5, 7], [2, 4, 6]])
    some = np.asarray(m.score_some(params, users, hists, items))
    for b in range(2):
        np.testing.assert_allclose(some[b], all_scores[b, np.asarray(items)[b]],
                                   rtol=1e-4, atol=1e-5)


def test_multi_step_deltas_sasrec():
    """adv_steps>1: deltas stay in the per-leaf eps-ball, differ from the
    single step, and never touch zero-eps leaves; adv_steps=1 keeps the
    reference FGSM exactly (covered by test_loss_finite_and_deltas)."""
    data = seq_data()
    m1 = make_model(data, adversarial=True, eps=0.5)
    m3 = make_model(data, adversarial=True, eps=0.5, adv_steps=3)
    params = m1.init_params(jax.random.PRNGKey(0))
    seq = jnp.asarray([[0, 0, 0, 0, 1, 2, 3, 4]])
    pos = jnp.asarray([[0, 0, 0, 1, 2, 3, 4, 5]])
    neg = jnp.asarray([[0, 0, 0, 9, 9, 9, 9, 9]])
    d1 = m1._delta_tree(params, seq, pos, neg)
    d3 = m3._delta_tree(params, seq, pos, neg)
    n3 = np.linalg.norm(np.asarray(d3["item_emb"]), axis=1)
    assert n3.max() <= 0.5 + 1e-5 and n3.max() > 0.1
    assert not np.allclose(np.asarray(d1["item_emb"]),
                           np.asarray(d3["item_emb"]))
    # zero-eps leaves (asasrec perturbs the item table only) stay zero
    assert float(jnp.abs(d3["pos_emb"]).max()) == 0.0
    assert float(jnp.abs(d3["blocks"][0]["wq"]["w"]).max()) == 0.0
    loss, aux = m3.loss(params, (jnp.asarray([1]), seq, pos, neg),
                        jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)) and np.isfinite(float(aux["loss_adv"]))


def test_row_space_adv_path_matches_table_path():
    """The asasrec hot path (gather + last-axis normalize, no dense delta
    table / full-table add) must equal the table-space formulation exactly —
    loss AND parameter gradients — including items that appear in both the
    encoder window and the pos/neg targets."""
    data = seq_data()
    m = make_model(data, adversarial=True, eps=0.5)
    params = m.init_params(jax.random.PRNGKey(0))
    seq = jnp.asarray([[0, 0, 0, 0, 1, 2, 3, 4], [0, 0, 0, 0, 2, 2, 5, 4]])
    pos = jnp.asarray([[0, 0, 0, 1, 2, 3, 4, 5], [0, 0, 0, 2, 2, 5, 4, 1]])
    neg = jnp.asarray([[0, 0, 0, 9, 9, 9, 9, 2], [0, 0, 0, 7, 9, 2, 8, 9]])
    users = jnp.asarray([1, 2])
    batch = (users, seq, pos, neg)
    key = jax.random.PRNGKey(1)

    def table_path(prm, batch, key):
        users, sq, ps, ng = batch
        k_enc, _ = jax.random.split(key)
        reprs = m.encode(prm, sq, train=True, key=k_enc,
                         dtype=m._compute_dtype())
        loss, _ = m._pointwise_loss(reprs, prm["item_emb"], ps, ng)
        delta = m._delta_tree(prm, sq, ps, ng)
        emb_plus = prm["item_emb"] + delta["item_emb"]
        adv_loss, _ = m._pointwise_loss(reprs, emb_plus, ps, ng)
        return loss + m.reg_adv * adv_loss

    (l_hot, aux), g_hot = jax.value_and_grad(m.loss, has_aux=True)(
        params, batch, key)
    l_tab, g_tab = jax.value_and_grad(table_path)(params, batch, key)

    np.testing.assert_allclose(l_hot, l_tab, rtol=1e-6)
    flat_h, _ = jax.tree.flatten(g_hot)
    flat_t, _ = jax.tree.flatten(g_tab)
    for a, b in zip(flat_h, flat_t):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-7)


def test_loss_window_matches_loss():
    """The packed-window loss (one 2T+1-row gather sharing the seq/pos
    overlap) must equal the generic 3-gather loss — value AND grads — for
    clean and adversarial (FGSM hot path) models, since it only
    reassociates the backward scatter's sums."""
    data = seq_data()
    for kw in ({}, {"adversarial": True, "eps": 0.5}):
        m = make_model(data, train_dtype="float32", **kw)
        params = m.init_params(jax.random.PRNGKey(0))
        rng = np.random.default_rng(7)
        window = jnp.asarray(rng.integers(1, data.num_items, (4, 9)),
                             jnp.int32)
        window = window.at[0, :5].set(0)  # padded prefix
        neg = jnp.asarray(rng.integers(1, data.num_items, (4, 8)), jnp.int32)
        neg = jnp.where(window[:, 1:] != 0, neg, 0)
        users = jnp.arange(1, 5, dtype=jnp.int32)
        key = jax.random.PRNGKey(3)
        (lw, auxw), gw = jax.value_and_grad(m.loss_window, has_aux=True)(
            params, (users, window, neg), key)
        (le, auxe), ge = jax.value_and_grad(m.loss, has_aux=True)(
            params, (users, window[:, :-1], window[:, 1:], neg), key)
        np.testing.assert_allclose(float(lw), float(le), rtol=1e-6)
        if "loss_adv" in auxe:
            np.testing.assert_allclose(float(auxw["loss_adv"]),
                                       float(auxe["loss_adv"]), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(gw), jax.tree.leaves(ge)):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-7)
    # asasrec2 / PGD delegate to the generic expansion — still exact
    m2 = make_model(data, adversarial=True, adv_mode="asasrec2",
                    eps_dense=0.3, train_dtype="float32")
    l2w, _ = m2.loss_window(params, (users, window, neg),
                            jax.random.PRNGKey(3))
    l2e, _ = m2.loss(params, (users, window[:, :-1], window[:, 1:], neg),
                     jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(l2w), float(l2e), rtol=1e-6)


def test_packed_attention_matches_unpacked():
    """pack_attention packs ⌊128/T⌋ users into one block-diagonal MXU tile.
    In f32 the result is bitwise-equal to the unpacked path (off-block
    logits are -2³²: exp underflows to exactly 0), so encode AND loss grads
    must match the unpacked model to float tolerance; dropout draws differ
    by design (packed mask shape), so compare with dropout off."""
    U, I, d, t = 30, 40, 16, 32  # pack=4 at t=32
    mp = SASRec(U, I, d, maxlen=t, dropout_rate=0.0, train_dtype="float32",
                pack_attention="always")
    mu = SASRec(U, I, d, maxlen=t, dropout_rate=0.0, train_dtype="float32",
                pack_attention="never")
    assert mp._pack(8, t) == 4 and mu._pack(8, t) == 1
    # non-divisible batch sizes fall back gracefully
    assert mp._pack(7, t) == 1  # 7 divides by neither 4, 3 nor 2
    assert mp._pack(6, t) == 3  # largest p <= 128//t with b % p == 0
    params = mp.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    seq = jnp.asarray(rng.integers(0, I, (8, t)), jnp.int32)
    seq = seq.at[0, :20].set(0)  # padded prefix exercises the key mask
    rp = mp.encode(params, seq)
    ru = mu.encode(params, seq)
    np.testing.assert_allclose(np.asarray(rp), np.asarray(ru),
                               rtol=1e-6, atol=1e-6)
    pos = jnp.asarray(rng.integers(1, I, (8, t)), jnp.int32)
    neg = jnp.asarray(rng.integers(1, I, (8, t)), jnp.int32)
    batch = (jnp.arange(1, 9, dtype=jnp.int32), seq, pos, neg)
    key = jax.random.PRNGKey(1)
    (lp, _), gp = jax.value_and_grad(mp.loss, has_aux=True)(params, batch, key)
    (lu, _), gu = jax.value_and_grad(mu.loss, has_aux=True)(params, batch, key)
    np.testing.assert_allclose(float(lp), float(lu), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gu)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    # with dropout the packed path still trains (finite loss/grads)
    mpd = SASRec(U, I, d, maxlen=t, dropout_rate=0.5, adversarial=True,
                 eps=0.5, pack_attention="always")
    (ld, _), gd = jax.value_and_grad(mpd.loss, has_aux=True)(
        params, batch, key)
    assert np.isfinite(float(ld))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(gd))


def test_packed_attention_matches_unpacked_t8():
    """The T=8 parity geometry packs 16 users per 128-wide tile (round 3
    relaxed the t>=32 gate); encode + loss grads must match the unpacked
    path to float tolerance, including padded prefixes."""
    U, I, d, t = 30, 40, 16, 8
    mp = SASRec(U, I, d, maxlen=t, dropout_rate=0.0, train_dtype="float32",
                pack_attention="always")
    mu = SASRec(U, I, d, maxlen=t, dropout_rate=0.0, train_dtype="float32",
                pack_attention="never")
    assert mp._pack(32, t) == 16
    params = mp.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(6)
    seq = jnp.asarray(rng.integers(0, I, (32, t)), jnp.int32)
    seq = seq.at[0, :5].set(0).at[3, :].set(0)  # padded prefix + empty row
    np.testing.assert_allclose(np.asarray(mp.encode(params, seq)),
                               np.asarray(mu.encode(params, seq)),
                               rtol=1e-6, atol=1e-6)
    pos = jnp.asarray(rng.integers(1, I, (32, t)), jnp.int32)
    neg = jnp.asarray(rng.integers(1, I, (32, t)), jnp.int32)
    batch = (jnp.arange(1, 33, dtype=jnp.int32), seq, pos, neg)
    key = jax.random.PRNGKey(1)
    (lp, _), gp = jax.value_and_grad(mp.loss, has_aux=True)(params, batch, key)
    (lu, _), gu = jax.value_and_grad(mu.loss, has_aux=True)(params, batch, key)
    np.testing.assert_allclose(float(lp), float(lu), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gu)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    # the adversarial (FGSM) objective matches too — the packed encoder
    # sits inside the linearization point
    ap = SASRec(U, I, d, maxlen=t, dropout_rate=0.0, adversarial=True,
                eps=0.5, reg_adv=1.0, pack_attention="always")
    au = SASRec(U, I, d, maxlen=t, dropout_rate=0.0, adversarial=True,
                eps=0.5, reg_adv=1.0, pack_attention="never")
    (la, _), ga = jax.value_and_grad(ap.loss, has_aux=True)(params, batch, key)
    (lb, _), gb = jax.value_and_grad(au.loss, has_aux=True)(params, batch, key)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_bf16_train_path_close_to_f32_and_eval_unaffected():
    """train_dtype="bfloat16" (opt-in; f32 is the default — bf16 measured
    quality-negative for ASASRec, see the field docstring) runs the
    TRAIN-path encoder in bf16: the loss must stay close to the f32 path
    and its grads finite, while the EVAL path (encode/score_all — ranking
    precision rules) is bit-identical regardless of train_dtype."""
    data = seq_data()
    m16 = make_model(data, adversarial=True, eps=0.5,
                     train_dtype="bfloat16")
    mf = make_model(data, adversarial=True, eps=0.5, train_dtype="float32")
    assert make_model(data)._compute_dtype() is None  # f32 default
    assert m16._compute_dtype() == jnp.bfloat16
    assert mf._compute_dtype() is None
    params = m16.init_params(jax.random.PRNGKey(0))
    seq = jnp.asarray([[0, 0, 0, 0, 1, 2, 3, 4], [0, 0, 0, 0, 2, 2, 5, 4]])
    pos = jnp.asarray([[0, 0, 0, 1, 2, 3, 4, 5], [0, 0, 0, 2, 2, 5, 4, 1]])
    neg = jnp.asarray([[0, 0, 0, 9, 9, 9, 9, 2], [0, 0, 0, 7, 9, 2, 8, 9]])
    batch = (jnp.asarray([1, 2]), seq, pos, neg)
    key = jax.random.PRNGKey(1)
    (l16, _), g16 = jax.value_and_grad(m16.loss, has_aux=True)(
        params, batch, key)
    (lf, _), _ = jax.value_and_grad(mf.loss, has_aux=True)(
        params, batch, key)
    # reprs f32 out of the final LN; bf16 rounding inside the 1-block-deep
    # encoder stays within ~1% of the f32 loss
    np.testing.assert_allclose(float(l16), float(lf), rtol=2e-2)
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(g16))
    # grads land in the params' dtype (f32), not bf16
    assert all(g.dtype == jnp.float32 for g in jax.tree.leaves(g16))
    # eval path ignores train_dtype entirely
    hists = jnp.asarray(data.hist[np.array([1, 2])])
    users = jnp.asarray([1, 2])
    s16 = m16.score_all(params, users, hists)
    sf = mf.score_all(params, users, hists)
    np.testing.assert_array_equal(np.asarray(s16), np.asarray(sf))
