import jax
import jax.numpy as jnp
import numpy as np

from acf_tpu.sampling import uniform_negatives, sample_pair_epoch, sample_seq_batch


def test_uniform_negatives_avoid_train_items():
    num_items = 50
    rng = np.random.default_rng(1)
    # dense histories → high collision pressure
    hist = np.zeros((64, 30), dtype=np.int32)
    for b in range(64):
        items = rng.choice(np.arange(1, num_items), size=30, replace=False)
        hist[b] = items
    # 30/49 items are train → ~61% collision per draw; 64 rounds makes the
    # all-collide residual ~1e-14 so the test is deterministic.
    negs = np.asarray(uniform_negatives(
        jax.random.PRNGKey(0), jnp.asarray(hist), num_items, rounds=64))
    for b in range(64):
        assert negs[b] not in set(hist[b]), b
        assert 1 <= negs[b] < num_items


def test_pair_epoch_is_permutation():
    batches = np.asarray(sample_pair_epoch(jax.random.PRNGKey(0), 100, 16, 6))
    assert batches.shape == (6, 16)
    flat = batches.ravel()
    assert len(set(flat.tolist())) == 96  # all distinct (drop-remainder shuffle)
    assert flat.max() < 100


def test_seq_batch_windows():
    # user 1 has seq [3,4,5,6]; user 2 has [7,8]
    hist = np.zeros((3, 6), dtype=np.int32)
    hist[1, -4:] = [3, 4, 5, 6]
    hist[2, -2:] = [7, 8]
    hist_len = np.array([0, 4, 2], dtype=np.int32)
    eligible = np.array([1, 2], dtype=np.int32)
    users, seq, pos, neg = sample_seq_batch(
        jax.random.PRNGKey(3), jnp.asarray(hist),
        jnp.asarray(eligible), maxlen=3, num_items=20, batch_size=32)
    users, seq, pos, neg = map(np.asarray, (users, seq, pos, neg))
    for b in range(32):
        u = users[b]
        if u == 1:
            # window over last maxlen+1=4 items [3,4,5,6]
            np.testing.assert_array_equal(seq[b], [3, 4, 5])
            np.testing.assert_array_equal(pos[b], [4, 5, 6])
        else:
            np.testing.assert_array_equal(seq[b], [0, 0, 7])
            np.testing.assert_array_equal(pos[b], [0, 7, 8])
        train = set(hist[u]) - {0}
        for t in range(3):
            if pos[b, t] != 0:
                assert neg[b, t] not in train
                assert neg[b, t] >= 1
            else:
                assert neg[b, t] == 0


def test_seq_window_batch_is_slice_of_seq_batch():
    """sample_seq_window_batch packs (window, neg); sample_seq_batch must be
    exactly its (window[:-1], window[1:]) slices under the same key — the
    trainer's loss_window path and the generic loss path see the same data."""
    from acf_tpu.sampling import sample_seq_window_batch

    hist = np.zeros((3, 8), dtype=np.int32)
    hist[1, 2:] = [3, 4, 5, 6, 7, 9]
    hist[2, 6:] = [7, 8]
    eligible = np.array([1, 2], dtype=np.int32)
    key = jax.random.PRNGKey(11)
    u1, w, n1 = sample_seq_window_batch(
        key, jnp.asarray(hist), jnp.asarray(eligible),
        maxlen=3, num_items=20, batch_size=16)
    u2, s, p, n2 = sample_seq_batch(
        key, jnp.asarray(hist), jnp.asarray(eligible),
        maxlen=3, num_items=20, batch_size=16)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    np.testing.assert_array_equal(np.asarray(w[:, :-1]), np.asarray(s))
    np.testing.assert_array_equal(np.asarray(w[:, 1:]), np.asarray(p))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    assert w.shape == (16, 4)
