"""Reference-checkpoint migration loaders (TF1 Saver / Keras h5)."""

import numpy as np
import pytest


def test_keras_h5_embeddings(tmp_path):
    h5py = pytest.importorskip("h5py")
    P = np.random.default_rng(0).standard_normal((10, 4)).astype(np.float32)
    Q = np.random.default_rng(1).standard_normal((12, 4)).astype(np.float32)
    path = str(tmp_path / "model.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("model_weights")
        g.create_group("uEmb").create_group("uEmb").create_dataset(
            "embeddings:0", data=P)
        g.create_group("iEmb").create_group("iEmb").create_dataset(
            "embeddings:0", data=Q)
    from acf_tpu.compat import load_keras_h5_embeddings
    out = load_keras_h5_embeddings(path)
    np.testing.assert_allclose(out["P"], P)
    np.testing.assert_allclose(out["Q"], Q)


def test_tf_saver_checkpoint(tmp_path):
    tf = pytest.importorskip("tensorflow")
    tf1 = tf.compat.v1
    P = np.random.default_rng(2).standard_normal((8, 4)).astype(np.float32)
    Q = np.random.default_rng(3).standard_normal((9, 4)).astype(np.float32)
    graph = tf1.Graph()
    with graph.as_default():
        vp = tf1.get_variable("embedding_P", initializer=P)
        vq = tf1.get_variable("embedding_Q", initializer=Q)
        saver = tf1.train.Saver({"embedding_P": vp, "embedding_Q": vq})
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, str(tmp_path / "weights"), global_step=5)
    from acf_tpu.compat import load_tf_embeddings
    out = load_tf_embeddings(str(tmp_path))
    np.testing.assert_allclose(out["P"], P)
    np.testing.assert_allclose(out["Q"], Q)


def test_keras_h5_skips_optimizer_slots(tmp_path):
    """Full .h5 saves carry Adam slot tensors under optimizer_weights with
    the same layer names and shapes — they must not shadow the embeddings."""
    h5py = pytest.importorskip("h5py")
    P = np.random.default_rng(4).standard_normal((10, 4)).astype(np.float32)
    Q = np.random.default_rng(5).standard_normal((12, 4)).astype(np.float32)
    path = str(tmp_path / "full.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("model_weights")
        g.create_group("uEmb").create_group("uEmb").create_dataset(
            "embeddings:0", data=P)
        g.create_group("iEmb").create_group("iEmb").create_dataset(
            "embeddings:0", data=Q)
        o = f.create_group("optimizer_weights").create_group("Adam")
        o.create_group("uEmb").create_dataset("m:0", data=np.zeros_like(P))
        o.create_group("iEmb").create_dataset("v:0", data=np.zeros_like(Q))
    from acf_tpu.compat import load_keras_h5_embeddings
    out = load_keras_h5_embeddings(path)
    np.testing.assert_allclose(out["P"], P)
    np.testing.assert_allclose(out["Q"], Q)


def test_tf_saver_prefers_exact_name_over_slots(tmp_path):
    tf = pytest.importorskip("tensorflow")
    tf1 = tf.compat.v1
    P = np.random.default_rng(6).standard_normal((8, 4)).astype(np.float32)
    Q = np.random.default_rng(7).standard_normal((9, 4)).astype(np.float32)
    graph = tf1.Graph()
    with graph.as_default():
        vp = tf1.get_variable("embedding_P", initializer=P)
        vq = tf1.get_variable("embedding_Q", initializer=Q)
        slot_p = tf1.get_variable("embedding_P/Adagrad",
                                  initializer=np.zeros_like(P))
        saver = tf1.train.Saver({"embedding_P": vp, "embedding_Q": vq,
                                 "embedding_P/Adagrad": slot_p})
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, str(tmp_path / "weights"), global_step=1)
    from acf_tpu.compat import load_tf_embeddings
    out = load_tf_embeddings(str(tmp_path))
    np.testing.assert_allclose(out["P"], P)
    np.testing.assert_allclose(out["Q"], Q)
