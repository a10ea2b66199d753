import math

import numpy as np

from acf_tpu.eval.metrics import metrics_from_position


def reference_metrics(position, num_neg, K):
    """Literal port of the reference metric loop (evaluation_adv.py:477-480)
    as a test oracle."""
    hr, ndcg, auc = [], [], []
    for k in range(1, K + 1):
        hr.append(position < k)
        ndcg.append(math.log(2) / math.log(position + 2) if position < k else 0)
        auc.append(1 - (position / num_neg))
    return hr, ndcg, auc


def test_matches_reference_oracle():
    rng = np.random.default_rng(0)
    positions = rng.integers(0, 120, size=50)
    num_negs = rng.integers(120, 5000, size=50)
    hr, ndcg, auc = metrics_from_position(positions, num_negs, K=100)
    hr, ndcg, auc = np.asarray(hr), np.asarray(ndcg), np.asarray(auc)
    for u in range(50):
        ohr, ondcg, oauc = reference_metrics(int(positions[u]), int(num_negs[u]), 100)
        np.testing.assert_allclose(hr[u], np.array(ohr, dtype=float), atol=1e-6)
        np.testing.assert_allclose(ndcg[u], ondcg, rtol=1e-5)
        np.testing.assert_allclose(auc[u], oauc[0], rtol=1e-5)


def test_edge_positions():
    hr, ndcg, auc = metrics_from_position(np.array([0]), np.array([10]), K=3)
    np.testing.assert_allclose(np.asarray(hr)[0], [1, 1, 1])
    np.testing.assert_allclose(np.asarray(ndcg)[0], [1, 1, 1], rtol=1e-6)
    assert float(np.asarray(auc)[0]) == 1.0
