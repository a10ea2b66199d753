"""Native C++ parser vs pandas/python oracles."""

import numpy as np
import pandas as pd
import pytest

from acf_tpu.data import native_io

pytestmark = pytest.mark.skipif(native_io.get_lib() is None,
                                reason="native toolchain unavailable")


def test_parse_two_col(tmp_path):
    p = tmp_path / "pairs.txt"
    p.write_text("1 10\n2 20\n2 21\n\n3 30\n")
    u, i = native_io.parse_two_col(str(p))
    np.testing.assert_array_equal(u, [1, 2, 2, 3])
    np.testing.assert_array_equal(i, [10, 20, 21, 30])


def test_parse_two_col_matches_pandas_on_video():
    path = "/root/reference/data/Video.txt"
    u, i = native_io.parse_two_col(path)
    df = pd.read_csv(path, sep=" ", names=["uid", "iid"])
    np.testing.assert_array_equal(u, df["uid"].to_numpy())
    np.testing.assert_array_equal(i, df["iid"].to_numpy())


def test_parse_rating_matches_pandas():
    path = "/root/reference/data/Video.train.rating"
    u, i, r, t = native_io.parse_rating(path)
    df = pd.read_csv(path, sep="\t", names=["uid", "iid", "rating", "timestamp"])
    np.testing.assert_array_equal(u, df["uid"].to_numpy())
    np.testing.assert_array_equal(i, df["iid"].to_numpy())
    np.testing.assert_allclose(r, df["rating"].to_numpy())
    np.testing.assert_array_equal(t, df["timestamp"].to_numpy())


def test_parse_rating_rejects_text_timestamps(tmp_path):
    p = tmp_path / "bad.rating"
    p.write_text("1\t2\t1\t2010-10-16 03:48:54\n" * 10)
    # date strings parse as a leading int (year) — the parser accepts the
    # numeric prefix; what matters is the loader still produces SOMETHING
    # sane or falls back. Here we just require no crash.
    native_io.parse_rating(str(p))


def test_caser_windows_matches_python():
    rng = np.random.default_rng(0)
    num_users, width = 12, 10
    hist = np.zeros((num_users, width), np.int32)
    hist_len = np.zeros(num_users, np.int32)
    for u in range(1, num_users):
        n = int(rng.integers(0, width + 1))
        hist_len[u] = n
        if n:
            hist[u, width - n:] = rng.integers(1, 50, size=n)
    L, T = 4, 3
    out = native_io.caser_windows(hist, hist_len, L, T)
    users, seqs, tgts = out

    # python oracle (reference Caser.py:67-91 semantics)
    o_users, o_seqs, o_tgts = [], [], []
    for u in range(1, num_users):
        n = int(hist_len[u])
        if n < L + 1:
            continue
        h = hist[u, width - n:]
        for s in range(n - L):
            o_users.append(u)
            o_seqs.append(h[s:s + L])
            t = h[s + L:s + L + T]
            if len(t) < T:
                t = np.r_[np.zeros(T - len(t), np.int32), t]
            o_tgts.append(t)
    np.testing.assert_array_equal(users, o_users)
    np.testing.assert_array_equal(seqs, np.array(o_seqs))
    np.testing.assert_array_equal(tgts, np.array(o_tgts))
