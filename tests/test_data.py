import os

import numpy as np
import pandas as pd

from acf_tpu.data import interactions_from_frame, load_dataset

REF_DATA = "/root/reference/data"


def tiny_frame():
    # user A: items 10,11,12,11 (test=11); user B: 12,10 (test=10)
    return pd.DataFrame({
        "uid": ["A", "A", "A", "A", "B", "B"],
        "iid": [10, 11, 12, 11, 12, 10],
        "timestamp": [1, 2, 3, 4, 1, 2],
    })


def test_leave_one_out_and_reindex():
    d = interactions_from_frame(tiny_frame())
    # ids recoded: users A->1, B->2; items 10->1, 11->2, 12->3
    assert d.num_users == 3 and d.num_items == 4
    # test items: A's last is 11->2; B's last is 10->1
    assert d.test_item[1] == 2 and d.test_item[2] == 1
    # A trains on [1,2,3] (chronological: 10,11,12), B on [3]
    assert d.hist_len[1] == 3 and d.hist_len[2] == 1
    np.testing.assert_array_equal(d.hist[1][-3:], [1, 2, 3])
    assert d.hist[2][-1] == 3
    # unique pairs: A has 3 distinct, B has 1
    assert d.uniq_count[1] == 3 and d.uniq_count[2] == 1
    assert d.num_pairs == 4
    # A's gt (item 2) IS in A's train; B's gt (1) is not
    assert d.gt_in_train[1] and not d.gt_in_train[2]


def test_num_eval_candidates():
    d = interactions_from_frame(tiny_frame())
    # rule (reference evaluation_adv.py:425-437):
    # A: items {0..3} - train{1,2,3} - {0} = {} ... gt in train so no extra
    #    removal -> 4 - 1 - 3 - 0 = 0
    # B: 4 - 1 - 1 - 1 = 1
    n = d.num_eval_candidates()
    assert n[1] == 0 and n[2] == 1


def test_hist_duplicates_kept():
    df = pd.DataFrame({
        "uid": [1, 1, 1, 1],
        "iid": [5, 5, 6, 7],
        "timestamp": [1, 2, 3, 4],
    })
    d = interactions_from_frame(df)
    # train seq = [5, 5, 6] with the duplicate kept; 2 unique pairs
    assert d.hist_len[1] == 3
    assert d.uniq_count[1] == 2


def test_max_hist_len_truncates_oldest():
    df = pd.DataFrame({
        "uid": [1] * 5,
        "iid": [11, 12, 13, 14, 15],
        "timestamp": range(5),
    })
    d = interactions_from_frame(df, max_hist_len=2)
    # train = [11..14]; only the 2 most recent kept
    np.testing.assert_array_equal(d.hist[1], [3, 4])


def test_sampled_negatives_reject_train_and_gt():
    rng = np.random.default_rng(0)
    rows = [(u, int(i), t) for t, (u, i) in enumerate(
        (u, rng.integers(1, 30)) for u in range(1, 8) for _ in range(6))]
    df = pd.DataFrame(rows, columns=["uid", "iid", "timestamp"])
    d = interactions_from_frame(df, reindex=False, num_negatives=16)
    for u in range(1, 8):
        train = set(d.hist[u]) - {0}
        for n in d.test_negatives[u]:
            assert n not in train
            assert n != d.test_item[u]
            assert n != 0


def test_sampled_negatives_exhausted_pool_terminates():
    # user's train set covers the whole candidate pool → zeros, no hang
    d = interactions_from_frame(tiny_frame(), num_negatives=4)
    assert d.test_negatives.shape == (3, 4)


def test_load_video_subset():
    d = load_dataset("video", REF_DATA, nrows=5000)
    assert d.num_users > 100 and d.num_items > 100
    assert d.num_pairs > 0
    users = d.eval_users()
    assert len(users) > 0
    # every eval user's gt is a valid item id
    assert (d.test_item[users] >= 1).all()
    assert (d.test_item[users] < d.num_items).all()


def test_presplit_rating_pair_and_negative_file(tmp_path):
    # build a tiny presplit dataset in OriginalDataset format (0-based ids)
    train = "\n".join(f"{u}\t{i}\t1\t{t}" for t, (u, i) in enumerate(
        [(0, 3), (0, 4), (0, 5), (1, 6), (1, 7), (2, 3), (2, 8)]))
    test = "0\t9\t1\t100\n1\t5\t1\t100\n2\t6\t1\t100\n"
    (tmp_path / "toy.train.rating").write_text(train + "\n")
    (tmp_path / "toy.test.rating").write_text(test)
    d = load_dataset("toy", str(tmp_path))
    # ids shifted +1: user 0 -> 1 etc.
    assert d.test_item[1] == 10 and d.test_item[2] == 6 and d.test_item[3] == 7
    np.testing.assert_array_equal(sorted(d.hist[1][d.hist[1] > 0]), [4, 5, 6])

    # with a .test.negative file the sampled negatives come from the file
    (tmp_path / "toy.test.negative").write_text(
        "(0,9)\t1\t2\n(1,5)\t3\t4\n(2,6)\t5\t7\n")
    d2 = load_dataset("toy", str(tmp_path), eval_mode="sample")
    np.testing.assert_array_equal(d2.test_negatives[1], [2, 3])
    np.testing.assert_array_equal(d2.test_negatives[2], [4, 5])
    np.testing.assert_array_equal(d2.test_negatives[3], [6, 8])


def test_video_pre_alias():
    d = load_dataset("Video-pre", REF_DATA, max_hist_len=50)
    # presplit Video files: 31k users, ids shifted by +1
    assert d.num_users > 30000
    assert d.num_pairs > 200000


def test_truncated_hist_eval_bookkeeping_consistent():
    """When max_hist_len truncates old interactions, num_eval_candidates
    must agree with the maskable set (hist), or AUC denominators go wrong
    (can even turn negative)."""
    import pandas as pd

    from acf_tpu.data import interactions_from_frame

    n = 40
    df = pd.DataFrame({
        "uid": np.ones(n, dtype=np.int64),
        "iid": np.arange(1, n + 1, dtype=np.int64),  # all distinct
        "timestamp": np.arange(n, dtype=np.int64),
    })
    d = interactions_from_frame(df, reindex=False, max_hist_len=8)
    # 39 train items, hist keeps last 8 distinct ones
    assert d.hist.shape[1] == 8
    assert d.uniq_count[1] == 8
    n_cand = d.num_eval_candidates()[1]
    # candidates = num_items-1 (pad) - 8 (maskable) - 1 (gt not in hist)
    assert n_cand == d.num_items - 1 - 8 - 1
    assert n_cand > 0
    # untruncated: reference semantics (all 39 train items subtracted)
    full = interactions_from_frame(df, reindex=False)
    assert full.uniq_count[1] == 39
    assert full.num_eval_candidates()[1] == full.num_items - 1 - 39 - 1


def test_negative_file_aligned_by_user_field(tmp_path):
    """Lines carrying a parseable "(u,gt)" head are assigned by USER, not
    file order — a shuffled file must still land on the right rows."""
    train = "\n".join(f"{u}\t{i}\t1\t{t}" for t, (u, i) in enumerate(
        [(0, 3), (0, 4), (1, 6), (1, 7), (2, 3), (2, 8)]))
    (tmp_path / "toy.train.rating").write_text(train + "\n")
    (tmp_path / "toy.test.rating").write_text(
        "0\t9\t1\t100\n1\t5\t1\t100\n2\t6\t1\t100\n")
    # shuffled order: users 2, 0, 1
    (tmp_path / "toy.test.negative").write_text(
        "(2,6)\t5\t7\n(0,9)\t1\t2\n(1,5)\t3\t4\n")
    d = load_dataset("toy", str(tmp_path), eval_mode="sample")
    np.testing.assert_array_equal(d.test_negatives[1], [2, 3])  # user 0 -> row 1
    np.testing.assert_array_equal(d.test_negatives[2], [4, 5])
    np.testing.assert_array_equal(d.test_negatives[3], [6, 8])


def test_negative_file_count_mismatch_raises(tmp_path):
    """Without user fields, a line-count mismatch must be an error, not a
    silent truncation that mis-assigns negatives."""
    import pytest

    train = "\n".join(f"{u}\t{i}\t1\t{t}" for t, (u, i) in enumerate(
        [(0, 3), (0, 4), (1, 6), (1, 7), (2, 3), (2, 8)]))
    (tmp_path / "toy.train.rating").write_text(train + "\n")
    (tmp_path / "toy.test.rating").write_text(
        "0\t9\t1\t100\n1\t5\t1\t100\n2\t6\t1\t100\n")
    (tmp_path / "toy.test.negative").write_text("x\t1\t2\nx\t3\t4\n")  # 2 != 3
    with pytest.raises(ValueError, match="negative lines"):
        load_dataset("toy", str(tmp_path), eval_mode="sample")


def test_item_count_keeps_duplicates():
    """item_count follows the raw df (reference NaiveBaselines.py:9
    groupby size) — duplicate visits count, unlike the unique-pair bincount."""
    import pandas as pd

    from acf_tpu.data import interactions_from_frame

    # user 1 visits item 2 three times, item 3 once; user 2 visits item 3 once
    df = pd.DataFrame({
        "uid": [1, 1, 1, 1, 1, 2, 2],
        "iid": [2, 2, 2, 3, 4, 3, 4],  # last per user held out
        "timestamp": range(7),
    })
    d = interactions_from_frame(df, reindex=False)
    assert d.item_count[2] == 3        # duplicates kept
    assert d.item_count[3] == 2        # u1 + u2
    # unique-pair bincount would say 1 for item 2's visits by u1
    assert np.bincount(d.pairs_i, minlength=d.num_items)[2] == 1


def test_most_popular_orders_by_raw_counts():
    import jax
    import pandas as pd

    from acf_tpu.data import interactions_from_frame
    from acf_tpu.models.naive import MostPopular

    # item 2: 3 visits from one user; item 3: 2 visits from two users
    df = pd.DataFrame({
        "uid": [1, 1, 1, 1, 1, 2, 2],
        "iid": [2, 2, 2, 3, 4, 3, 4],
        "timestamp": range(7),
    })
    d = interactions_from_frame(df, reindex=False)
    m = MostPopular(d.num_users, d.num_items, 4, data=d)
    params = m.init_params(jax.random.PRNGKey(0))
    counts = np.asarray(params["counts"])
    assert counts[2] > counts[3]  # raw counts; unique-pair counts would tie 1:2


def test_sort_dup_matches_reference_drop_duplicates(tmp_path):
    """-sort-dup must keep the exact row set of the reference's
    ``df.drop_duplicates(['uid','iid'])`` (process_data.py:27) — global
    first occurrence per pair, including NON-consecutive repeats (the
    round-1 implementation collapsed only consecutive ones)."""
    from acf_tpu.data.process import (
        collapse_consecutive_duplicates, drop_duplicate_pairs,
        write_rating_files,
    )

    # user 1: 5,7,5,7 — repeats are non-consecutive; user 2: 6,6,8
    df = pd.DataFrame({
        "uid": [1, 1, 1, 1, 2, 2, 2],
        "iid": [5, 7, 5, 7, 6, 6, 8],
        "timestamp": [10, 20, 30, 40, 1, 2, 3],
    })
    want = df.sort_values(["uid", "timestamp"]).drop_duplicates(
        ["uid", "iid"])  # the reference's own pandas rule as oracle
    got = drop_duplicate_pairs(df)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True))
    # rows (1,5,30) and (1,7,40) are dropped although non-consecutive
    assert got["timestamp"].tolist() == [10, 20, 1, 3]

    # the consecutive-only collapse is a DIFFERENT (opt-in) behavior:
    # it keeps the far-apart repeats and drops only the immediate 6,6
    cons = collapse_consecutive_duplicates(df)
    assert cons["timestamp"].tolist() == [10, 20, 30, 40, 1, 3]

    # end-to-end: dedup=True routes through the reference semantics
    write_rating_files(df, str(tmp_path), "toy", reindex=False, dedup=True)
    train = pd.read_csv(tmp_path / "toy.train.rating", sep="\t", header=None,
                        names=["uid", "iid", "rating", "timestamp"])
    test = pd.read_csv(tmp_path / "toy.test.rating", sep="\t", header=None,
                       names=["uid", "iid", "rating", "timestamp"])
    # leave-one-out applies AFTER dedup: user 1 keeps [5@10, 7@20] ->
    # train [5], test [7]; user 2 keeps [6@1, 8@3] -> train [6], test [8]
    assert train[["uid", "iid"]].values.tolist() == [[1, 5], [2, 6]]
    assert test[["uid", "iid"]].values.tolist() == [[1, 7], [2, 8]]


def test_negative_writer_roundtrip(tmp_path):
    """write_negative_file -> _load_negative_file round-trip (VERDICT r3
    #5): the writer emits the HeDataset format the presplit loader consumes,
    aligned by the (u,gt) head field, raw 0-based ids on disk, +1 shift on
    read, and no negative ever collides with the user's train items or the
    held-out item."""
    from acf_tpu.data.process import write_rating_files

    rng = np.random.default_rng(3)
    rows, t = [], 0
    for u in range(12):
        for i in rng.choice(np.arange(30), size=6, replace=False):
            rows.append((u, int(i), t))
            t += 1
    df = pd.DataFrame(rows, columns=["uid", "iid", "timestamp"])
    write_rating_files(df, str(tmp_path), "rt", reindex=False,
                       num_negatives=7, seed=11)
    d = load_dataset("rt", str(tmp_path), eval_mode="sample")
    assert d.test_negatives is not None
    assert d.test_negatives.shape[1] == 7

    lines = (tmp_path / "rt.test.negative").read_text().strip().split("\n")
    assert len(lines) == 12
    for ln in lines:
        parts = ln.split("\t")
        u_raw, gt_raw = (int(x) for x in parts[0].strip("()").split(","))
        negs_raw = [int(x) for x in parts[1:]]
        assert len(negs_raw) == 7
        assert len(set(negs_raw)) == 7  # without replacement
        u = u_raw + 1  # loader id shift
        assert int(d.test_item[u]) == gt_raw + 1
        np.testing.assert_array_equal(d.test_negatives[u],
                                      np.asarray(negs_raw) + 1)
        seen = set(d.hist[u][d.hist[u] > 0].tolist()) | {int(d.test_item[u])}
        assert not (set((np.asarray(negs_raw) + 1).tolist()) & seen)


def test_data_test_smoke_fixture():
    """The --data test branch (reference utils.py:74-77) against the
    checked-in synthetic brightkite sample (scripts/make_test_fixture.py):
    closes the one cosmetic gap of the round-3 review."""
    repo_data = os.path.join(os.path.dirname(__file__), "..", "data")
    d = load_dataset("test", repo_data)
    assert d.num_users > 100 and d.num_items > 100
    assert d.num_pairs > 1000
    assert len(d.eval_users()) > 100
