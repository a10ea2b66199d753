"""CLI surface regression: end-to-end tiny runs through acf_tpu.cli.main."""

import os

import numpy as np
import pytest

from acf_tpu.cli.main import main

ARGS = ["--data", "video", "--path", "/root/reference/data", "--nrows", "2000",
        "--epochs", "2", "--d", "8", "--bs", "64", "--maxlen", "5"]


def test_cli_bpr(tmp_path):
    best = main(ARGS + ["--model", "bpr", "--opath", str(tmp_path) + "/"])
    assert best["epoch"] >= 0
    outs = os.listdir(tmp_path)
    assert any(f.endswith(".out") for f in outs)
    assert any(f.endswith(".hr") for f in outs)


def test_cli_apr_two_phase(tmp_path):
    best = main(ARGS + ["--model", "apr", "--adv_epoch", "1",
                        "--opath", str(tmp_path) + "/"])
    assert np.isfinite(best["ndcg"])


def test_cli_sparse_apr(tmp_path):
    best = main(ARGS + ["--model", "apr", "--adv_epoch", "1", "--sparse",
                        "--opath", str(tmp_path) + "/"])
    assert np.isfinite(best["ndcg"])


def test_cli_gru4rec_variant(tmp_path):
    best = main(ARGS + ["--model", "gru4rec", "--loss", "top1",
                        "--final_act", "tanh",
                        "--opath", str(tmp_path) + "/"])
    assert np.isfinite(best["ndcg"])


def test_cli_sampled_eval(tmp_path):
    best = main(ARGS + ["--model", "bpr", "--eval_mode", "sample",
                        "--opath", str(tmp_path) + "/"])
    assert np.isfinite(best["ndcg"])


def test_cli_checkpoint_restore_resume(tmp_path):
    """Periodic full-state snapshots + --restore resume (reference
    --restore semantics, run_adv.py:97-120)."""
    ck = str(tmp_path / "ck")
    main(ARGS + ["--model", "bpr", "--opath", str(tmp_path) + "/a/",
                 "--ckpt", "1", "--ckpt_dir", ck])
    assert os.path.exists(f"{ck}/video/bpr-1.npz")
    resumed = main(ARGS + ["--model", "bpr", "--epochs", "3",
                           "--opath", str(tmp_path) + "/b/",
                           "--restore", f"{ck}/video/bpr-1",
                           "--restore_epoch", "2"])
    assert np.isfinite(resumed["ndcg"])


def test_cli_tiny_dataset_smaller_than_batch(tmp_path):
    """num_pairs < batch_size must not crash the epoch sampler."""
    best = main(["--data", "video", "--path", "/root/reference/data",
                 "--nrows", "300", "--bs", "512", "--epochs", "2",
                 "--d", "8", "--model", "bpr",
                 "--opath", str(tmp_path) + "/"])
    assert np.isfinite(best["ndcg"])


def test_cli_rejects_invalid_loss():
    import pytest
    with pytest.raises(ValueError, match="gru4rec loss_type"):
        main(ARGS + ["--model", "gru4rec", "--loss", "hinge"])


def test_cli_pre_accepts_full_state_snapshot(tmp_path):
    """--pre warm-start must read full train-state snapshots (params nested
    under 'params/') — the BPR-pretrain → APR protocol (IRGAN.py:29-34,
    run.py:210-213) with periodic snapshots as the source."""
    ck = str(tmp_path / "ck")
    main(ARGS + ["--model", "bpr", "--opath", str(tmp_path) + "/a/",
                 "--ckpt", "1", "--ckpt_dir", ck])
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        best = main(ARGS + ["--model", "bpr", "--epochs", "1",
                            "--opath", str(tmp_path) + "/b/",
                            "--pre", f"{ck}/video/bpr-1"])
    assert np.isfinite(best["ndcg"])
    assert "Loaded pretrained leaves: []" not in buf.getvalue()


def test_cli_two_phase_restore_into_adv_phase(tmp_path):
    ck = str(tmp_path / "ck")
    main(ARGS + ["--model", "apr", "--adv_epoch", "1",
                 "--opath", str(tmp_path) + "/a/", "--ckpt", "1",
                 "--ckpt_dir", ck])
    resumed = main(ARGS + ["--model", "apr", "--adv_epoch", "1",
                           "--epochs", "3",
                           "--opath", str(tmp_path) + "/b/",
                           "--restore", f"{ck}/video/apr-1",
                           "--restore_epoch", "2"])
    assert np.isfinite(resumed["ndcg"])


def test_cli_sparse_rejects_unsupported_flags(tmp_path):
    import pytest
    with pytest.raises(SystemExit, match="sparse"):
        main(ARGS + ["--model", "apr", "--sparse", "--adv", "random",
                     "--opath", str(tmp_path) + "/"])
    with pytest.raises(SystemExit, match="sparse"):
        main(ARGS + ["--model", "bpr", "--sparse", "--dns", "4",
                     "--opath", str(tmp_path) + "/"])


def test_cli_save_model_and_aliases(tmp_path):
    """--save_model writes .best/.last param snapshots (reference run.py:
    257-272); --dataset/--adv_epochs/--eval/--verbose_eval alias the
    run_adv_ori.py flag names."""
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        best = main(["--dataset", "video", "--path", "/root/reference/data",
                     "--nrows", "2000", "--epochs", "2", "--d", "8",
                     "--bs", "64", "--maxlen", "5", "--model", "bpr",
                     "--save_model", "1", "--verbose_eval", "1",
                     "--eval", "all", "--opath", str(tmp_path) + "/"])
        assert best["epoch"] >= 0
        h5 = os.listdir(tmp_path / "h5")
        assert any(f.endswith(".best.npz") for f in h5), h5
        assert any(f.endswith(".last.npz") for f in h5), h5
    finally:
        os.chdir(cwd)


def test_cli_fgsm_wrapper(tmp_path):
    best = main(ARGS + ["--model", "gru4rec", "--fgsm", "--adv_epoch", "1",
                        "--eps", "0.1", "--opath", str(tmp_path) + "/"])
    assert np.isfinite(best["ndcg"])


def test_cli_fgsm_rejects_adversarial_models(tmp_path):
    import pytest
    with pytest.raises(SystemExit, match="fgsm"):
        main(ARGS + ["--model", "pop", "--fgsm",
                     "--opath", str(tmp_path) + "/"])


def test_cli_fgsm_rejects_sparse(tmp_path):
    # --sparse --fgsm would wrap SparseMFBPR (inheriting its row-space
    # Adagrad opt-state) while the wrapper hides make_epoch_fn — the generic
    # optax epoch then crashes on the wrong opt-state tree
    import pytest
    with pytest.raises(SystemExit, match="sparse"):
        main(ARGS + ["--model", "bpr", "--sparse", "--fgsm",
                     "--opath", str(tmp_path) + "/"])


def test_cli_profile_trace(tmp_path):
    trace_dir = str(tmp_path / "trace")
    best = main(ARGS + ["--model", "bpr", "--opath", str(tmp_path) + "/",
                        "--profile", trace_dir])
    assert np.isfinite(best["ndcg"])
    found = []
    for root, _, files in os.walk(trace_dir):
        found += files
    assert any(f.endswith((".trace.json.gz", ".xplane.pb")) for f in found), found


def test_cli_mesh_apr_two_phase(tmp_path):
    """--mesh DxM (VERDICT r2 #4): the reference-shaped entry point reaches
    the distributed layer — APR trains GSPMD-sharded over the 4x2 virtual
    mesh end-to-end (conftest provides 8 CPU devices, so no fallback
    platform switch happens here)."""
    best = main(ARGS + ["--model", "apr", "--adv_epoch", "1", "--mesh", "4x2",
                        "--opath", str(tmp_path) + "/"])
    assert np.isfinite(best["ndcg"])
    out = [f for f in os.listdir(tmp_path) if f.endswith(".out")][0]
    text = (tmp_path / out).read_text()
    assert "Mesh: data=4 model=2" in text


def test_cli_mesh_seq_and_pure_dp(tmp_path):
    """--mesh N = pure data parallel; sequence flagship path."""
    best = main(ARGS + ["--model", "sasrec", "--mesh", "8",
                        "--opath", str(tmp_path) + "/"])
    assert np.isfinite(best["ndcg"])


def test_cli_mesh_rejects_bad_spec(tmp_path):
    import pytest

    with pytest.raises(ValueError, match="DATAxMODEL"):
        main(ARGS + ["--model", "bpr", "--mesh", "fast",
                     "--opath", str(tmp_path) + "/"])


def test_cli_mesh_bespoke_epoch_model(tmp_path):
    """--mesh with a make_epoch_fn family (ABPR: popularity discriminators)
    — the CLI path through the bespoke epoch builders must shard too
    (VERDICT r2 #3 x #4)."""
    best = main(ARGS + ["--model", "abpr", "--mesh", "4x2",
                        "--opath", str(tmp_path) + "/"])
    assert np.isfinite(best["ndcg"])


def test_cli_staged_eps_three_phase(tmp_path):
    """--eps_stage2 (round-5 staged-epsilon schedule): three-phase
    asasrec run completes, validates its epoch ordering, and rejects
    --restore."""
    best = main(ARGS + ["--model", "asasrec", "--epochs", "6",
                        "--adv_epoch", "2", "--eps", "0.5",
                        "--eps_stage2", "0.8", "--stage2_epoch", "4",
                        "--maxlen", "6", "--verbose", "2",
                        "--opath", str(tmp_path) + "/"])
    assert best["epoch"] >= 0
    with pytest.raises(SystemExit, match="stage2_epoch"):
        main(ARGS + ["--model", "asasrec", "--epochs", "6",
                     "--adv_epoch", "4", "--eps_stage2", "0.8",
                     "--stage2_epoch", "2",
                     "--opath", str(tmp_path) + "/"])


def test_cli_staged_eps_rejects_single_phase_models(tmp_path):
    """--eps_stage2 on a model without two-phase staging must refuse, not
    silently train a clean model (same failure class as the --lr
    sentinel; round-5 review finding)."""
    with pytest.raises(SystemExit, match="two-phase"):
        main(ARGS + ["--model", "sasrec", "--eps_stage2", "0.8",
                     "--stage2_epoch", "1", "--opath", str(tmp_path) + "/"])
