"""Smoke tests for the experiment tooling CLIs (reference scripts/ parity)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_create_hyperparam_sweep(tmp_path):
    base = {"name": "sweeptest", "lora_training_urls": "data/x", "concept_mode": "style",
            "sd_model_version": "sd15", "max_train_steps": 10}
    base_path = tmp_path / "base.json"
    base_path.write_text(json.dumps(base))
    out_dir = tmp_path / "sweep"
    r = subprocess.run(
        [sys.executable, "scripts/create_hyperparam_sweep.py", str(base_path),
         "--n", "6", "--out_dir", str(out_dir)],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    configs = [f for f in os.listdir(out_dir) if f.endswith(".json")]
    assert len(configs) == 6
    assert os.path.exists(out_dir / "run_sweep.sh")
    # configs differ (min hamming distance)
    texts = {(out_dir / c).read_text() for c in configs}
    assert len(texts) == 6
    # runner references main.py per config
    runner = (out_dir / "run_sweep.sh").read_text()
    assert runner.count("python main.py") == 6


def test_eval_hyperparam_sweep(tmp_path):
    # two fake completed runs with differing hyperparams and jpg counts
    for i, (lr, n_jpgs) in enumerate([(1e-4, 3), (1e-3, 1)]):
        run = tmp_path / f"run_{i}"
        run.mkdir()
        (run / "training_args.json").write_text(json.dumps(
            {"name": f"r{i}", "unet_lr": lr, "lora_rank": 16}))
        for j in range(n_jpgs):
            (run / f"img_{j}.jpg").write_bytes(b"\xff\xd8\xff\xd9")
    r = subprocess.run(
        [sys.executable, "scripts/eval_hyperparam_sweep.py", str(tmp_path)],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    summary = json.load(open(tmp_path / "sweep_summary.json"))
    assert len(summary["runs"]) == 2
    assert "unet_lr" in summary["per_param"]
    # higher jpg count scored first
    assert summary["runs"][0][1] >= summary["runs"][1][1]


def test_old_eval_hyperparam_sweep(tmp_path):
    # four runs: score correlates negatively with unet_lr -> regression finds it
    for i, (lr, n_jpgs) in enumerate([(1e-4, 4), (3e-4, 3), (1e-3, 2), (3e-3, 0)]):
        run = tmp_path / f"run_{i}"
        run.mkdir()
        (run / "training_args.json").write_text(json.dumps(
            {"name": f"r{i}", "unet_lr": lr, "lora_rank": 16, "mode": "style"}))
        for j in range(n_jpgs):
            (run / f"img_{j}.jpg").write_bytes(b"\xff\xd8\xff\xd9")
    r = subprocess.run(
        [sys.executable, "scripts/old_eval_hyperparam_sweep.py", str(tmp_path),
         "--plot"],
        cwd=REPO, capture_output=True, text=True, timeout=180,
    )
    assert r.returncode == 0, r.stderr
    assert "Best output_dir" in r.stdout and "run_0" in r.stdout
    assert "unet_lr" in r.stdout and "R^2" in r.stdout
    # constant params (lora_rank, mode) must not be analyzed
    assert "lora_rank" not in r.stdout.split("Best")[-1]
    plots = os.listdir(tmp_path / "sweep_analysis")
    assert any("unet_lr" in p for p in plots)


@pytest.mark.slow
def test_real_weights_check_synthesized(tmp_path):
    """The staging rehearsal (scripts/real_weights_check.py) must pass
    end-to-end against a synthesized checkpoint — STAGING.md §4 points real
    deployments at this exact command."""
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "real_weights_check.py"),
            "--synthesize", "tiny",
            "--steps", "4",
            "--out", str(tmp_path),
        ],
        cwd=REPO, capture_output=True, text=True, timeout=1200,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "REAL-WEIGHTS CHECK PASSED" in r.stdout
