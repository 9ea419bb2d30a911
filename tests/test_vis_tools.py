"""Visualization/analysis tools run end-to-end on synthetic records and
write their artifacts (reference tools/analysis_tools + occ_visualization
parity — SURVEY.md §2.8 'visualization suite')."""
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _det_record(n=5, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "translation": rng.uniform(-40, 40, (n, 3)).astype(np.float32),
        "size": rng.uniform(1, 4, (n, 3)).astype(np.float32),
        "yaw": rng.uniform(-3, 3, n).astype(np.float32),
        "scores": rng.uniform(0, 1, n).astype(np.float32),
        "labels": rng.integers(0, 10, n),
        "valid": np.ones(n, bool),
    }


def _map_record(n=4, seed=1):
    rng = np.random.default_rng(seed)
    return {
        "vectors": rng.uniform(-30, 30, (n, 20, 2)).astype(np.float32),
        "scores": rng.uniform(0.4, 1, n).astype(np.float32),
        "labels": rng.integers(0, 3, n),
    }


def _occ_grid(dims=(20, 20, 4), empty=16, frac=0.2, seed=2):
    rng = np.random.default_rng(seed)
    n = int(np.prod(dims))
    grid = np.full(n, empty, np.int64)
    idx = rng.choice(n, int(n * frac), replace=False)
    grid[idx] = rng.integers(0, empty, idx.size)
    return grid


@pytest.fixture(scope="module")
def results_pkl(tmp_path_factory):
    d = tmp_path_factory.mktemp("vis")
    path = d / "results.pkl"
    frames = 3
    res = {
        "det": [_det_record(seed=i) for i in range(frames)],
        "map": [_map_record(seed=i) for i in range(frames)],
        "occ": [_occ_grid(seed=i) for i in range(frames)],
        "gt": {
            "det": [_det_record(seed=10 + i) for i in range(frames)],
            "map": [_map_record(seed=10 + i) for i in range(frames)],
            "occ": [_occ_grid(seed=20 + i) for i in range(frames)],
        },
    }
    with open(path, "wb") as f:
        pickle.dump(res, f)
    return str(path)


def _run(args):
    r = subprocess.run([sys.executable] + args, cwd=REPO,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr


def test_vis_bev(results_pkl, tmp_path):
    out = tmp_path / "bev.png"
    _run(["tools/vis_bev.py", results_pkl, "--out", str(out)])
    assert out.stat().st_size > 0


def test_vis_occ_pair_png_and_gif(results_pkl, tmp_path):
    out = tmp_path / "pair.png"
    _run(["tools/vis_occ_pair.py", results_pkl, "--out", str(out),
          "--dims", "20", "20", "4"])
    assert out.stat().st_size > 0
    gif = tmp_path / "pair.gif"
    _run(["tools/vis_occ_pair.py", results_pkl, "--gif", "--out", str(gif),
          "--dims", "20", "20", "4"])
    assert gif.stat().st_size > 0


def test_vis_occ_pair_infers_dims(results_pkl, tmp_path):
    # square x=y inference: 20*20*4 voxels -> (20, 20, 4)
    out = tmp_path / "pair2.png"
    _run(["tools/vis_occ_pair.py", results_pkl, "--out", str(out)])
    assert out.stat().st_size > 0


def test_seq_det_map_vis(results_pkl, tmp_path):
    out_dir = tmp_path / "seq"
    _run(["tools/seq_det_map_vis.py", results_pkl, "--out-dir",
          str(out_dir), "--gif"])
    pngs = sorted(os.listdir(out_dir))
    assert "0000.png" in pngs and "0002.png" in pngs
    assert (out_dir / "seq.gif").stat().st_size > 0


def test_vis_occ_single(tmp_path):
    grid = _occ_grid()
    npy = tmp_path / "occ.npy"
    np.save(npy, grid)
    out = tmp_path / "occ.png"
    _run(["tools/vis_occ.py", str(npy), "--dims", "20", "20", "4",
          "--out", str(out)])
    assert out.stat().st_size > 0


def test_plot_loss_and_analyze_logs(tmp_path):
    log = tmp_path / "metrics.jsonl"
    with open(log, "w") as f:
        for i in range(20):
            f.write(json.dumps({
                "kind": "train", "step": i,
                "loss_total": 10.0 / (i + 1), "loss_cls": 5.0 / (i + 1),
                "sec_per_it": 0.1 + 0.01 * (i % 3),
            }) + "\n")
        f.write(json.dumps({
            "kind": "eval", "step": 19, "NDS": 0.1}) + "\n")
    out = tmp_path / "curves.png"
    _run(["tools/plot_loss_from_log.py", str(log), "--out", str(out)])
    assert out.stat().st_size > 0
    _run(["tools/analyze_logs.py", str(log)])
