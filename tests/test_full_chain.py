"""Whole-pipeline dry run on a fake raw nuScenes dump (VERDICT r4 #8).

Chains every real-data surface in ONE test, exactly the commands a user
would run the day real nuScenes data lands (reference flow:
tools/data_converter/nuscenes_converter.py:29-225 -> tools/train.py:106-270
-> tools/test.py dump/eval):

  raw v1.0 JSON tables + can_bus blobs + camera JPEGs + map-expansion JSON
    -> tools/create_data.py nuscenes          (devkit-free infos converter)
    -> tools/create_data.py nuscenes-map-gt   (devkit-free map-GT annotate)
    -> tools/train.py  --data nuscenes        (2 steps, checkpoint written)
    -> tools/test.py   --data nuscenes --dump-results (streaming eval)
    -> tools/eval_map_offline.py              (offline == online chamfer)

CLIs are invoked in-process via their argparse main()s (same sys.argv
contract as the shell) so the whole chain shares one JAX runtime and the
warm CPU compile cache. Model scale is the smoke det+map config; the fake
city's images are 64x96 so --img-scale 1.0 feeds the model natively.
"""
import json
import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from tests.test_map_extract import _build_city
from tests.test_nusc_tables import _fake_tables


def _run_cli(tool_main, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["prog"] + argv)
    tool_main()


def test_raw_tables_to_train_to_eval(tmp_path, monkeypatch, capsys):
    # 8 samples/scene: the train split must cover one dp8-mesh batch
    # (drop_last_to=batch_size would otherwise yield zero batches)
    root = _fake_tables(tmp_path, n_samples=8)
    # map-expansion JSON for the log location the fake tables use
    exp = root / "maps" / "expansion"
    exp.mkdir(parents=True)
    (exp / "singapore-onenorth.json").write_text(json.dumps(_build_city()))

    out_dir = str(tmp_path / "out")
    from create_data import create_nuscenes_infos, add_map_gt_to_infos

    create_nuscenes_infos(str(root), "v1.0-mini", out_dir)
    train_pkl = os.path.join(out_dir, "nuscenes_infos_temporal_train.pkl")
    val_pkl = os.path.join(out_dir, "nuscenes_infos_temporal_val.pkl")
    assert os.path.exists(train_pkl) and os.path.exists(val_pkl)

    for pkl_path in (train_pkl, val_pkl):
        add_map_gt_to_infos(pkl_path, str(root))
        with open(pkl_path, "rb") as f:
            infos = pickle.load(f)["infos"]
        assert infos and all("map_vectors" in i for i in infos)

    # --- train 2 steps on the real-data path, checkpoint written ---
    import train as train_cli

    work = str(tmp_path / "work")
    _run_cli(train_cli.main, [
        "bev_smoke_det_map", "--data", "nuscenes", "--infos", train_pkl,
        "--data-root", str(root), "--img-scale", "1.0", "--steps", "2",
        "--batch-size", "8", "--log-interval", "1", "--work-dir", work,
        "--num-workers", "0",
    ], monkeypatch)
    assert any("checkpoint" in d or d.isdigit()
               for d in os.listdir(work)), os.listdir(work)

    # --- streaming eval + results dump on the val split ---
    import test as test_cli

    dump = str(tmp_path / "nuscmap_results.json")
    metrics_out = str(tmp_path / "metrics.json")
    _run_cli(test_cli.main, [
        "bev_smoke_det_map", "--data", "nuscenes", "--infos", val_pkl,
        "--data-root", str(root), "--img-scale", "1.0",
        "--eval", "bbox", "chamfer", "--num-frames", "0",
        "--dump-results", dump, "--out", metrics_out,
    ], monkeypatch)
    with open(metrics_out) as f:
        metrics = json.load(f)
    assert "NDS" in metrics and np.isfinite(metrics["NDS"])
    chamfer_keys = [k for k in metrics if "chamfer" in k.lower()]
    assert chamfer_keys, sorted(metrics)

    # --- offline map eval over the dumped results matches online ---
    import eval_map_offline as offline_cli

    with open(dump) as f:
        dumped = json.load(f)
    assert dumped.get("results"), "dump-results wrote no frames"

    # GT JSON in the offline evaluator's contract, in the SAME
    # scene-contiguous order the streaming eval consumed frames
    from apollo_vision_net_tpu.configs import bev_smoke_det_map
    from apollo_vision_net_tpu.data.nuscenes_dataset import (
        NuScenesTemporalDataset, scene_contiguous_eval_indices)

    ds = NuScenesTemporalDataset(
        bev_smoke_det_map(), val_pkl, data_root=str(root), training=False,
        img_scale=1.0)
    idxs = scene_contiguous_eval_indices(ds.infos, 1, 0)
    gt_json = str(tmp_path / "map_gt.json")
    with open(gt_json, "w") as f:
        json.dump({"GTs": [
            {"vectors": [
                {"pts": np.asarray(v, np.float64).tolist(),
                 "type": int(l)}
                for v, l in zip(ds.infos[i]["map_vectors"],
                                ds.infos[i]["map_labels"])]}
            for i in idxs
        ]}, f)

    capsys.readouterr()  # drop chain output so far
    _run_cli(offline_cli.main, [dump, gt_json, "--metrics", "chamfer"],
             monkeypatch)
    offline = json.loads(capsys.readouterr().out)
    assert offline["NuscMap_chamfer/mAP"] == pytest.approx(
        metrics["NuscMap_chamfer/mAP"], abs=1e-6)
