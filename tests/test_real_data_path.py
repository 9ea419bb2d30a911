"""End-to-end real-data path on a fake on-disk nuScenes: infos pkl + camera
images + map-expansion JSON → map-GT annotation (tools/create_data.py
add_map_gt_to_infos) → NuScenesTemporalDataset queue samples with
real-geometry map GT → results JSON round trip (reference closed loop,
tools/test.py:314-359 + eval_map_offline §6.2)."""
import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from apollo_vision_net_tpu.configs import bev_smoke_det_map
from apollo_vision_net_tpu.data.nuscenes_dataset import (
    NuScenesTemporalDataset,
    scene_contiguous_eval_indices,
)
from apollo_vision_net_tpu.evaluation import formatting
from apollo_vision_net_tpu.evaluation.map_eval import evaluate_map
from tests.test_map_extract import _build_city


def _fake_nuscenes(tmp_path, n_samples=4):
    """Write images + infos + map JSON for a tiny straight-line drive."""
    import json

    from PIL import Image

    root = tmp_path / "nusc"
    (root / "maps" / "expansion").mkdir(parents=True)
    (root / "samples").mkdir()
    (root / "maps" / "expansion" / "testville.json").write_text(
        json.dumps(_build_city()))

    rng = np.random.default_rng(0)
    cams = {}
    for ci, cam in enumerate(
            ("CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
             "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT")):
        img_path = root / "samples" / f"{cam}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (64, 96, 3), np.uint8)).save(img_path)
        yaw = ci * np.pi / 3
        cams[cam] = dict(
            data_path=os.path.join("samples", f"{cam}.jpg"),
            cam_intrinsic=np.array(
                [[400.0, 0, 48], [0, 400.0, 32], [0, 0, 1]]),
            sensor2lidar_rotation=np.array(
                [[np.cos(yaw), -np.sin(yaw), 0],
                 [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1.0]]),
            sensor2lidar_translation=np.array([0.0, 0.0, 0.5]),
        )

    infos = []
    for t in range(n_samples):
        x = 18.0 + 2.0 * t  # drive along the divider at y=5
        can_bus = np.zeros(18, np.float32)
        infos.append(dict(
            token=f"tok{t}",
            scene_token="scene0",
            scene_name="scene-0001",
            map_location="testville",
            timestamp=1000 + t,
            can_bus=can_bus,
            lidar2ego_translation=[0.0, 0.0, 1.8],
            lidar2ego_rotation=[1.0, 0.0, 0.0, 0.0],
            ego2global_translation=[x, 0.0, 0.0],
            ego2global_rotation=[1.0, 0.0, 0.0, 0.0],
            cams=cams,
            gt_boxes=np.array([[2.0, 1.0, 0.0, 1.9, 4.5, 1.6, 0.1]],
                              np.float32),
            gt_names=np.array(["car"]),
            gt_velocity=np.array([[0.5, 0.0]], np.float32),
            valid_flag=np.array([True]),
        ))
    infos_path = root / "infos.pkl"
    with open(infos_path, "wb") as f:
        pickle.dump({"infos": infos, "metadata": {"version": "fake"}}, f)
    return root, infos_path


def test_add_map_gt_and_dataset_queue(tmp_path):
    from tools.create_data import add_map_gt_to_infos

    root, infos_path = _fake_nuscenes(tmp_path)
    out = add_map_gt_to_infos(
        str(infos_path), str(root), map_version=2, patch_size=(60.0, 30.0))
    with open(out, "rb") as f:
        payload = pickle.load(f)
    infos = payload["infos"]
    assert all("map_vectors" in i and "map_labels" in i for i in infos)
    labels0 = set(infos[0]["map_labels"])
    # the fixture city guarantees divider+ped+boundary+centerline in reach
    assert {0, 1, 2, 3} <= labels0, labels0

    # determinism: re-annotation produces identical vectors
    out2 = add_map_gt_to_infos(
        str(infos_path), str(root), out_path=str(tmp_path / "again.pkl"),
        map_version=2, patch_size=(60.0, 30.0))
    with open(out2, "rb") as f:
        again = pickle.load(f)["infos"]
    for a, b in zip(infos, again):
        assert a["map_labels"] == b["map_labels"]
        for va, vb in zip(a["map_vectors"], b["map_vectors"]):
            np.testing.assert_array_equal(va, vb)

    cfg = bev_smoke_det_map()
    ds = NuScenesTemporalDataset(
        cfg, str(infos_path), data_root=str(root), training=True,
        img_scale=1.0)
    sample = ds.get_queue_sample(len(ds) - 1)
    T = cfg.model.queue_length
    assert sample["img"].shape[0] == T
    assert sample["map_mask"].sum() > 0, "no packed map GT from real geometry"
    assert sample["map_shift_pts"].shape[-2:] == (cfg.model.map_num_pts, 2)
    # packed vectors live inside the ego patch
    pts = sample["map_shift_pts"][sample["map_mask"]]
    live = pts[pts > -9000]
    assert np.abs(live).max() <= max(cfg.model.map_patch_size) / 2 + 1e-3

    # eval-side plumbing: scene-contiguous indices + per-frame GT records
    idxs = scene_contiguous_eval_indices(ds.infos, 1, 0)
    assert idxs == list(range(len(ds)))
    f = ds.get_frame(0)
    assert f["img"].shape[0] == cfg.model.num_cams
    assert f["gt_mask"].sum() == 1


def test_results_json_round_trip(tmp_path):
    rng = np.random.default_rng(3)
    map_records, gt_records = [], []
    for _ in range(3):
        n = 4
        vecs = [rng.uniform(-14, 14, (20, 2)).astype(np.float32)
                for _ in range(n)]
        map_records.append(dict(
            vectors=vecs,
            scores=rng.uniform(0.1, 1.0, n).astype(np.float32),
            labels=rng.integers(0, 3, n).astype(np.int32),
            valid=np.ones(n, bool),
        ))
        gt_records.append(dict(vectors=[v.copy() for v in vecs],
                               labels=map_records[-1]["labels"].copy()))
    det_records = [formatting.detections_to_sample_record(
        rng.uniform(-10, 10, (5, 9)).astype(np.float32),
        rng.uniform(0, 1, 5), rng.integers(0, 10, 5),
        np.ones(5, bool)) for _ in range(3)]

    path = str(tmp_path / "nuscmap_results.json")
    formatting.dump_results_json(
        {"det": det_records, "map": map_records}, path)
    loaded = formatting.load_results_json(path)
    assert len(loaded["map"]) == 3 and len(loaded["det"]) == 3
    for a, b in zip(map_records, loaded["map"]):
        np.testing.assert_allclose(
            np.stack(a["vectors"]), np.stack(b["vectors"]), atol=1e-6)
        np.testing.assert_array_equal(a["labels"], b["labels"])

    gt_path = str(tmp_path / "map_gt.json")
    formatting.dump_map_gt_json(gt_records, gt_path)
    gt_loaded = formatting.load_map_gt_json(gt_path)

    # offline re-eval of the round-tripped records == original
    m1 = evaluate_map(map_records, gt_records, metrics=["chamfer"])
    m2 = evaluate_map(loaded["map"], gt_loaded, metrics=["chamfer"])
    for k in m1:
        assert m1[k] == pytest.approx(m2[k], abs=1e-6)
    # predictions == GT -> perfect chamfer mAP
    assert m1["NuscMap_chamfer/mAP"] == pytest.approx(1.0, abs=1e-6)
