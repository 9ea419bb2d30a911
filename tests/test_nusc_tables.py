"""Devkit-free nuScenes infos converter on a fake raw table dump.

Builds the v1.0 JSON tables + can_bus blobs the way the real dataset ships
them, runs ``tools/create_data.py``'s ``create_nuscenes_infos`` end to end,
and checks the output pkl against hand-computed geometry: can_bus message
selection, camera->lidar extrinsic composition, global->lidar box
transform, instance finite-difference velocities, and split routing. The
train pkl then feeds ``NuScenesTemporalDataset`` to close the consumer
loop (reference: tools/data_converter/nuscenes_converter.py:29-225 +
CustomNuScenesDataset).
"""
import json
import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

pytestmark = pytest.mark.quick  # numpy/interpret tier, no big jit graphs

CAMS = (
    "CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
    "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT",
)


def _quat_yaw(yaw):
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


def _fake_tables(tmp_path, scenes=("scene-0061", "scene-0103"),
                 n_samples=3, dt_us=500_000):
    """Raw nuScenes v1.0 table dump: 2 scenes, one moving car each."""
    from PIL import Image

    root = tmp_path / "nusc"
    tdir = root / "v1.0-mini"
    tdir.mkdir(parents=True)
    (root / "can_bus").mkdir()
    (root / "samples").mkdir()

    rng = np.random.default_rng(0)
    t = {name: [] for name in (
        "category", "attribute", "visibility", "instance", "sensor",
        "calibrated_sensor", "ego_pose", "log", "scene", "sample",
        "sample_data", "sample_annotation", "map")}

    t["category"].append({"token": "cat_car", "name": "vehicle.car",
                          "description": ""})
    t["sensor"].append({"token": "sen_lidar", "channel": "LIDAR_TOP",
                        "modality": "lidar"})
    t["calibrated_sensor"].append({
        "token": "cs_lidar", "sensor_token": "sen_lidar",
        "translation": [0.9, 0.0, 1.8], "rotation": [1.0, 0, 0, 0],
        "camera_intrinsic": []})
    for ci, cam in enumerate(CAMS):
        t["sensor"].append({"token": f"sen_{cam}", "channel": cam,
                            "modality": "camera"})
        t["calibrated_sensor"].append({
            "token": f"cs_{cam}", "sensor_token": f"sen_{cam}",
            "translation": [1.5, 0.1 * ci, 1.5],
            "rotation": _quat_yaw(ci * np.pi / 3),
            "camera_intrinsic": [[400.0, 0, 48], [0, 400.0, 32],
                                 [0, 0, 1.0]]})
        Image.fromarray(rng.integers(0, 255, (64, 96, 3), np.uint8)).save(
            root / "samples" / f"{cam}.jpg")

    base_ts = 1_600_000_000_000_000
    for si, scene_name in enumerate(scenes):
        log_tok = f"log{si}"
        t["log"].append({"token": log_tok, "location": "singapore-onenorth",
                         "logfile": "", "vehicle": "", "date_captured": ""})
        scene_tok = f"scene{si}"
        sample_toks = [f"s{si}_{k}" for k in range(n_samples)]
        t["scene"].append({
            "token": scene_tok, "name": scene_name, "log_token": log_tok,
            "nbr_samples": n_samples, "first_sample_token": sample_toks[0],
            "last_sample_token": sample_toks[-1], "description": ""})
        inst_tok = f"inst{si}"
        t["instance"].append({
            "token": inst_tok, "category_token": "cat_car",
            "nbr_annotations": n_samples,
            "first_annotation_token": f"a{si}_0",
            "last_annotation_token": f"a{si}_{n_samples - 1}"})

        can_msgs = []
        for k in range(n_samples):
            ts = base_ts + si * 10**9 + k * dt_us
            sample_tok = sample_toks[k]
            t["sample"].append({
                "token": sample_tok, "scene_token": scene_tok,
                "timestamp": ts,
                "prev": sample_toks[k - 1] if k else "",
                "next": sample_toks[k + 1] if k + 1 < n_samples else ""})
            ego_xy = [10.0 * si + 2.0 * k, 1.0 * si]
            pose_tok = f"ep{si}_{k}"
            t["ego_pose"].append({
                "token": pose_tok, "timestamp": ts,
                "translation": ego_xy + [0.0],
                "rotation": [1.0, 0, 0, 0]})
            t["sample_data"].append({
                "token": f"sd_lidar_{si}_{k}", "sample_token": sample_tok,
                "calibrated_sensor_token": "cs_lidar",
                "ego_pose_token": pose_tok, "timestamp": ts,
                "is_key_frame": True, "fileformat": "bin",
                "filename": f"samples/LIDAR_TOP_{si}_{k}.bin",
                "prev": "", "next": ""})
            for cam in CAMS:
                cpose_tok = f"ep_{cam}_{si}_{k}"
                t["ego_pose"].append({
                    "token": cpose_tok, "timestamp": ts + 1000,
                    "translation": [ego_xy[0] + 0.01, ego_xy[1], 0.0],
                    "rotation": [1.0, 0, 0, 0]})
                t["sample_data"].append({
                    "token": f"sd_{cam}_{si}_{k}",
                    "sample_token": sample_tok,
                    "calibrated_sensor_token": f"cs_{cam}",
                    "ego_pose_token": cpose_tok, "timestamp": ts + 1000,
                    "is_key_frame": True, "fileformat": "jpg",
                    "filename": f"samples/{cam}.jpg",
                    "prev": "", "next": ""})
            # the car drives +x at 4 m/s (2 m per 0.5 s), global frame
            t["sample_annotation"].append({
                "token": f"a{si}_{k}", "sample_token": sample_tok,
                "instance_token": inst_tok,
                "translation": [20.0 + 2.0 * k, 3.0 + si, 0.8],
                "size": [1.9, 4.5, 1.6],
                "rotation": _quat_yaw(0.3),
                "prev": f"a{si}_{k - 1}" if k else "",
                "next": f"a{si}_{k + 1}" if k + 1 < n_samples else "",
                "num_lidar_pts": 10, "num_radar_pts": 2,
                "visibility_token": "4", "attribute_tokens": []})
            # CAN pose messages at 2x the sample rate, slightly offset
            for j in range(2):
                can_msgs.append({
                    "utime": ts - 20_000 + j * 250_000,
                    "pos": [ego_xy[0] - 0.05 + 0.1 * j, ego_xy[1], 0.0],
                    "orientation": [1.0, 0, 0, 0],
                    "accel": [0.1, 0.0, 9.8],
                    "rotation_rate": [0.0, 0.0, 0.01],
                    "vel": [4.0, 0.0, 0.0]})
        (root / "can_bus" / f"{scene_name}_pose.json").write_text(
            json.dumps(can_msgs))

    for name, rows in t.items():
        (tdir / f"{name}.json").write_text(json.dumps(rows))
    return root


def test_create_nuscenes_infos_devkit_free(tmp_path):
    from create_data import create_nuscenes_infos

    root = _fake_tables(tmp_path)
    out_dir = str(tmp_path / "out")
    create_nuscenes_infos(str(root), "v1.0-mini", out_dir)

    with open(os.path.join(out_dir, "nuscenes_infos_temporal_train.pkl"),
              "rb") as f:
        train = pickle.load(f)
    with open(os.path.join(out_dir, "nuscenes_infos_temporal_val.pkl"),
              "rb") as f:
        val = pickle.load(f)
    assert train["metadata"]["version"] == "v1.0-mini"
    # split routing: scene-0061 -> mini_train, scene-0103 -> mini_val
    assert len(train["infos"]) == 3 and len(val["infos"]) == 3
    assert {i["scene_name"] for i in train["infos"]} == {"scene-0061"}
    assert {i["scene_name"] for i in val["infos"]} == {"scene-0103"}

    info = train["infos"][1]  # scene 0, sample k=1
    assert info["map_location"] == "singapore-onenorth"

    # can_bus: last pose message at/before ts is the j=1 message of k=1
    # (utime = ts - 20_000 + 250_000 > ts? no: +230_000 offset from k=1's
    # ts... j=0 at ts-20_000 <= ts, j=1 at ts+230_000 > ts -> j=0 wins)
    np.testing.assert_allclose(info["can_bus"][:3], [2.0 - 0.05, 0.0, 0.0])
    np.testing.assert_allclose(info["can_bus"][3:7], [1, 0, 0, 0])
    np.testing.assert_allclose(info["can_bus"][13:16], [4.0, 0, 0])

    # camera extrinsics: identity ego/lidar rotations, cam ego pose shifted
    # +0.01 m in x -> cam2lidar translation = c2e + cam-ego drift - l2e
    cam = info["cams"]["CAM_FRONT"]
    np.testing.assert_allclose(
        cam["sensor2lidar_translation"],
        [1.5 + 0.01 - 0.9, 0.0, 1.5 - 1.8], atol=1e-9)
    np.testing.assert_allclose(cam["sensor2lidar_rotation"], np.eye(3),
                               atol=1e-9)
    c1 = info["cams"]["CAM_FRONT_RIGHT"]
    yaw = np.pi / 3
    np.testing.assert_allclose(
        c1["sensor2lidar_rotation"],
        [[np.cos(yaw), -np.sin(yaw), 0], [np.sin(yaw), np.cos(yaw), 0],
         [0, 0, 1.0]], atol=1e-9)

    # gt boxes: car global (22, 3, 0.8) with ego at (2, 0), lidar offset
    # (0.9, 0, 1.8): lidar-frame center (22-2-0.9, 3, 0.8-1.8), gt z is
    # bottom-center (z - h/2), yaw unchanged (identity ego rotation)
    assert info["gt_names"].tolist() == ["car"]
    np.testing.assert_allclose(
        info["gt_boxes"][0],
        [22 - 2 - 0.9, 3.0, 0.8 - 1.8 - 0.8, 1.9, 4.5, 1.6, 0.3],
        rtol=1e-5, atol=1e-5)
    # velocity: central difference (a0 -> a2) = 4 m/s in +x
    np.testing.assert_allclose(info["gt_velocity"][0], [4.0, 0.0],
                               rtol=1e-5)
    assert info["valid_flag"].tolist() == [True]
    assert info["gt_visibility"].tolist() == ["4"]

    # first/last sample: one-sided velocity difference still 4 m/s
    np.testing.assert_allclose(train["infos"][0]["gt_velocity"][0],
                               [4.0, 0.0], rtol=1e-5)


def test_infos_feed_temporal_dataset(tmp_path):
    """The converter's pkl drives the real-data dataset end to end."""
    from create_data import create_nuscenes_infos

    from apollo_vision_net_tpu.configs import bev_smoke_det_map
    from apollo_vision_net_tpu.data.nuscenes_dataset import (
        NuScenesTemporalDataset,
    )

    root = _fake_tables(tmp_path)
    out_dir = str(tmp_path / "out")
    create_nuscenes_infos(str(root), "v1.0-mini", out_dir)

    cfg = bev_smoke_det_map()
    ds = NuScenesTemporalDataset(
        cfg, os.path.join(out_dir, "nuscenes_infos_temporal_train.pkl"),
        data_root=str(root), training=True, img_scale=1.0, seed=0)
    assert len(ds) == 3
    sample = ds.get_queue_sample(1)
    img = sample["img"]
    assert img.shape[0] == cfg.model.queue_length
    assert img.shape[1] == cfg.model.num_cams and img.shape[-1] == 3
    assert np.isfinite(sample["can_bus"]).all()
    assert sample["gt_boxes"].shape[-1] == 9  # cx cy cz w l h yaw vx vy
