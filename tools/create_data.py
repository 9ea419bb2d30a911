#!/usr/bin/env python
"""Offline data converter: raw nuScenes → temporal infos pkl.

Parity: tools/create_data.py + tools/data_converter/nuscenes_converter.py
(:29-675) — per-sample records with 18-dim can_bus from the CAN pose
messages, per-camera sensor2lidar extrinsics + intrinsics, annotations,
map_location and scene metadata, sorted by timestamp.

Requires the nuscenes devkit (not installed in CI); the module import-gates
it and documents the exact schema produced so `data/infos.py` can consume
pkls generated elsewhere.
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CAMS = (
    "CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
    "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT",
)


def create_nuscenes_infos(root_path: str, version: str, out_dir: str):
    try:
        from nuscenes.nuscenes import NuScenes
        from nuscenes.can_bus.can_bus_api import NuScenesCanBus
        from nuscenes.utils import splits
    except ImportError as e:  # pragma: no cover
        raise SystemExit(
            "nuscenes devkit is required for data conversion: pip install "
            "nuscenes-devkit (not available in this environment)") from e

    nusc = NuScenes(version=version, dataroot=root_path, verbose=True)
    can_bus = NuScenesCanBus(dataroot=root_path)

    def get_can_bus(sample):
        # reference nuscenes_converter.py:153-175
        scene_name = nusc.get("scene", sample["scene_token"])["name"]
        ts = sample["timestamp"]
        try:
            pose_list = can_bus.get_messages(scene_name, "pose")
        except Exception:
            return np.zeros(18, np.float32)
        last = None
        for pose in pose_list:
            if pose["utime"] > ts:
                break
            last = pose
        if last is None:
            return np.zeros(18, np.float32)
        rec = []
        rec.extend(last["pos"])
        rec.extend(last["orientation"])
        rec.extend(last["accel"])
        rec.extend(last["rotation_rate"])
        rec.extend(last["vel"])
        rec.extend([0.0, 0.0])
        return np.asarray(rec, np.float32)

    infos = []
    for sample in nusc.sample:
        lidar = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
        cs = nusc.get("calibrated_sensor", lidar["calibrated_sensor_token"])
        pose = nusc.get("ego_pose", lidar["ego_pose_token"])
        scene = nusc.get("scene", sample["scene_token"])
        log = nusc.get("log", scene["log_token"])
        info = dict(
            token=sample["token"],
            scene_token=sample["scene_token"],
            scene_name=scene["name"],
            map_location=log["location"],
            timestamp=sample["timestamp"],
            can_bus=get_can_bus(sample),
            lidar2ego_translation=cs["translation"],
            lidar2ego_rotation=cs["rotation"],
            ego2global_translation=pose["translation"],
            ego2global_rotation=pose["rotation"],
            cams={},
        )
        for cam in CAMS:
            sd = nusc.get("sample_data", sample["data"][cam])
            ccs = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
            cpose = nusc.get("ego_pose", sd["ego_pose_token"])
            # sensor->lidar at the lidar timestamp (converter obtain_sensor2top)
            import numpy.linalg as la

            def rt(rot, tr):
                from apollo_vision_net_tpu.data.infos import quat_to_rot
                m = np.eye(4)
                m[:3, :3] = quat_to_rot(rot)
                m[:3, 3] = tr
                return m

            l2e = rt(cs["rotation"], cs["translation"])
            e2g = rt(pose["rotation"], pose["translation"])
            c2e = rt(ccs["rotation"], ccs["translation"])
            ce2g = rt(cpose["rotation"], cpose["translation"])
            cam2lidar = la.inv(l2e) @ la.inv(e2g) @ ce2g @ c2e
            info["cams"][cam] = dict(
                data_path=sd["filename"],
                cam_intrinsic=np.asarray(ccs["camera_intrinsic"]),
                sensor2lidar_rotation=cam2lidar[:3, :3],
                sensor2lidar_translation=cam2lidar[:3, 3],
            )
        anns = [nusc.get("sample_annotation", t) for t in sample["anns"]]
        boxes = nusc.get_boxes(sample["data"]["LIDAR_TOP"])
        gt = []
        names = []
        vels = []
        valid = []
        from apollo_vision_net_tpu.data.infos import DETECTION_NAME_MAP
        for ann, box in zip(anns, boxes):
            if ann["category_name"] not in DETECTION_NAME_MAP:
                continue
            l2e_m = np.eye(4)
            from apollo_vision_net_tpu.data.infos import quat_to_rot
            l2e_m[:3, :3] = quat_to_rot(cs["rotation"])
            l2e_m[:3, 3] = cs["translation"]
            e2g_m = np.eye(4)
            e2g_m[:3, :3] = quat_to_rot(pose["rotation"])
            e2g_m[:3, 3] = pose["translation"]
            g2l = np.linalg.inv(e2g_m @ l2e_m)
            c = g2l[:3, :3] @ box.center + g2l[:3, 3]
            yaw = box.orientation.yaw_pitch_roll[0] - np.arctan2(
                e2g_m[1, 0], e2g_m[0, 0])
            gt.append([c[0], c[1], c[2] - box.wlh[2] / 2,
                       box.wlh[0], box.wlh[1], box.wlh[2], yaw])
            names.append(DETECTION_NAME_MAP[ann["category_name"]])
            v = nusc.box_velocity(ann["token"])[:2]
            vels.append(np.nan_to_num(v))
            valid.append(ann["num_lidar_pts"] + ann["num_radar_pts"] > 0)
        info["gt_boxes"] = np.asarray(gt, np.float32).reshape(-1, 7)
        info["gt_names"] = np.asarray(names)
        info["gt_velocity"] = np.asarray(vels, np.float32).reshape(-1, 2)
        info["valid_flag"] = np.asarray(valid, bool)
        infos.append(info)

    train_scenes = set(splits.train if "trainval" in version else splits.mini_train)
    train = [i for i in infos
             if nusc.get("scene", i["scene_token"])["name"] in train_scenes]
    val = [i for i in infos
           if nusc.get("scene", i["scene_token"])["name"] not in train_scenes]
    os.makedirs(out_dir, exist_ok=True)
    for split, data in (("train", train), ("val", val)):
        out = os.path.join(out_dir, f"nuscenes_infos_temporal_{split}.pkl")
        with open(out, "wb") as f:
            pickle.dump({"infos": data, "metadata": {"version": version}}, f)
        print(f"wrote {len(data)} infos to {out}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("dataset", choices=["nuscenes"])
    p.add_argument("--root-path", required=True)
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--out-dir", required=True)
    a = p.parse_args()
    create_nuscenes_infos(a.root_path, a.version, a.out_dir)
