"""Offline converter suite: KITTI infos / GT database / Lyft / Waymo /
ScanNet — all driven end-to-end on synthetic on-disk datasets.

Parity targets: tools/data_converter/{kitti_converter,kitti_data_utils,
create_gt_database,lyft_converter,waymo_converter,indoor_converter,
scannet_data_utils}.py.
"""
import os
import pickle
import struct
import zlib

import numpy as np
import pytest

from apollo_vision_net_tpu.data import kitti as K
from apollo_vision_net_tpu.data.gt_database import create_groundtruth_database
from apollo_vision_net_tpu.data.indoor import (
    ScanNetSegData, create_indoor_info_file)
from apollo_vision_net_tpu.data.lyft import fill_trainval_infos
from apollo_vision_net_tpu.data.waymo import T_FRONT_CAM_TO_REF, convert_frame

pytestmark = pytest.mark.quick  # numpy/interpret tier, no big jit graphs


def _png_bytes(h, w):
    """Minimal valid PNG (8-bit gray, zlib-deflated rows)."""
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(typ, data):
        c = struct.pack(">I", len(data)) + typ + data
        return c + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x80" * w for _ in range(h))
    return (sig + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


# -------------------------------------------------------------- synthetic

_CALIB_TXT = """P0: 700 0 320 0 0 700 240 0 0 0 1 0
P1: 700 0 320 0 0 700 240 0 0 0 1 0
P2: 700 0 320 44.8 0 700 240 0.2 0 0 1 0.003
P3: 700 0 320 0 0 700 240 0 0 0 1 0
R0_rect: 1 0 0 0 1 0 0 0 1
Tr_velo_to_cam: 0 -1 0 0 0 0 -1 -0.08 1 0 0 -0.27
Tr_imu_to_velo: 1 0 0 0 0 1 0 0 0 0 1 0
"""

# one Car 10m ahead (velodyne x=10 -> camera z~10), one DontCare
_LABEL_TXT = """Car 0.00 0 1.57 300 180 360 260 1.60 1.70 4.00 0.10 1.57 9.73 1.57
DontCare -1 -1 -10 500 170 590 190 -1 -1 -1 -1000 -1000 -1000 -10
"""


def _make_kitti(root, idxs=(0, 1), with_test=True):
    for split in ("training", "testing"):
        for sub in ("image_2", "velodyne", "calib", "label_2"):
            os.makedirs(os.path.join(root, split, sub), exist_ok=True)
    os.makedirs(os.path.join(root, "ImageSets"), exist_ok=True)
    rng = np.random.default_rng(0)
    for i in idxs:
        s = f"{i:06d}"
        for split in ("training",) + (("testing",) if with_test else ()):
            with open(os.path.join(
                    root, split, "image_2", s + ".png"), "wb") as f:
                f.write(_png_bytes(480, 640))
            with open(os.path.join(
                    root, split, "calib", s + ".txt"), "w") as f:
                f.write(_CALIB_TXT)
        with open(os.path.join(
                root, "training", "label_2", s + ".txt"), "w") as f:
            f.write(_LABEL_TXT)
        # points: 30 inside the Car box (velodyne ~(10, -0.1)), 50 around
        inside = np.column_stack([
            rng.uniform(9.0, 10.9, 30), rng.uniform(-0.75, 0.55, 30),
            rng.uniform(-1.55, -0.2, 30), np.ones(30)]).astype(np.float32)
        outside = np.column_stack([
            rng.uniform(20, 60, 50), rng.uniform(-8, 8, 50),
            rng.uniform(-1.5, 1.5, 50), np.ones(50)]).astype(np.float32)
        pts = np.concatenate([inside, outside])
        for split in ("training",) + (("testing",) if with_test else ()):
            pts.tofile(os.path.join(root, split, "velodyne", s + ".bin"))
    with open(os.path.join(root, "ImageSets", "train.txt"), "w") as f:
        f.write("\n".join(f"{i:06d}"[-6:].lstrip("0") or "0"
                          for i in idxs[:1]) + "\n")
    with open(os.path.join(root, "ImageSets", "val.txt"), "w") as f:
        f.write("\n".join(str(i) for i in idxs[1:]) + "\n")
    with open(os.path.join(root, "ImageSets", "test.txt"), "w") as f:
        f.write("0\n" if with_test else "")


# ------------------------------------------------------------------ kitti

def test_kitti_geometry_points_in_rbbox():
    # axis-aligned box at origin rotated 90°: x extent becomes w
    boxes = np.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, np.pi / 2]])
    pts = np.array([
        [0.9, 0.0, 0.5],    # inside (|ly|=0.9 < l/2=2 after rotation)
        [0.0, 1.9, 0.5],    # inside (|lx|=1.9 < 2)
        [1.2, 0.0, 0.5],    # outside (w/2 = 1)
        [0.0, 0.0, 1.6],    # above
        [0.0, 0.0, -0.1],   # below bottom
    ])
    got = K.points_in_rbbox(pts, boxes)[:, 0]
    assert got.tolist() == [True, True, False, False, False]


def test_kitti_box_camera_to_lidar_roundtrip():
    calib = {}
    for ln in _CALIB_TXT.splitlines():
        pass
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(_CALIB_TXT)
        path = f.name
    calib = K.parse_calib_file(path)
    os.unlink(path)
    box_cam = np.array([[0.1, 1.57, 9.73, 4.0, 1.6, 1.7, 1.57]])
    box_l = K.box_camera_to_lidar(
        box_cam, calib["R0_rect"], calib["Tr_velo_to_cam"])
    # velodyne frame: x forward ~ camera z + 0.27
    assert abs(box_l[0, 0] - 10.0) < 1e-6
    assert abs(box_l[0, 2] - (-1.65)) < 1e-6  # bottom center height
    assert box_l.shape == (1, 7)
    # dims reorder lhw -> l w h
    assert np.allclose(box_l[0, 3:6], [4.0, 1.7, 1.6])


def test_kitti_create_infos(tmp_path):
    root = str(tmp_path / "kitti")
    _make_kitti(root)
    paths = K.create_kitti_infos(root, save_path=root)
    with open(paths["train"], "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 1
    info = infos[0]
    assert info["image"]["image_shape"].tolist() == [480, 640]
    assert info["calib"]["P2"].shape == (4, 4)
    annos = info["annos"]
    assert list(annos["name"]) == ["Car", "DontCare"]
    # 30 synthetic points lie inside the Car box; DontCare rows get -1
    assert annos["num_points_in_gt"][0] == 30
    assert annos["num_points_in_gt"][1] == -1
    # difficulty: height 80px, occ 0, trunc 0 -> easy (0); DontCare -> -1
    assert annos["difficulty"][0] == 0
    assert annos["difficulty"][1] == -1
    with open(paths["trainval"], "rb") as f:
        assert len(pickle.load(f)) == 2
    with open(paths["test"], "rb") as f:
        test_infos = pickle.load(f)
    assert "annos" not in test_infos[0]

    # reduced point cloud keeps only front-camera-visible points
    K.create_reduced_point_cloud(root)
    red = np.fromfile(os.path.join(
        root, "training", "velodyne_reduced", "000000.bin"),
        np.float32).reshape(-1, 4)
    full = np.fromfile(os.path.join(
        root, "training", "velodyne", "000000.bin"),
        np.float32).reshape(-1, 4)
    assert 0 < len(red) <= len(full)
    assert (red[:, 0] > 0).all()  # all in front of the camera

    # 2D export round-trips through json
    jpath = K.export_2d_annotation(root, paths["train"])
    import json
    with open(jpath) as f:
        coco = json.load(f)
    assert len(coco["images"]) == 1
    assert len(coco["annotations"]) == 1  # DontCare skipped
    assert coco["annotations"][0]["bbox"] == [300.0, 180.0, 60.0, 80.0]


def test_gt_database(tmp_path):
    root = str(tmp_path / "kitti")
    _make_kitti(root)
    paths = K.create_kitti_infos(root, save_path=root)
    db = create_groundtruth_database("kitti", root, paths["train"], "kitti")
    assert set(db) == {"Car"}
    rec = db["Car"][0]
    assert rec["num_points_in_gt"] == 30
    assert rec["box3d_lidar"].shape == (7,)
    bin_path = os.path.join(root, rec["path"])
    pts = np.fromfile(bin_path, np.float32).reshape(-1, 4)
    assert len(pts) == 30
    # stored relative to box center: recentered near origin
    assert np.abs(pts[:, :2]).max() < 3.0
    with open(os.path.join(root, "kitti_dbinfos_train.pkl"), "rb") as f:
        assert set(pickle.load(f)) == {"Car"}


# ------------------------------------------------------------------- lyft

class _Box:
    def __init__(self, center, wlh, yaw, name):
        self.center = np.asarray(center)
        self.wlh = np.asarray(wlh)
        self.name = name

        class _O:
            yaw_pitch_roll = (yaw, 0.0, 0.0)
        self.orientation = _O()


class _FakeLyft:
    """Duck-typed lyft devkit: 1 scene, 2 samples, 1 camera."""

    def __init__(self, tmp):
        self.tmp = tmp
        q_id = [1.0, 0.0, 0.0, 0.0]
        self._tables = {
            ("calibrated_sensor", "cs_lidar"): {
                "translation": [0, 0, 1.8], "rotation": q_id,
                "camera_intrinsic": []},
            ("calibrated_sensor", "cs_cam"): {
                "translation": [1.5, 0, 1.6], "rotation": q_id,
                "camera_intrinsic": [[700, 0, 320], [0, 700, 240], [0, 0, 1]]},
            ("ego_pose", "ep0"): {
                "translation": [100, 50, 0], "rotation": q_id,
                "timestamp": 1000},
            ("sample_data", "sd_lidar0"): {
                "calibrated_sensor_token": "cs_lidar",
                "ego_pose_token": "ep0", "timestamp": 1000, "prev": ""},
            ("sample_data", "sd_cam0"): {
                "calibrated_sensor_token": "cs_cam",
                "ego_pose_token": "ep0", "timestamp": 1001, "prev": ""},
            ("sample_annotation", "ann0"): {
                "num_lidar_pts": 12, "num_radar_pts": 3},
        }
        self.sample = [{
            "token": "s0", "scene_token": "sc0", "timestamp": 1000,
            "data": {"LIDAR_TOP": "sd_lidar0", "CAM_FRONT": "sd_cam0"},
            "anns": ["ann0"],
        }]
        self.scene = [{"token": "sc0"}]

    def get(self, table, token):
        if table == "scene":
            return {"name": "scene-0001", "token": token}
        return self._tables[(table, token)]

    def get_sample_data_path(self, token):
        return os.path.join(self.tmp, token + ".bin")

    def get_sample_data(self, token):
        boxes = [_Box([5.0, 1.0, 0.5], [2.0, 4.5, 1.7], 0.3, "car")]
        if token == "sd_cam0":
            return (self.get_sample_data_path(token), boxes,
                    np.array([[700, 0, 320], [0, 700, 240], [0, 0, 1]]))
        return self.get_sample_data_path(token), boxes, None


def test_lyft_fill_infos(tmp_path):
    lyft = _FakeLyft(str(tmp_path))
    train, val = fill_trainval_infos(lyft, {"sc0"}, set(), max_sweeps=2)
    assert len(train) == 1 and len(val) == 0
    info = train[0]
    assert info["token"] == "s0"
    assert "CAM_FRONT" in info["cams"]
    cam = info["cams"]["CAM_FRONT"]
    # identity rotations: cam->lidar = cam2ego - lidar2ego
    assert np.allclose(cam["sensor2lidar_translation"], [1.5, 0, -0.2])
    assert np.allclose(cam["sensor2lidar_rotation"], np.eye(3))
    # SECOND yaw convention
    assert np.allclose(info["gt_boxes"][0, 6], -0.3 - np.pi / 2)
    assert info["gt_names"][0] == "car"
    assert info["num_lidar_pts"][0] == 12


# ------------------------------------------------------------------ waymo

def test_waymo_convert_frame(tmp_path):
    save = str(tmp_path / "waymo_kitti")
    cam_extrinsic = np.eye(4)
    cam_extrinsic[:3, 3] = [1.5, 0.0, 2.0]  # camera 1.5m ahead of vehicle
    frame = {
        "timestamp_micros": 123456,
        "pose": np.eye(4),
        "images": {0: _png_bytes(8, 8)},
        "camera_calibs": {
            0: {"extrinsic": cam_extrinsic,
                "intrinsic": [2000.0, 2000.0, 960.0, 640.0]},
        },
        "points": np.random.default_rng(0).normal(
            size=(100, 6)).astype(np.float32),
        "laser_labels": [
            {"id": "obj1", "type": 1,  # VEHICLE
             "center": (10.0, 2.0, 1.0), "size": (4.5, 2.0, 1.8),
             "heading": 0.5, "num_lidar_points_in_box": 50,
             "camera_name": 0, "bbox": (100.0, 200.0, 300.0, 400.0)},
            {"id": "obj2", "type": 3,  # SIGN -> filtered
             "center": (5.0, 0.0, 2.0), "size": (0.5, 0.5, 1.0),
             "heading": 0.0, "num_lidar_points_in_box": 5,
             "camera_name": None, "bbox": None},
            {"id": "obj3", "type": 2,  # PEDESTRIAN, zero points -> filtered
             "center": (3.0, 1.0, 0.5), "size": (0.6, 0.6, 1.7),
             "heading": 0.0, "num_lidar_points_in_box": 0,
             "camera_name": None, "bbox": None},
        ],
    }
    out = convert_frame(frame, save, prefix=0, file_idx=1, frame_idx=5)
    assert os.path.exists(out["velodyne"])
    assert os.path.exists(out["image_0"])

    # calib parses back through the KITTI parser
    calib = K.parse_calib_file(out["calib"])
    assert calib["P0"][0, 0] == 2000.0
    # velo->cam = ref_rot @ inv(cam2vehicle)
    t = calib["Tr_velo_to_cam_0"]
    expect = np.eye(4)
    expect[:3, :3] = T_FRONT_CAM_TO_REF
    expect = expect @ np.linalg.inv(cam_extrinsic)
    assert np.allclose(t[:3], expect[:3], atol=1e-6)

    # labels: only the VEHICLE survives; parses through the KITTI parser
    annos = K.parse_label_file(out["label_all"])
    assert list(annos["name"]) == ["Car"]
    # location: vehicle frame (10, 2, 1-0.9) -> ref cam (-y, -z, x)
    assert np.allclose(annos["location"][0], [-2.0, -0.1 + 2.0, 8.5],
                       atol=0.01)
    # heading 0.5 (z-up) -> ry = -0.5 - pi/2
    assert abs(annos["rotation_y"][0] - (-0.5 - np.pi / 2)) < 0.01
    # dims parse back as lhw -> stored (l, h, w) = (4.5, 1.8, 2.0)
    assert np.allclose(annos["dimensions"][0], [4.5, 4.5, 1.8][0:3][0:1]
                       .__class__([4.5, 1.8, 2.0])[0:3]
                       if False else [4.5, 1.8, 2.0])


# ---------------------------------------------------------------- scannet

def test_scannet_converter(tmp_path):
    root = str(tmp_path / "scannet")
    inst = os.path.join(root, "scannet_instance_data")
    meta = os.path.join(root, "meta_data")
    os.makedirs(inst)
    os.makedirs(meta)
    rng = np.random.default_rng(0)
    scans = ["scene0000_00", "scene0001_00"]
    for scan in scans:
        n = 500
        np.save(os.path.join(inst, f"{scan}_vert.npy"),
                rng.normal(size=(n, 6)).astype(np.float32))
        np.save(os.path.join(inst, f"{scan}_ins_label.npy"),
                rng.integers(0, 5, n))
        np.save(os.path.join(inst, f"{scan}_sem_label.npy"),
                rng.choice([1, 3, 4, 39], n))
        # 2 boxes: nyu40 ids 4 (bed), 39 (garbagebin)
        boxes = np.array([
            [0, 0, 0.5, 2.0, 1.5, 0.6, 4],
            [1, 1, 0.2, 0.4, 0.4, 0.5, 39],
        ], np.float64)
        np.save(os.path.join(inst, f"{scan}_aligned_bbox.npy"), boxes)
        np.save(os.path.join(inst, f"{scan}_unaligned_bbox.npy"), boxes)
        np.save(os.path.join(inst, f"{scan}_axis_align_matrix.npy"),
                np.eye(4))
    with open(os.path.join(meta, "scannetv2_train.txt"), "w") as f:
        f.write("\n".join(scans[:1]) + "\n")
    with open(os.path.join(meta, "scannetv2_val.txt"), "w") as f:
        f.write("\n".join(scans[1:]) + "\n")

    written = create_indoor_info_file(root, "scannet")
    with open(written["train"], "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 1
    annos = infos[0]["annos"]
    assert annos["gt_num"] == 2
    assert list(annos["name"]) == ["bed", "garbagebin"]
    assert annos["gt_boxes_upright_depth"].shape == (2, 6)
    # points + masks dumped as bins
    pts = np.fromfile(os.path.join(
        root, infos[0]["pts_path"]), np.float32).reshape(-1, 6)
    assert pts.shape[0] == 500
    # seg info artifacts
    seg = ScanNetSegData(root, written["train"], "train")
    scene_idxs, weights = seg.get_scene_idxs_and_label_weight()
    assert weights.shape == (20,)
    assert np.isfinite(weights).all()
    assert os.path.exists(os.path.join(
        root, "seg_info", "train_resampled_scene_idxs.npy"))
