"""KITTI→Waymo conversion math (reference core/evaluation/kitti2waymo.py)."""
import numpy as np
import pytest

from apollo_vision_net_tpu.evaluation.kitti2waymo import (
    T_REF_TO_FRONT_CAM,
    convert_frame,
    kitti_instance_to_waymo,
    wrap_heading,
)


pytestmark = pytest.mark.quick  # numpy/interpret tier, no big jit graphs


def test_frame_transform_identity_extrinsic():
    # front cam == vehicle frame: kitti cam (x right, y down, z fwd) maps to
    # waymo (x fwd, y left, z up): (xk, yk, zk) -> (zk, -xk, -yk)
    obj = kitti_instance_to_waymo(
        location=np.array([1.0, 2.0, 10.0]),   # bottom center
        dimensions=np.array([4.0, 2.0, 1.8]),  # l, h, w
        rotation_y=0.0, score=0.9, name="Car",
        T_front_cam_to_vehicle=np.eye(4),
    )
    # y center = 2 - h/2 = 1
    assert obj["center_x"] == pytest.approx(10.0)
    assert obj["center_y"] == pytest.approx(-1.0)
    assert obj["center_z"] == pytest.approx(-1.0)
    assert (obj["length"], obj["width"], obj["height"]) == (4.0, 1.8, 2.0)
    assert obj["heading"] == pytest.approx(-np.pi / 2, abs=1e-4)
    assert obj["type"] == 1 and obj["score"] == pytest.approx(0.9)


def test_heading_wrap():
    assert wrap_heading(3 * np.pi / 2) == pytest.approx(-np.pi / 2, abs=1e-4)
    assert wrap_heading(-3 * np.pi / 2) == pytest.approx(np.pi / 2, abs=1e-4)
    # rotation_y = pi -> heading = -(3pi/2) -> wraps to +pi/2
    obj = kitti_instance_to_waymo(
        np.zeros(3), np.ones(3), np.pi, 1.0, "Cyclist", np.eye(4))
    assert obj["heading"] == pytest.approx(np.pi / 2, abs=1e-4)
    assert obj["type"] == 4


def test_driver_pairing_parallel_convert_roundtrip(tmp_path):
    """End-to-end driver (reference KITTI2Waymo :40-250): filename-key
    pairing, empty objects for unmatched frames, per-frame files + a
    combined output that parses back to the full objects list."""
    import json

    from apollo_vision_net_tpu.evaluation.kitti2waymo import (
        KittiToWaymoConverter,
    )

    def result(sample_key, n, name="Car"):
        return dict(
            sample_idx=np.array([sample_key] * n),
            name=np.array([name] * n),
            location=np.tile([[0.0, 1.0, 5.0]], (n, 1)),
            dimensions=np.tile([[4.0, 2.0, 1.8]], (n, 1)),
            rotation_y=np.zeros(n),
            score=np.linspace(0.9, 0.5, n),
        )

    results = [result("val000000", 2), result("val000001", 1),
               result("val999999", 3)]  # last one matches no frame
    T = np.eye(4)
    T[0, 3] = 1.5
    frames = [
        dict(filename="val000000", context_name="c0",
             frame_timestamp_micros=10, T_front_cam_to_vehicle=T),
        dict(filename="val000001", context_name="c1",
             frame_timestamp_micros=11, T_front_cam_to_vehicle=T),
        dict(filename="val000002", context_name="c2",  # no predictions

             frame_timestamp_micros=12, T_front_cam_to_vehicle=T),
    ]
    conv = KittiToWaymoConverter(results, workers=4)
    out_dir = str(tmp_path / "waymo_out")
    combined = conv.convert(frames, save_dir=out_dir)
    assert len(combined) == 3  # 2 + 1; unmatched frame contributes none
    assert {o["context_name"] for o in combined} == {"c0", "c1"}
    assert combined[0]["center_x"] == pytest.approx(5.0 + 1.5)

    # per-frame artifacts: the no-prediction frame exists and is empty
    empty = json.load(open(f"{out_dir}/val000002.json"))
    assert empty == []
    parsed = json.load(open(f"{out_dir}/combined.json"))
    assert parsed == combined
    # scores/ordering survive the round trip
    assert [o["score"] for o in parsed[:2]] == [0.9, 0.5]


def test_nontrivial_extrinsic_and_frame():
    # front cam mounted 2 m forward of vehicle origin
    T = np.eye(4)
    T[0, 3] = 2.0
    res = dict(
        name=np.array(["Car", "Pedestrian"]),
        location=np.array([[0.0, 0.0, 5.0], [1.0, 1.0, 8.0]]),
        dimensions=np.array([[4.0, 2.0, 1.8], [0.8, 1.7, 0.6]]),
        rotation_y=np.array([0.0, 0.5]),
        score=np.array([0.8, 0.6]),
    )
    objs = convert_frame(res, T, context_name="ctx", frame_timestamp_micros=7)
    assert len(objs) == 2
    assert objs[0]["center_x"] == pytest.approx(5.0 + 2.0)
    assert objs[1]["type"] == 2
    assert all(o["context_name"] == "ctx" for o in objs)
    assert all(o["frame_timestamp_micros"] == 7 for o in objs)
