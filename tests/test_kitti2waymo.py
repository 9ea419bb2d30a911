"""KITTI→Waymo conversion math (reference core/evaluation/kitti2waymo.py)."""
import numpy as np
import pytest

from apollo_vision_net_tpu.evaluation.kitti2waymo import (
    T_REF_TO_FRONT_CAM,
    convert_frame,
    kitti_instance_to_waymo,
    wrap_heading,
)


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
