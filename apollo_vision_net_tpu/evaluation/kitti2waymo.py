"""KITTI-format predictions → Waymo evaluation format.

Parity: core/evaluation/kitti2waymo.py (KITTI2Waymo) — per instance:
bottom-center → true-center (y -= h/2 in the y-down camera frame), KITTI
reference-camera → Waymo vehicle frame via
``T_k2w = T_front_cam_to_vehicle @ T_ref_to_front_cam`` (:71-74, :185),
heading = −(rotation_y + π/2) wrapped to (−π, π] (:132-136), class map
Car/Pedestrian/Sign/Cyclist → Waymo types 1/2/3/4 (:64-69).

TPU-native split: the conversion math is pure numpy here (testable without
any Waymo dependency); serialization to ``metrics_pb2.Objects`` .bin files
needs the waymo-open-dataset wheel and is import-gated in
``write_waymo_bin`` — exactly like the reference's module-level gate, but
without taking tensorflow down with it.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

# waymo_open_dataset label_pb2.Label enum values
K2W_CLASS_MAP = {"Car": 1, "Pedestrian": 2, "Sign": 3, "Cyclist": 4}

# KITTI reference cam (x right, y down, z fwd) -> Waymo front cam
# (x fwd, y left, z up), reference :71-74
T_REF_TO_FRONT_CAM = np.array([
    [0.0, 0.0, 1.0, 0.0],
    [-1.0, 0.0, 0.0, 0.0],
    [0.0, -1.0, 0.0, 0.0],
    [0.0, 0.0, 0.0, 1.0],
])


def wrap_heading(h: float) -> float:
    """Wrap to (-π, π] with the reference's while-loop semantics."""
    while h < -np.pi:
        h += 2 * np.pi
    while h > np.pi:
        h -= 2 * np.pi
    return h


def kitti_instance_to_waymo(
    location: np.ndarray,      # (3,) bottom center, KITTI cam frame
    dimensions: np.ndarray,    # (3,) (l, h, w) — KITTI result convention
    rotation_y: float,
    score: float,
    name: str,
    T_front_cam_to_vehicle: np.ndarray,  # (4, 4)
) -> Dict:
    """One KITTI box → Waymo object dict (:105-155)."""
    length, height, width = (float(v) for v in dimensions)
    x, y, z = (float(v) for v in location)
    y -= height / 2.0  # bottom center -> true center (y points down)
    T_k2w = np.asarray(T_front_cam_to_vehicle) @ T_REF_TO_FRONT_CAM
    pt = T_k2w @ np.array([x, y, z, 1.0])
    heading = wrap_heading(-(float(rotation_y) + np.pi / 2.0))
    return dict(
        center_x=round(float(pt[0]), 4),
        center_y=round(float(pt[1]), 4),
        center_z=round(float(pt[2]), 4),
        length=round(length, 4),
        width=round(width, 4),
        height=round(height, 4),
        heading=round(heading, 4),
        type=K2W_CLASS_MAP.get(str(name), 0),
        score=round(float(score), 4),
    )


def convert_frame(
    kitti_result: Dict,               # name/dimensions/location/rotation_y/score
    T_front_cam_to_vehicle: np.ndarray,
    context_name: str = "",
    frame_timestamp_micros: int = 0,
) -> List[Dict]:
    """All instances of one frame (reference parse_objects :89-163)."""
    out = []
    names = np.asarray(kitti_result["name"])
    for i in range(len(names)):
        obj = kitti_instance_to_waymo(
            np.asarray(kitti_result["location"])[i],
            np.asarray(kitti_result["dimensions"])[i],
            float(np.asarray(kitti_result["rotation_y"])[i]),
            float(np.asarray(kitti_result["score"])[i]),
            str(names[i]),
            T_front_cam_to_vehicle,
        )
        obj["context_name"] = context_name
        obj["frame_timestamp_micros"] = int(frame_timestamp_micros)
        out.append(obj)
    return out


def write_waymo_bin(objects: Sequence[Dict], path: str) -> None:
    """Serialize converted objects to a Waymo metrics_pb2 .bin file.

    Import-gated: needs the waymo-open-dataset wheel (not in the baked
    image); everything upstream of this call is dependency-free."""
    try:
        from waymo_open_dataset import label_pb2
        from waymo_open_dataset.protos import metrics_pb2
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "waymo-open-dataset is required to write .bin files; the "
            "dict-level conversion (convert_frame) works without it") from e

    combined = metrics_pb2.Objects()
    for od in objects:
        o = metrics_pb2.Object()
        box = label_pb2.Label.Box()
        box.center_x = od["center_x"]
        box.center_y = od["center_y"]
        box.center_z = od["center_z"]
        box.length = od["length"]
        box.width = od["width"]
        box.height = od["height"]
        box.heading = od["heading"]
        o.object.box.CopyFrom(box)
        o.object.type = od["type"]
        o.score = od["score"]
        o.context_name = od.get("context_name", "")
        o.frame_timestamp_micros = od.get("frame_timestamp_micros", 0)
        combined.objects.append(o)
    with open(path, "wb") as f:
        f.write(combined.SerializeToString())
