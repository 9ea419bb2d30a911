"""Result formatting: model outputs → evaluator/JSON records.

Parity: the reference's `format_results`/`_format_bbox` path (upstream
BEVFormer convention wrapped by datasets/nuscenes_dataset.py:283-340):
boxes to global frame via ego pose, velocity-based default attributes, and
the MapTR `nuscmap_results.json` layout
(nuscenes_det_occ_map_dataset.py:733-807).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from apollo_vision_net_tpu.data.infos import quat_to_rot

DETECTION_CLASSES = (
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
)

DEFAULT_ATTR = {
    "car": "vehicle.parked", "pedestrian": "pedestrian.standing",
    "trailer": "vehicle.parked", "truck": "vehicle.parked",
    "bus": "vehicle.stopped", "motorcycle": "cycle.without_rider",
    "construction_vehicle": "vehicle.parked", "bicycle": "cycle.without_rider",
    "barrier": "", "traffic_cone": "",
}


def default_attribute(name: str, velocity_xy: np.ndarray) -> str:
    """Velocity-thresholded default attribute (upstream _format_bbox)."""
    if np.linalg.norm(velocity_xy) > 0.2:
        if name in ("car", "construction_vehicle", "bus", "truck", "trailer"):
            return "vehicle.moving"
        if name in ("bicycle", "motorcycle"):
            return "cycle.with_rider"
        if name == "pedestrian":
            return "pedestrian.moving"
    return DEFAULT_ATTR.get(name, "")


def detections_to_sample_record(
    boxes: np.ndarray,    # (N, 9) lidar frame (cx,cy,cz,w,l,h,yaw,vx,vy)
    scores: np.ndarray,
    labels: np.ndarray,
    valid: np.ndarray,
    lidar2global: Optional[np.ndarray] = None,  # 4x4; None keeps lidar frame
    class_names: Sequence[str] = DETECTION_CLASSES,
) -> Dict[str, np.ndarray]:
    """One sample's detections in the evaluator's record format."""
    keep = np.asarray(valid, bool)
    b = np.asarray(boxes)[keep]
    s = np.asarray(scores)[keep]
    l = np.asarray(labels)[keep]
    centers = b[:, :3]
    yaw = b[:, 6]
    vel = b[:, 7:9] if b.shape[1] > 7 else np.zeros((len(b), 2))
    if lidar2global is not None:
        r = lidar2global[:3, :3]
        centers = centers @ r.T + lidar2global[:3, 3]
        yaw = yaw + np.arctan2(r[1, 0], r[0, 0])
        vel = vel @ r[:2, :2].T
    names = np.array([class_names[i] for i in l])
    return dict(
        names=names,
        translation=centers,
        size=b[:, 3:6],
        yaw=yaw,
        velocity=vel,
        scores=s,
        attrs=np.array([default_attribute(n, v)
                        for n, v in zip(names, vel)]),
        ego_translation=(
            lidar2global[:3, 3] if lidar2global is not None else np.zeros(3)),
    )


def gt_to_sample_record(
    gt_boxes: np.ndarray, gt_labels: np.ndarray, gt_mask: np.ndarray,
    lidar2global: Optional[np.ndarray] = None,
    class_names: Sequence[str] = DETECTION_CLASSES,
    gt_attrs: Optional[Sequence[str]] = None,
) -> Dict[str, np.ndarray]:
    rec = detections_to_sample_record(
        gt_boxes, np.ones(len(gt_boxes)), gt_labels, gt_mask, lidar2global,
        class_names)
    rec.pop("scores")
    if gt_attrs is not None:
        rec["attrs"] = np.asarray(gt_attrs)[np.asarray(gt_mask, bool)]
    return rec


def map_results_record(vectors, scores, labels,
                       score_threshold: float = 0.0) -> dict:
    """MapTR nuscmap_results entry: vectors in meters + scores + labels
    (det_map head get_map_results :970-1005)."""
    return dict(
        vectors=np.asarray(vectors),
        scores=np.asarray(scores),
        labels=np.asarray(labels),
        valid=np.asarray(scores) > score_threshold,
    )
