"""Streaming inference + evaluation drivers.

Parity: bevformer/apis/test.py:44-209 (custom_multi_gpu_test — stateful
per-frame loop accumulating bbox/map/occ result lists) and tools/test.py.
The file-based rank gather is replaced by in-process accumulation (multihost
gather would use jax.experimental.multihost_utils.process_allgather).
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from apollo_vision_net_tpu.configs.base import ExperimentConfig
from apollo_vision_net_tpu.data.temporal import StreamingState
from apollo_vision_net_tpu.evaluation import formatting
from apollo_vision_net_tpu.evaluation.map_eval import evaluate_map
from apollo_vision_net_tpu.evaluation.nuscenes_det import evaluate_detection
from apollo_vision_net_tpu.evaluation.ssc_metrics import SSCMetrics
from apollo_vision_net_tpu.models.detector import BEVFormer
from apollo_vision_net_tpu.models.heads.occ_head import occupancy_prediction
from apollo_vision_net_tpu.utils.box_coder import nms_free_decode


def make_streaming_fn(cfg: ExperimentConfig, model, params):
    """Jitted single-frame inference: returns (outs, new_prev_bev).

    params bind via functools.partial over a jit ARGUMENT — closing over
    them would embed the weights as MLIR constants (~80 MB serialized for
    the flagship), slowing every remote compile."""
    def fn(p, img, can_bus, lidar2img, prev_bev, has_prev):
        return model.apply(
            {"params": p}, img, can_bus, lidar2img, prev_bev, has_prev,
            method=BEVFormer.forward_test_frame,
        )

    import functools

    return functools.partial(jax.jit(fn), params)


def run_streaming_eval(
    cfg: ExperimentConfig,
    model,
    params,
    frames: Iterable[dict],
    *,
    post_center_range=(-61.2, -61.2, -10.0, 61.2, 61.2, 10.0),
    max_dets: int = 300,
    map_score_threshold: float = 0.0,
) -> Dict[str, list]:
    """Stateful frame loop (scene reset + can_bus deltas handled by
    StreamingState). Each frame dict: img (N,H,W,3), can_bus (18,),
    lidar2img (N,4,4), scene_token, optional lidar2global + GT fields."""
    m = cfg.model
    step = make_streaming_fn(cfg, model, params)
    state = StreamingState()
    Q = m.bev_h * m.bev_w
    if m.with_occupancy is False and hasattr(model.head, "carry_width"):
        Q = model.head.carry_width
    prev = jnp.zeros((1, Q, m.embed_dims), jnp.float32)

    det_records, map_records, occ_preds = [], [], []
    for frame in frames:
        cb, has_prev = state.prepare_frame(frame["can_bus"],
                                           frame["scene_token"])
        outs, new_prev = step(
            jnp.asarray(frame["img"])[None],
            jnp.asarray(cb)[None],
            jnp.asarray(frame["lidar2img"])[None],
            prev,
            jnp.full((1,), has_prev, jnp.float32),
        )
        prev = new_prev
        state.update(new_prev)

        det = nms_free_decode(
            outs["all_cls_scores"][-1, 0], outs["all_bbox_preds"][-1, 0],
            post_center_range, max_num=max_dets,
            num_classes=m.num_classes,
        )
        det_records.append(formatting.detections_to_sample_record(
            np.asarray(det.boxes), np.asarray(det.scores),
            np.asarray(det.labels), np.asarray(det.valid),
            frame.get("lidar2global"),
        ))
        if "map_all_cls_scores" in outs:
            from apollo_vision_net_tpu.models.heads.map_head import (
                get_map_results,
            )

            mr = get_map_results(
                outs["map_all_cls_scores"][-1], outs["map_all_pts_preds"][-1],
                m.pc_range,
            )
            map_records.append(formatting.map_results_record(
                np.asarray(mr["vectors"][0]), np.asarray(mr["scores"][0]),
                np.asarray(mr["labels"][0]), map_score_threshold,
            ))
        if "occupancy_preds" in outs and outs["occupancy_preds"] is not None:
            occ_preds.append(np.asarray(occupancy_prediction(
                outs["occupancy_preds"],
                occ_loss_type=m.occ_loss_type
                if m.occ_loss_type != "CustomFocalLoss" else "focal_loss",
            )[0]))
    return {"det": det_records, "map": map_records, "occ": occ_preds}


def evaluate_results(
    cfg: ExperimentConfig,
    results: Dict[str, list],
    gt: Dict[str, list],
) -> Dict[str, float]:
    """Run all applicable evaluators (tools/test.py:336-359 analog)."""
    out: Dict[str, float] = {}
    if results["det"] and gt.get("det"):
        out.update(evaluate_detection(gt["det"], results["det"]))
    if results["map"] and gt.get("map"):
        out.update(evaluate_map(results["map"], gt["map"]))
    if results["occ"] and gt.get("occ") is not None:
        metrics = SSCMetrics(
            n_classes=cfg.model.occupancy_classes + 1,
            point_cloud_range=cfg.model.pc_range,
        )
        for pred, true in zip(results["occ"], gt["occ"]):
            metrics.add_batch(pred, true)
        s = metrics.get_stats()
        out["occ_iou"] = float(s["iou"])
        out["occ_miou"] = float(s["miou"])
    return out
