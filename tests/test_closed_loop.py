"""End-to-end closed loop on synthetic frames: streaming stateful inference
→ decode → evaluators (the analog of the reference's dist_test smoke loop,
SURVEY.md §4.6/§6)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from apollo_vision_net_tpu.configs import bev_smoke_det
from apollo_vision_net_tpu.data.synthetic import make_batch
from apollo_vision_net_tpu.evaluation import formatting
from apollo_vision_net_tpu.parallel.train import build_model, init_state
from apollo_vision_net_tpu.runtime.inference import (
    evaluate_results,
    run_streaming_eval,
)


def test_streaming_closed_loop():
    cfg = bev_smoke_det()
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, 1, seed=0))
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    model = build_model(cfg)
    frames, gt_det = [], []
    for i in range(4):
        b = make_batch(cfg, 1, seed=i)
        frames.append(dict(
            img=b["img"][0, -1], can_bus=b["can_bus"][0, -1],
            lidar2img=b["lidar2img"][0, -1], scene_token=f"s{i // 2}",
        ))
        gt_det.append(formatting.gt_to_sample_record(
            b["gt_boxes"][0], b["gt_labels"][0], b["gt_mask"][0]))
    results = run_streaming_eval(
        cfg, model, state.params, frames,
        post_center_range=(-61.2, -61.2, -10, 61.2, 61.2, 10),
    )
    assert len(results["det"]) == 4
    metrics = evaluate_results(cfg, results, {"det": gt_det})
    # untrained model: pipeline closure, not accuracy (reference README §6)
    assert "NDS" in metrics and "mean_ap" in metrics
    assert 0.0 <= metrics["NDS"] <= 1.0


def test_perfect_mock_predictions_score_high():
    """Feed GT back as predictions through the formatting+eval pipeline."""
    cfg = bev_smoke_det()
    gts, preds = [], []
    for i in range(3):
        b = make_batch(cfg, 1, seed=i)
        g = formatting.gt_to_sample_record(
            b["gt_boxes"][0], b["gt_labels"][0], b["gt_mask"][0])
        p = formatting.detections_to_sample_record(
            b["gt_boxes"][0], np.full(len(b["gt_boxes"][0]), 0.9),
            b["gt_labels"][0], b["gt_mask"][0])
        gts.append(g)
        preds.append(p)
    from apollo_vision_net_tpu.evaluation.nuscenes_det import (
        evaluate_detection,
    )

    present = sorted({str(n) for g in gts for n in g["names"]})
    out = evaluate_detection(gts, preds, class_names=present)
    assert out["mean_ap"] > 0.99
    assert out["NDS"] > 0.95
