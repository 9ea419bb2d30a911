"""Overfit-to-metric training proof.

Trains a config on a FIXED small synthetic set and evaluates real metrics
(det mAP/NDS, map chamfer mAP, occ mIoU) on that same set — the in-env
stand-in for the reference's epoch-1 smoke protocol (README.md §6.1),
demanding a nonzero metric instead of a loss ratio: if the full
train/decode/evaluate loop cannot overfit 4 samples, training is broken
somewhere a loss curve won't show.

Usage:
  python tools/overfit_check.py [config] --steps 300 [--assert]
  # writes loss curve jsonl + final metrics to --out (default /tmp/overfit)

Reference protocol anchors: det NDS via the nuScenes protocol
(evaluation/nuscenes_det.py), map via MapTR chamfer AP
(evaluation/map_eval.py), occ via SSCMetrics.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    # the axon TPU plugin ignores the env var; the config update is what
    # actually pins the platform (same pattern as tests/conftest.py)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def evaluate_overfit(cfg, model, params, batch):
    """Deterministic forward on the overfit batch -> real metrics."""
    from apollo_vision_net_tpu.evaluation import formatting
    from apollo_vision_net_tpu.evaluation.map_eval import evaluate_map
    from apollo_vision_net_tpu.evaluation.nuscenes_det import (
        evaluate_detection,
    )
    from apollo_vision_net_tpu.utils.box_coder import nms_free_decode

    m = cfg.model
    outs = jax.jit(
        lambda p, b: model.apply(
            {"params": p}, b["img"], b["can_bus"], b["lidar2img"],
            b["has_prev"], deterministic=True)
    )(params, batch)
    B = batch["img"].shape[0]
    metrics = {}

    gt_recs, det_recs = [], []
    cls_scores = np.asarray(outs["all_cls_scores"][-1], np.float32)
    bbox_preds = np.asarray(outs["all_bbox_preds"][-1], np.float32)
    for b in range(B):
        det = nms_free_decode(
            jnp.asarray(cls_scores[b]), jnp.asarray(bbox_preds[b]),
            (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0), max_num=100,
            num_classes=m.num_classes,
        )
        det_recs.append(formatting.detections_to_sample_record(
            np.asarray(det.boxes), np.asarray(det.scores),
            np.asarray(det.labels), np.asarray(det.valid)))
        gt_recs.append(formatting.gt_to_sample_record(
            np.asarray(batch["gt_boxes"][b]),
            np.asarray(batch["gt_labels"][b]),
            np.asarray(batch["gt_mask"][b])))
    metrics.update(evaluate_detection(gt_recs, det_recs))

    if "map_all_cls_scores" in outs:
        from apollo_vision_net_tpu.models.heads.map_head import (
            get_map_results,
        )

        mr = get_map_results(
            outs["map_all_cls_scores"][-1], outs["map_all_pts_preds"][-1],
            m.pc_range)
        results, anns = [], []
        for b in range(B):
            results.append(formatting.map_results_record(
                np.asarray(mr["vectors"][b]), np.asarray(mr["scores"][b]),
                np.asarray(mr["labels"][b]), 0.0))
            mask = np.asarray(batch["map_mask"][b], bool)
            # shift order 0 is the original point order, in meters
            anns.append(dict(
                vectors=[np.asarray(batch["map_shift_pts"][b, v, 0])
                         for v in np.where(mask)[0]],
                labels=np.asarray(batch["map_labels"][b])[mask],
            ))
        metrics.update(evaluate_map(results, anns, metrics=("chamfer",)))

    if "occupancy_preds" in outs and outs.get("occupancy_preds") is not None:
        from apollo_vision_net_tpu.evaluation.ssc_metrics import SSCMetrics
        from apollo_vision_net_tpu.models.heads.occ_head import (
            occupancy_prediction,
        )

        pred = np.asarray(occupancy_prediction(
            outs["occupancy_preds"],
            occ_loss_type="focal_loss"
            if m.occ_loss_type == "CustomFocalLoss" else m.occ_loss_type))
        gt = np.asarray(batch["gt_occupancy"])
        if gt.ndim == 3:  # multi-frame supervision: score the last frame
            gt = gt[:, -1]
        ssc = SSCMetrics(n_classes=m.occupancy_classes + 1,
                         point_cloud_range=m.pc_range)
        for b in range(pred.shape[0]):
            ssc.add_batch(pred[b], gt[b])
        s = ssc.get_stats()
        metrics["occ_iou"] = float(s["iou"])
        metrics["occ_miou"] = float(s["miou"])
    return metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="bev_smoke_det_map")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--lr", type=float, default=4e-4)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--out", default="/tmp/overfit")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--assert", dest="check", action="store_true",
                    help="fail unless det mAP > 0.5 (and map/occ analogs)")
    args = ap.parse_args()

    from apollo_vision_net_tpu import configs as cfglib
    from apollo_vision_net_tpu.data.synthetic import make_batch
    from apollo_vision_net_tpu.parallel import train as train_lib
    from apollo_vision_net_tpu.parallel.mesh import (
        make_mesh, shard_batch_pytree,
    )

    cfg = getattr(cfglib, args.config)()
    cfg = dataclasses.replace(cfg, optim=dataclasses.replace(
        cfg.optim, lr=args.lr, warmup_iters=max(args.steps // 10, 10),
        total_steps=args.steps))

    n_dev = len(jax.devices())
    dp = 1
    for c in range(min(n_dev, args.batch_size), 0, -1):
        if args.batch_size % c == 0 and n_dev % c == 0:
            dp = c
            break
    mesh = make_mesh(dp=dp, sp=1, devices=jax.devices()[:dp])

    # paint_gt: GT cues rendered into the images so the set is LEARNABLE
    # (perception, not noise-memorization) — see data/synthetic.py
    batch = jax.tree.map(
        jnp.asarray,
        make_batch(cfg, args.batch_size, seed=args.seed, paint_gt=True))
    state = train_lib.init_state(cfg, jax.random.PRNGKey(args.seed), batch)
    model = train_lib.build_model(cfg)
    step = train_lib.make_jitted_train_step(mesh, cfg)
    sbatch = shard_batch_pytree(mesh, batch)
    rng = jax.random.PRNGKey(args.seed + 1)

    os.makedirs(args.out, exist_ok=True)
    log_path = os.path.join(args.out, f"{args.config}_overfit.jsonl")
    log = open(log_path, "w")
    curves = []
    for i in range(args.steps):
        state, losses = step(state, sbatch, rng)
        if i % 10 == 0 or i == args.steps - 1:
            rec = {"step": i, **{k: float(v) for k, v in losses.items()}}
            curves.append(rec)
            log.write(json.dumps(rec) + "\n")
            log.flush()
            if i % 50 == 0:
                print(f"step {i}: loss_total={rec['loss_total']:.4f}",
                      flush=True)
        if args.eval_every and i and i % args.eval_every == 0:
            mid = evaluate_overfit(cfg, model, state.params, batch)
            print(f"step {i}: " + json.dumps(
                {k: round(v, 4) for k, v in mid.items()
                 if k in ("mean_ap", "NDS", "NuscMap_chamfer/mAP",
                          "occ_iou", "occ_miou")}), flush=True)

    metrics = evaluate_overfit(cfg, model, state.params, batch)
    metrics["final_loss_total"] = curves[-1]["loss_total"]
    metrics["initial_loss_total"] = curves[0]["loss_total"]
    with open(os.path.join(args.out, f"{args.config}_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps({k: round(float(v), 4) for k, v in metrics.items()},
                     indent=1))

    if args.check:
        if "mean_ap" in metrics:
            assert metrics["mean_ap"] > 0.5, metrics["mean_ap"]
        if "NuscMap_chamfer/mAP" in metrics:
            assert metrics["NuscMap_chamfer/mAP"] > 0.5, metrics
        if "occ_miou" in metrics:
            # SSCMetrics reports PERCENT (x100). Geometric completion IoU
            # is the metric the r4 x/y-transpose fix (commit 25bf9d4) was
            # supposed to unblock — 1.48% is the degenerate
            # memorize-class-statistics level; demand real placement
            # (VERDICT r3 #6 / r4 next-round #2: >= 30%)
            assert metrics["occ_iou"] > 30.0, metrics
            assert metrics["occ_miou"] > 10.0, metrics
        print("overfit check PASSED")


if __name__ == "__main__":
    main()
