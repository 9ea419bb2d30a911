#!/usr/bin/env python
"""Evaluation CLI (reference tools/test.py analog): streaming stateful
inference over a dataset + det/map/occ evaluators."""
import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--data", default="synthetic",
                   choices=["synthetic", "nuscenes"])
    p.add_argument("--infos", default="",
                   help="nuscenes infos pkl (tools/create_data.py output)")
    p.add_argument("--data-root", default="")
    p.add_argument("--img-scale", type=float, default=0.5)
    p.add_argument("--num-frames", type=int, default=20,
                   help="frames to evaluate (0 = whole split)")
    p.add_argument("--eval", nargs="+", default=["bbox"],
                   choices=["bbox", "chamfer", "iou"])
    p.add_argument("--out", default=None)
    p.add_argument("--dump-results", default=None,
                   help="write raw det/map results (nuscmap_results-style "
                        "JSON) for offline re-evaluation")
    p.add_argument("--dump-pickle", default=None,
                   help="pickle the raw det/map/occ result records + GT "
                        "(consumed by tools/vis_bev.py / "
                        "tools/project_det_map_to_pv.py)")
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from apollo_vision_net_tpu import configs
    from apollo_vision_net_tpu.data.synthetic import make_batch
    from apollo_vision_net_tpu.parallel.train import build_model, init_state
    from apollo_vision_net_tpu.runtime.checkpoint import CheckpointManager
    from apollo_vision_net_tpu.runtime.inference import (
        evaluate_results,
        run_streaming_eval,
    )

    cfg = getattr(configs, args.config)()
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, 1, seed=0))
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    if args.checkpoint:
        state, _ = CheckpointManager(args.checkpoint).restore(state)
    model = build_model(cfg)

    if args.data == "synthetic":
        frames = []
        gt = {"det": [], "map": []}
        from apollo_vision_net_tpu.evaluation import formatting

        for i in range(args.num_frames):
            b = make_batch(cfg, 1, seed=i)
            frames.append(dict(
                img=b["img"][0, -1], can_bus=b["can_bus"][0, -1],
                lidar2img=b["lidar2img"][0, -1],
                scene_token=f"scene{i // 10}",
            ))
            gt["det"].append(formatting.gt_to_sample_record(
                b["gt_boxes"][0], b["gt_labels"][0], b["gt_mask"][0]))
            if cfg.model.with_map:
                # unpack the padded map GT back into per-vector polylines
                # (order 0 of the shift protocol = the canonical ordering)
                mask = b["map_mask"][0]
                gt["map"].append({
                    "vectors": [b["map_shift_pts"][0][v, 0]
                                for v in range(len(mask)) if mask[v]],
                    "labels": b["map_labels"][0][mask],
                })
        results = run_streaming_eval(cfg, model, state.params, frames)
        metrics = evaluate_results(cfg, results, gt)
    else:
        # streaming eval over the real split in scene-contiguous order
        # (reference tools/test.py:314-359: custom_multi_gpu_test ->
        # dataset.evaluate / evaluate_map / evaluate_occ_iou)
        if not args.infos:
            raise SystemExit("--data nuscenes requires --infos <pkl>")
        from apollo_vision_net_tpu.data import infos as infos_lib
        from apollo_vision_net_tpu.data.nuscenes_dataset import (
            NuScenesTemporalDataset, scene_contiguous_eval_indices)
        from apollo_vision_net_tpu.evaluation import formatting

        ds = NuScenesTemporalDataset(
            cfg, args.infos, data_root=args.data_root, training=False,
            img_scale=args.img_scale)
        idxs = scene_contiguous_eval_indices(ds.infos, 1, 0)
        if args.num_frames:
            idxs = idxs[: args.num_frames]
        frames = []
        gt = {"det": [], "map": [], "occ": [] if "iou" in args.eval else None}
        for i in idxs:
            f = ds.get_frame(i)
            info = ds.infos[i]
            l2g = infos_lib.lidar2global(info)
            frames.append(dict(
                img=f["img"], can_bus=f["can_bus"],
                lidar2img=f["lidar2img"], scene_token=f["scene_token"],
                lidar2global=l2g,
            ))
            gt["det"].append(formatting.gt_to_sample_record(
                f["gt_boxes"], f["gt_labels"], f["gt_mask"], l2g))
            if cfg.model.with_map:
                gt["map"].append({
                    "vectors": [np.asarray(v, np.float32)
                                for v in info.get("map_vectors", [])],
                    "labels": np.asarray(
                        info.get("map_labels", []), np.int32),
                })
            if gt["occ"] is not None and "gt_occupancy" in f:
                gt["occ"].append(f["gt_occupancy"])
        results = run_streaming_eval(cfg, model, state.params, frames)
        if gt["occ"] is not None and not gt["occ"]:
            gt["occ"] = None
        metrics = evaluate_results(cfg, results, gt)
        if args.dump_results:
            from apollo_vision_net_tpu.evaluation.formatting import (
                dump_results_json)
            dump_results_json(results, args.dump_results)

    if args.dump_pickle:
        import pickle

        with open(args.dump_pickle, "wb") as f:
            pickle.dump({**results, "gt": gt}, f)
    print(json.dumps({k: round(float(v), 5) for k, v in metrics.items()},
                     indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({k: float(v) for k, v in metrics.items()}, f)


if __name__ == "__main__":
    main()
