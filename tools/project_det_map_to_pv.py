#!/usr/bin/env python
"""Project detections + map vectors into the camera images (perspective
view) and write a PNG grid — the debugging eye for camera geometry.

Reference analog: tools/analysis_tools/project_det_map_to_pv_single.py
(:40-200: box corners + polyline points through lidar2img, z-clip,
per-camera draw).

Usage:
  python tools/project_det_map_to_pv.py --config bev_smoke_det_map \
      [--results res.pkl --index 0] [--out pv.png]
With --results, boxes/vectors come from the pickle (tools/test.py
--dump-pickle layout); without, the (untrained) model runs one synthetic
frame end-to-end so the full geometry path is exercised.
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MAP_COLORS = {0: "tab:orange", 1: "tab:blue", 2: "tab:green", 3: "tab:purple"}


def box_corners_3d(b: np.ndarray) -> np.ndarray:
    """(9,) box -> (8, 3) corners; gravity-center box, yaw about z."""
    cx, cy, cz, w, l, h, yaw = b[0], b[1], b[2], b[3], b[4], b[5], b[6]
    xs = np.array([-1, -1, 1, 1, -1, -1, 1, 1]) * (l / 2)
    ys = np.array([-1, 1, 1, -1, -1, 1, 1, -1]) * (w / 2)
    zs = np.array([-1, -1, -1, -1, 1, 1, 1, 1]) * (h / 2)
    c, s = np.cos(yaw), np.sin(yaw)
    x = xs * c - ys * s + cx
    y = xs * s + ys * c + cy
    return np.stack([x, y, zs + cz], axis=1)


_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
          (0, 4), (1, 5), (2, 6), (3, 7)]


def project(pts3d: np.ndarray, l2i: np.ndarray, eps: float = 1e-3):
    """(N, 3) lidar pts -> (N, 2) pixels + (N,) in-front mask."""
    hom = np.concatenate([pts3d, np.ones((len(pts3d), 1))], axis=1)
    cam = hom @ l2i.T
    depth = cam[:, 2]
    front = depth > eps
    px = cam[:, :2] / np.maximum(depth[:, None], eps)
    return px, front


def draw_frame(imgs, lidar2img, det=None, map_res=None, gt_boxes=None,
               out_path="pv.png", score_thr=0.3):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    N = len(imgs)
    cols = min(N, 3)
    rows = (N + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(5 * cols, 3.4 * rows))
    axes = np.atleast_1d(axes).reshape(-1)
    H, W = imgs[0].shape[:2]
    for n in range(N):
        ax = axes[n]
        im = imgs[n]
        im = (im - im.min()) / max(im.max() - im.min(), 1e-6)
        ax.imshow(im)
        ax.set_xlim(0, W)
        ax.set_ylim(H, 0)
        ax.set_title(f"cam {n}", fontsize=8)
        ax.axis("off")

        def draw_boxes(boxes, color, lw):
            for b in boxes:
                px, front = project(box_corners_3d(np.asarray(b)),
                                    lidar2img[n])
                if front.sum() < 2:
                    continue
                for i, j in _EDGES:
                    if front[i] and front[j]:
                        ax.plot([px[i, 0], px[j, 0]], [px[i, 1], px[j, 1]],
                                color=color, lw=lw)

        if gt_boxes is not None:
            draw_boxes(np.asarray(gt_boxes), "white", 0.8)
        if det is not None:
            if "boxes" in det:
                boxes = np.asarray(det["boxes"])
            else:  # evaluator record format: rebuild 9-dim boxes
                boxes = np.concatenate(
                    [np.asarray(det["translation"]),
                     np.asarray(det["size"]),
                     np.asarray(det["yaw"])[:, None]], axis=1)
            keep = np.asarray(det["scores"]) > score_thr
            if "valid" in det:
                keep &= np.asarray(det["valid"], bool)
            draw_boxes(boxes[keep], "red", 1.0)
        if map_res is not None:
            for v, s, lab in zip(np.asarray(map_res["vectors"]),
                                 np.asarray(map_res["scores"]),
                                 np.asarray(map_res["labels"])):
                if s < score_thr:
                    continue
                pts3 = np.concatenate(
                    [v, np.zeros((len(v), 1))], axis=1)  # map on z=0
                px, front = project(pts3, lidar2img[n])
                seg = np.where(front)[0]
                if len(seg) >= 2:
                    ax.plot(px[front, 0], px[front, 1],
                            color=MAP_COLORS.get(int(lab), "k"), lw=1.2)
    for k in range(N, len(axes)):
        axes[k].axis("off")
    fig.savefig(out_path, dpi=110, bbox_inches="tight")
    print(f"wrote {out_path}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="bev_smoke_det_map")
    p.add_argument("--results", default=None,
                   help="pickle with det/map records (else run the model)")
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--out", default="pv.png")
    p.add_argument("--score-thr", type=float, default=0.3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from apollo_vision_net_tpu import configs as cfglib
    from apollo_vision_net_tpu.data.synthetic import make_batch

    cfg = getattr(cfglib, args.config)()
    batch = make_batch(cfg, batch_size=1, seed=0)
    imgs = batch["img"][0, -1]
    l2i = batch["lidar2img"][0, -1]
    gt = batch["gt_boxes"][0][batch["gt_mask"][0]]

    det = map_res = None
    if args.results:
        with open(args.results, "rb") as f:
            res = pickle.load(f)
        det = res.get("det", [None] * (args.index + 1))[args.index]
        mr = res.get("map") or []
        map_res = mr[args.index] if args.index < len(mr) else None
    else:
        from apollo_vision_net_tpu.models.detector import BEVFormer
        from apollo_vision_net_tpu.parallel.train import (
            build_model, init_state,
        )
        from apollo_vision_net_tpu.utils.box_coder import nms_free_decode

        jb = jax.tree.map(jnp.asarray, batch)
        state = init_state(cfg, jax.random.PRNGKey(0), jb)
        model = build_model(cfg)
        outs = jax.jit(lambda p, b: model.apply(
            {"params": p}, b["img"], b["can_bus"], b["lidar2img"],
            b["has_prev"], deterministic=True))(state.params, jb)
        d = nms_free_decode(
            outs["all_cls_scores"][-1, 0], outs["all_bbox_preds"][-1, 0],
            (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0), max_num=50,
            num_classes=cfg.model.num_classes)
        det = dict(boxes=np.asarray(d.boxes), scores=np.asarray(d.scores),
                   valid=np.asarray(d.valid))
        if "map_all_cls_scores" in outs:
            from apollo_vision_net_tpu.models.heads.map_head import (
                get_map_results,
            )

            mr = get_map_results(outs["map_all_cls_scores"][-1],
                                 outs["map_all_pts_preds"][-1],
                                 cfg.model.pc_range)
            map_res = dict(vectors=np.asarray(mr["vectors"][0]),
                           scores=np.asarray(mr["scores"][0]),
                           labels=np.asarray(mr["labels"][0]))
        args.score_thr = -1.0  # untrained scores are tiny; show everything

    draw_frame(imgs, l2i, det=det, map_res=map_res, gt_boxes=gt,
               out_path=args.out, score_thr=args.score_thr)


if __name__ == "__main__":
    main()
