#!/usr/bin/env python
"""BEV detection + map visualization (reference analysis_tools/
vis_det_bev_single.py + vis_map_pred_single.py analog): renders boxes and
vector-map polylines in BEV to a PNG."""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MAP_COLORS = {0: "tab:orange", 1: "tab:blue", 2: "tab:green",
              3: "tab:purple"}


def render_bev(det=None, map_res=None, gt_boxes=None, pc_range=(-50, -50, -5,
               50, 50, 3), out_path="bev.png", score_thr=0.3):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Polygon

    fig, ax = plt.subplots(figsize=(8, 8))
    ax.set_xlim(pc_range[0], pc_range[3])
    ax.set_ylim(pc_range[1], pc_range[4])
    ax.set_aspect("equal")
    ax.plot(0, 0, marker="^", color="k", markersize=10)

    def box_corners(b):
        cx, cy, w, l, yaw = b[0], b[1], b[3], b[4], b[6]
        dx, dy = l / 2, w / 2
        pts = np.array([[-dx, -dy], [-dx, dy], [dx, dy], [dx, -dy]])
        c, s = np.cos(yaw), np.sin(yaw)
        rot = pts @ np.array([[c, s], [-s, c]])
        return rot + [cx, cy]

    if gt_boxes is not None:
        for b in np.asarray(gt_boxes):
            ax.add_patch(Polygon(box_corners(b), fill=False,
                                 edgecolor="gray", lw=1.0, ls="--"))
    if det is not None:
        if "boxes" in det:
            boxes = np.asarray(det["boxes"])
        else:
            # evaluator record format (formatting.detections_to_sample_
            # record): translation/size/yaw columns -> 9-dim boxes
            t = np.asarray(det["translation"])
            sz = np.asarray(det["size"])
            yaw = np.asarray(det["yaw"])[:, None]
            boxes = np.concatenate([t, sz, yaw], axis=1)
        scores = np.asarray(det["scores"])
        keep = scores > score_thr
        if "valid" in det:
            keep &= np.asarray(det["valid"])
        for b, s in zip(boxes[keep], scores[keep]):
            ax.add_patch(Polygon(box_corners(b), fill=False,
                                 edgecolor="red", lw=1.2))
    if map_res is not None:
        vectors = np.asarray(map_res["vectors"])
        scores = np.asarray(map_res["scores"])
        labels = np.asarray(map_res["labels"])
        for v, s, l in zip(vectors, scores, labels):
            if s < score_thr:
                continue
            ax.plot(v[:, 0], v[:, 1], color=MAP_COLORS.get(int(l), "k"),
                    lw=1.5, alpha=0.9)
    ax.set_title("BEV det (red) / GT (gray) / map vectors")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    print(f"wrote {out_path}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("results", help="pickle with det/map result records")
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--out", default="bev.png")
    p.add_argument("--score-thr", type=float, default=0.3)
    args = p.parse_args()
    with open(args.results, "rb") as f:
        res = pickle.load(f)
    det = res.get("det", [None] * (args.index + 1))[args.index]
    map_res = res.get("map", [None] * (args.index + 1))
    map_res = map_res[args.index] if map_res else None
    render_bev(det=det, map_res=map_res, out_path=args.out,
               score_thr=args.score_thr)


if __name__ == "__main__":
    main()
