#!/usr/bin/env python
"""Sequence BEV det+map visualization (reference
tools/analysis_tools/seq_det_map_vis.py analog): renders every frame of a
``tools/test.py --dump-pickle`` result stream as a BEV overlay PNG
(boxes + map polylines + GT), and optionally stitches an animated GIF —
the temporal eye for streaming inference (queue replay / scene resets
show up as frame-to-frame jumps here first)."""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.vis_bev import render_bev


def main():
    p = argparse.ArgumentParser()
    p.add_argument("results", help="tools/test.py --dump-pickle file")
    p.add_argument("--out-dir", default="/tmp/seq_vis")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--gif", action="store_true",
                   help="also write <out-dir>/seq.gif")
    args = p.parse_args()

    with open(args.results, "rb") as f:
        res = pickle.load(f)
    dets = res.get("det", [])
    maps = res.get("map", [])
    gt = res.get("gt") or {}
    n = len(dets) or len(maps)
    if args.max_frames:
        n = min(n, args.max_frames)
    os.makedirs(args.out_dir, exist_ok=True)

    paths = []
    for i in range(n):
        det = dets[i] if i < len(dets) else None
        mp = maps[i] if i < len(maps) else None
        gt_boxes = None
        gt_det = (gt.get("det") or [])
        if i < len(gt_det) and gt_det[i] is not None:
            r = gt_det[i]
            if "translation" in r:
                gt_boxes = np.concatenate(
                    [np.asarray(r["translation"]),
                     np.asarray(r["size"]),
                     np.asarray(r["yaw"])[:, None]], axis=1)
        out = os.path.join(args.out_dir, f"{i:04d}.png")
        render_bev(det=det, map_res=mp, gt_boxes=gt_boxes,
                   out_path=out, score_thr=args.score_thr)
        paths.append(out)

    if args.gif and paths:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.animation import FuncAnimation, PillowWriter

        first = plt.imread(paths[0])
        fig, ax = plt.subplots(
            figsize=(first.shape[1] / 100, first.shape[0] / 100))
        ax.axis("off")
        im = ax.imshow(first)

        def draw(i):
            im.set_data(plt.imread(paths[i]))
            return (im,)

        anim = FuncAnimation(fig, draw, frames=len(paths))
        gif = os.path.join(args.out_dir, "seq.gif")
        anim.save(gif, writer=PillowWriter(fps=2))
        print(f"wrote {gif} ({len(paths)} frames)")


if __name__ == "__main__":
    main()
