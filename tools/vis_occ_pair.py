#!/usr/bin/env python
"""Occupancy GT vs prediction pair renderer (reference
tools/occ_visualization/vis_occ_pair_single.py + visualize_occ_gt.py
analog; create_video_gt_pred_rgb.py's video mode becomes --gif — this
environment has no mayavi/ffmpeg, so rendering is matplotlib voxel
projections instead of a 3D scene).

Consumes the ``tools/test.py --dump-pickle`` record: ``{"occ": [dense
(voxel_num,) class grids per frame], "gt": {"occ": [...]}, ...}`` or two
raw .npy grids. Renders, per frame:

  [ GT BEV top-class | Pred BEV top-class | agreement map ]

where the agreement map colours each BEV cell green (both occupied, same
class), yellow (both occupied, class differs), red (false occupied),
blue (missed). ``--gif`` stitches all frames into an animated GIF.
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _bev_top_class(dense: np.ndarray, dims, empty_label: int) -> np.ndarray:
    """(voxel_num,) labels in (z, y, x) order (x minor — the reference
    layout) -> (y, x) top-voxel class, -1 where the column is empty
    (matches tools/vis_occ.py)."""
    xdim, ydim, zdim = dims
    grid = dense.reshape(zdim, ydim, xdim).astype(np.int32)
    occ = np.where(grid == empty_label, -1, grid)
    occupied = occ >= 0
    top_z = np.where(occupied.any(0), occupied[::-1].argmax(0), -1)
    bev = np.full((ydim, xdim), -1, np.int32)
    has = top_z >= 0
    zsel = (zdim - 1 - top_z)[has]
    ys, xs = np.where(has)
    bev[ys, xs] = occ[zsel, ys, xs]
    return bev


def render_pair(gt_bev, pred_bev, out_path=None, title="", fig=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.colors import ListedColormap

    if fig is None:
        fig = plt.figure(figsize=(12, 4.2))
    axes = fig.subplots(1, 3)
    cmap = plt.get_cmap("tab20")
    for ax, bev, name in ((axes[0], gt_bev, "GT"),
                          (axes[1], pred_bev, "Pred")):
        ax.imshow(np.ma.masked_less(bev, 0), cmap=cmap, vmin=0, vmax=19)
        ax.set_title(f"{name} (top voxel class)")

    # agreement: 0 empty/empty, 1 match, 2 class-mismatch, 3 false-occ,
    # 4 missed
    agree = np.zeros(gt_bev.shape, np.int32)
    g, p = gt_bev >= 0, pred_bev >= 0
    agree[g & p & (gt_bev == pred_bev)] = 1
    agree[g & p & (gt_bev != pred_bev)] = 2
    agree[~g & p] = 3
    agree[g & ~p] = 4
    acmap = ListedColormap(
        ["white", "tab:green", "gold", "tab:red", "tab:blue"])
    axes[2].imshow(agree, cmap=acmap, vmin=0, vmax=4)
    axes[2].set_title("agreement (G=match Y=class R=FP B=miss)")
    for ax in axes:
        ax.axis("off")
    if title:
        fig.suptitle(title)
    if out_path:
        fig.savefig(out_path, dpi=110, bbox_inches="tight")
        print(f"wrote {out_path}")
    return fig


def main():
    p = argparse.ArgumentParser()
    p.add_argument("results",
                   help="tools/test.py --dump-pickle file, or a pred .npy "
                        "dense grid (then --gt is required)")
    p.add_argument("--gt", default=None, help=".npy GT grid (npy mode)")
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--dims", nargs=3, type=int, default=None,
                   help="xdim ydim zdim (default: inferred square x=y)")
    p.add_argument("--empty-label", type=int, default=None,
                   help="default: max label in the GT grid")
    p.add_argument("--out", default="occ_pair.png")
    p.add_argument("--gif", action="store_true",
                   help="render every frame into an animated GIF at --out")
    args = p.parse_args()

    if args.results.endswith(".npy"):
        if not args.gt:
            raise SystemExit(".npy mode requires --gt")
        preds = [np.load(args.results)]
        gts = [np.load(args.gt)]
    else:
        with open(args.results, "rb") as f:
            res = pickle.load(f)
        preds = [np.asarray(o).reshape(-1) for o in res.get("occ", [])]
        gts = [np.asarray(o).reshape(-1)
               for o in (res.get("gt") or {}).get("occ", [])]
        if not preds or not gts:
            raise SystemExit("results pickle has no occ preds + GT "
                             "(run tools/test.py --eval iou --dump-pickle)")

    empty = (args.empty_label if args.empty_label is not None
             else int(max(g.max() for g in gts)))
    if args.dims:
        dims = tuple(args.dims)
    else:  # assume square BEV, z = what's left
        n = preds[0].size
        xy = int(np.sqrt(n))
        while n % (xy * xy) and xy > 1:
            xy -= 1
        dims = (xy, xy, n // (xy * xy))

    if not args.gif:
        i = args.index
        render_pair(_bev_top_class(gts[i], dims, empty),
                    _bev_top_class(preds[i], dims, empty),
                    out_path=args.out, title=f"frame {i}")
        return

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation, PillowWriter

    fig = plt.figure(figsize=(12, 4.2))
    n = min(len(preds), len(gts))

    def draw(i):
        fig.clear()
        render_pair(_bev_top_class(gts[i], dims, empty),
                    _bev_top_class(preds[i], dims, empty),
                    title=f"frame {i}", fig=fig)

    anim = FuncAnimation(fig, draw, frames=n)
    out = args.out if args.out.endswith(".gif") else args.out + ".gif"
    anim.save(out, writer=PillowWriter(fps=2))
    print(f"wrote {out} ({n} frames)")


if __name__ == "__main__":
    main()
