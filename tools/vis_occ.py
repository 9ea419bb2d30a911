#!/usr/bin/env python
"""Occupancy visualization (reference tools/occ_visualization analog):
renders a dense/sparse semantic voxel grid as a BEV class map + per-z-slice
montage PNG (matplotlib; no open3d in this environment)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def render_occ(dense: np.ndarray, dims, empty_label: int, out_path: str):
    """dense: (z*y*x,) labels in (z, y, x) order (x minor — the
    reference layout, convert_lidar_pcd_to_occ.py:122)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xdim, ydim, zdim = dims
    grid = dense.reshape(zdim, ydim, xdim).astype(np.int32)
    occ = np.where(grid == empty_label, -1, grid)

    # BEV: highest occupied voxel's class per (y, x)
    occupied = occ >= 0
    top_z = np.where(occupied.any(0), occupied[::-1].argmax(0), -1)
    bev = np.full((ydim, xdim), -1, np.int32)
    has = top_z >= 0
    zsel = (zdim - 1 - top_z)[has]
    ys, xs = np.where(has)
    bev[ys, xs] = occ[zsel, ys, xs]

    n_slices = min(zdim, 8)
    fig, axes = plt.subplots(1, 1 + n_slices, figsize=(3 * (1 + n_slices), 3))
    cmap = plt.get_cmap("tab20")
    axes[0].imshow(np.ma.masked_less(bev, 0), cmap=cmap, vmin=0, vmax=19)
    axes[0].set_title("BEV (top voxel class)")
    step = max(zdim // n_slices, 1)
    for i in range(n_slices):
        z = i * step
        axes[1 + i].imshow(np.ma.masked_less(occ[z], 0), cmap=cmap,
                           vmin=0, vmax=19)
        axes[1 + i].set_title(f"z={z}")
    for ax in axes:
        ax.axis("off")
    fig.savefig(out_path, dpi=110, bbox_inches="tight")
    print(f"wrote {out_path}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("occ", help=".npy dense (voxels,) or sparse (n,2) labels")
    p.add_argument("--dims", nargs=3, type=int, default=[200, 200, 16],
                   help="xdim ydim zdim")
    p.add_argument("--empty-label", type=int, default=16)
    p.add_argument("--out", default="occ.png")
    args = p.parse_args()
    arr = np.load(args.occ)
    if arr.ndim == 2 and arr.shape[1] == 2:
        from apollo_vision_net_tpu.data.semantic_kitti import sparse_to_dense

        arr = sparse_to_dense(
            arr, int(np.prod(args.dims)), args.empty_label)
    render_occ(arr, tuple(args.dims), args.empty_label, args.out)


if __name__ == "__main__":
    main()
