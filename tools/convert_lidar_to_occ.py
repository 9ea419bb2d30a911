#!/usr/bin/env python
"""Occupancy GT generation: labeled lidar points → dense/sparse voxel labels.

Parity: tools/convert_lidar_pcd_to_occ.py (+ sequence variant) — aggregates
labeled points into 0.5 m voxel labels, writes sparse (n, 2)
[voxel_index, class] npy files consumed by the training pipeline. Uses the
native majority-vote voxelizer (csrc/host_ops.cpp) with a numpy fallback.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def voxelize_numpy(points, pc_range, voxel_size, dims, num_classes,
                   empty_label):
    xdim, ydim, zdim = dims
    pc = np.asarray(pc_range)
    m = (
        (points[:, 0] >= pc[0]) & (points[:, 0] < pc[3])
        & (points[:, 1] >= pc[1]) & (points[:, 1] < pc[4])
        & (points[:, 2] >= pc[2]) & (points[:, 2] < pc[5])
        & (points[:, 3] >= 0) & (points[:, 3] < num_classes)
    )
    p = points[m]
    xi = ((p[:, 0] - pc[0]) / voxel_size[0]).astype(np.int64)
    yi = ((p[:, 1] - pc[1]) / voxel_size[1]).astype(np.int64)
    zi = ((p[:, 2] - pc[2]) / voxel_size[2]).astype(np.int64)
    vox = (zi * xdim + xi) * ydim + yi
    lab = p[:, 3].astype(np.int64)
    counts = np.zeros((zdim * xdim * ydim, num_classes), np.int32)
    np.add.at(counts, (vox, lab), 1)
    dense = np.full((zdim * xdim * ydim,), empty_label, np.int32)
    occupied = counts.sum(1) > 0
    dense[occupied] = counts[occupied].argmax(1)
    return dense


def main():
    p = argparse.ArgumentParser()
    p.add_argument("points", help=".npy (n,4) [x,y,z,label] labeled points")
    p.add_argument("out", help="output .npy sparse (n,2) [voxel_idx, class]")
    p.add_argument("--pc-range", nargs=6, type=float,
                   default=[-50.0, -50.0, -5.0, 50.0, 50.0, 3.0])
    p.add_argument("--voxel-size", nargs=3, type=float,
                   default=[0.5, 0.5, 0.5])
    p.add_argument("--num-classes", type=int, default=16)
    args = p.parse_args()

    pts = np.load(args.points).astype(np.float32)
    pc = args.pc_range
    vs = args.voxel_size
    dims = (
        int((pc[3] - pc[0]) / vs[0]),
        int((pc[4] - pc[1]) / vs[1]),
        int((pc[5] - pc[2]) / vs[2]),
    )
    from apollo_vision_net_tpu.data.native import voxelize_points

    dense = voxelize_points(pts, pc, vs, dims, args.num_classes,
                            args.num_classes)
    if dense is None:
        dense = voxelize_numpy(pts, pc, vs, dims, args.num_classes,
                               args.num_classes)
    from apollo_vision_net_tpu.data.semantic_kitti import dense_to_sparse

    sparse = dense_to_sparse(dense, args.num_classes)
    np.save(args.out, sparse)
    print(f"{sparse.shape[0]} occupied voxels -> {args.out}")


if __name__ == "__main__":
    main()
