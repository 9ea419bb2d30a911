"""Sequence occ-GT converter: pose-chained sweep accumulation, dynamic
anti-ghosting, and voxel-morph closing (reference
tools/convert_lidar_pcd_sequence_to_occ.py:347-460, upgraded with ego-pose
compensation)."""
import importlib.util
import os

import numpy as np
import pytest

pytestmark = pytest.mark.quick  # numpy/interpret tier, no big jit graphs

_spec = importlib.util.spec_from_file_location(
    "convert_lidar_to_occ",
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "convert_lidar_to_occ.py"))
occ_tool = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(occ_tool)

PC = [-8.0, -8.0, -2.0, 8.0, 8.0, 2.0]
VS = [1.0, 1.0, 1.0]
DIMS = (16, 16, 4)
NC = 16


def _vox(pts):
    return occ_tool.voxelize_numpy(
        np.asarray(pts, np.float32), PC, VS, DIMS, NC, NC)


def test_sequence_union_vs_single_frame():
    """Two sweeps seeing different static structure: the aggregated GT is
    the union of what either sweep saw (after pose chaining), strictly
    more occupied than the center sweep alone."""
    # frame 0 (center): a wall at x=2..3
    f0 = np.array([[2.5, y, 0.5, 3] for y in np.linspace(-6, 6, 25)],
                  np.float32)
    # frame 1, taken 4 m behind (ego moved -4 in x): in FRAME-1 coords the
    # second wall at global x=-5 sits at x=-1
    f1 = np.array([[-1.0, y, 0.5, 4] for y in np.linspace(-6, 6, 25)],
                  np.float32)
    T0 = np.eye(4)
    T1 = np.eye(4)
    T1[0, 3] = -4.0  # frame-1 origin is 4 m behind frame 0 in global x

    pts = occ_tool.aggregate_sequence([f0, f1], [T0, T1], center_idx=0)
    dense_seq = _vox(pts)
    dense_single = _vox(f0)

    occ_seq = (dense_seq != NC).sum()
    occ_single = (dense_single != NC).sum()
    assert occ_seq > occ_single
    # the chained frame-1 wall lands at global x=-5 (frame-0 coords)
    xi = int((-5.0 - PC[0]) / VS[0])
    grid = dense_seq.reshape(DIMS[2], DIMS[1], DIMS[0])  # (z, y, x)
    assert (grid[2, :, xi] == 4).any()
    # and every center-frame voxel survives aggregation unchanged
    keep = dense_single != NC
    np.testing.assert_array_equal(dense_seq[keep], dense_single[keep])


def test_dynamic_classes_kept_center_only():
    """Dynamic-class points from non-center sweeps are dropped (the
    anti-ghosting rule); the center frame's dynamic points survive."""
    car0 = np.array([[1.5, 1.5, 0.5, 5]], np.float32)   # center frame car
    car1 = np.array([[4.5, 4.5, 0.5, 5]], np.float32)   # stale car pos
    pts = occ_tool.aggregate_sequence(
        [car0, car1], [np.eye(4), np.eye(4)], center_idx=0,
        dynamic_classes=[5])
    dense = _vox(pts)
    grid = dense.reshape(DIMS[2], DIMS[1], DIMS[0])  # (z, y, x)
    assert grid[2, 9, 9] == 5        # (1.5+8)/1 = 9 — center car kept
    assert (grid[:, 12, 12] == NC).all()  # ghost car dropped


def test_voxel_morph_closing_fills_holes():
    """A 1-voxel gap inside a solid wall closes; original classes kept,
    filled voxels get the fallback class; nothing is removed."""
    ys = [y for y in range(-6, 7) if y != 0]
    wall = np.array([[0.5, y + 0.5, 0.5, 3] for y in ys], np.float32)
    dense = _vox(wall)
    closed = occ_tool.morph_close_dense(dense, DIMS, NC, radius=1)
    grid0 = dense.reshape(DIMS[2], DIMS[1], DIMS[0])  # (z, y, x)
    grid1 = closed.reshape(DIMS[2], DIMS[1], DIMS[0])
    yi, xi = 8, 8  # the (0.5, 0.5) gap cell
    assert grid0[2, yi, xi] == NC
    assert grid1[2, yi, xi] == NC - 1       # filled with fallback class
    keep = grid0 != NC
    np.testing.assert_array_equal(grid1[keep], grid0[keep])
