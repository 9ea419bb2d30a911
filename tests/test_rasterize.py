"""Aux-seg GT rasterization (reference v2 head _draw_points_to_mask /
_build_pv_seg_targets, bevformer_det_map_head_apollo_v2.py:234-414):
known polylines rasterize to known cells."""
import numpy as np
import pytest

from apollo_vision_net_tpu.data.rasterize import (

    rasterize_lines_bev,
    rasterize_lines_pv,
)


pytestmark = pytest.mark.quick  # numpy/interpret tier, no big jit graphs


def test_bev_horizontal_line_exact_cells():
    # patch 30x30 m, 15x15 grid: y=0 line from x=-15..15 -> middle row
    line = np.array([[-15.0, 0.0], [15.0, 0.0]])
    mask = rasterize_lines_bev([line], 15, 15, (30.0, 30.0), radius=0)
    assert mask.shape == (15, 15)
    np.testing.assert_array_equal(mask[7], np.ones(15))
    assert mask.sum() == 15  # nothing outside the row


def test_bev_diagonal_and_radius_dilation():
    line = np.array([[-15.0, -15.0], [15.0, 15.0]])
    mask0 = rasterize_lines_bev([line], 15, 15, (30.0, 30.0), radius=0)
    np.testing.assert_array_equal(np.diag(mask0), np.ones(15))
    assert mask0.sum() == 15
    mask1 = rasterize_lines_bev([line], 15, 15, (30.0, 30.0), radius=1)
    # diagonal dilated by a 3x3 box: 15 + 2*14 off-diagonals + corners
    assert mask1.sum() > mask0.sum()
    assert mask1[0, 1] == 1.0 and mask1[1, 0] == 1.0
    assert mask1[0, 3] == 0.0


def test_bev_single_point_and_nonfinite_filtered():
    pt = np.array([[0.0, 0.0]])
    mask = rasterize_lines_bev([pt], 15, 15, (30.0, 30.0), radius=0)
    assert mask.sum() == 1 and mask[7, 7] == 1.0
    bad = np.array([[np.nan, 0.0], [np.inf, 1.0]])
    assert rasterize_lines_bev([bad], 15, 15, (30.0, 30.0)).sum() == 0


def test_pv_projection_known_cell():
    # pinhole camera looking down +x (lidar fwd): u = f*(-y)/x + cx
    f, cx, cy = 100.0, 48.0, 32.0
    P = np.array([
        [0.0, -f, 0.0, 0.0],
        [0.0, 0.0, -f, 0.0],
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ])
    P[0] += cx * P[2]
    P[1] += cy * P[2]
    # point 10 m ahead, centered: projects to (cx, cy)
    line = np.array([[10.0, 0.0], [10.0, 0.0]])
    mask = rasterize_lines_pv(
        [line], P[None], img_hw=(64, 96), feat_hw=(16, 24), radius=0)
    assert mask.shape == (1, 16, 24)
    gy = round(cy / 63 * 15)
    gx = round(cx / 95 * 23)
    assert mask[0, gy, gx] == 1.0
    assert mask.sum() == 1


def test_pv_behind_camera_invisible():
    f = 100.0
    P = np.array([
        [0.0, -f, 48.0, 0.0],
        [0.0, 0.0, -f + 0 * 32.0, 0.0],
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ])
    line = np.array([[-10.0, 0.0], [-5.0, 1.0]])  # behind the camera
    mask = rasterize_lines_pv([line], P[None], (64, 96), (16, 24))
    assert mask.sum() == 0


def test_synthetic_batch_rasterizes_own_vectors():
    from apollo_vision_net_tpu.configs import bev_smoke_det_map
    from apollo_vision_net_tpu.data.synthetic import make_batch

    import dataclasses

    cfg = bev_smoke_det_map()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, with_aux_seg=True))
    b = make_batch(cfg, 2, seed=0)
    assert b["gt_bev_seg"].shape == (2, 8, 8)
    assert set(np.unique(b["gt_bev_seg"])) <= {0.0, 1.0}
    # vectors pass near the origin by construction -> some BEV signal
    assert b["gt_bev_seg"].sum() > 0
    assert b["gt_pv_seg"].shape[0] == 2
    assert set(np.unique(b["gt_pv_seg"])) <= {0.0, 1.0}
