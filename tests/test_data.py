"""Data layer: shift protocols, temporal bookkeeping, pipeline geometry."""
import numpy as np
import pytest

from apollo_vision_net_tpu.data.infos import quat_to_rot, quat_yaw
from apollo_vision_net_tpu.data.pipeline import pad_images, scale_images
from apollo_vision_net_tpu.data.temporal import (
    StreamingState,
    sample_queue_indices,
    union2one_can_bus,
)
from apollo_vision_net_tpu.data.vector_map import (
    InstanceLines,
    clip_polyline_to_box,
    order_mask_from_shifts,
    pack_map_gt,
)

pytestmark = pytest.mark.quick  # numpy/interpret tier, no big jit graphs


def test_quat_roundtrip():
    # yaw-only quaternion
    yaw = 0.7
    q = [np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)]
    assert abs(quat_yaw(q) - yaw) < 1e-6
    r = quat_to_rot(q)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-7)


def test_shift_protocol_polyline():
    line = np.array([[0, 0], [1, 0], [2, 0]], np.float32)
    il = InstanceLines([line], fixed_num=5)
    s = il.shift_points("v2")
    assert s.shape == (1, 4, 5, 2)
    om = order_mask_from_shifts(s)
    assert om[0].tolist() == [True, True, False, False]
    # order 1 is the reverse of order 0
    np.testing.assert_allclose(s[0, 1], s[0, 0][::-1], atol=1e-6)


def test_shift_protocol_polygon():
    ring = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], np.float32)
    il = InstanceLines([ring], fixed_num=5)
    s = il.shift_points("v2", np.random.default_rng(0))
    om = order_mask_from_shifts(s)
    assert om[0].all()  # 4 distinct rolls for 4 vertices
    # every roll is closed
    np.testing.assert_allclose(s[0, :, 0], s[0, :, -1], atol=1e-6)


def test_union2one_scene_change():
    cbs = [np.arange(18, dtype=np.float32) + i for i in range(3)]
    out = union2one_can_bus(cbs, ["a", "a", "b"])
    assert out["has_prev"].tolist() == [0.0, 1.0, 0.0]
    assert out["can_bus"][0, 0] == 0.0         # first frame zeroed
    assert out["can_bus"][1, 0] == 1.0         # delta vs previous
    assert out["can_bus"][2, 0] == 0.0         # scene change zeroed


def test_streaming_state():
    st = StreamingState()
    cb1, hp1 = st.prepare_frame(np.arange(18, dtype=np.float32), "s1")
    assert hp1 == 0.0 and cb1[0] == 0.0
    st.update(np.zeros((1, 4, 8)))
    cb2, hp2 = st.prepare_frame(np.arange(18, dtype=np.float32) + 2, "s1")
    assert hp2 == 1.0 and cb2[0] == 2.0
    cb3, hp3 = st.prepare_frame(np.arange(18, dtype=np.float32), "s2")
    assert hp3 == 0.0


def test_queue_indices():
    rng = np.random.default_rng(0)
    idx = sample_queue_indices(10, 3, rng)
    assert len(idx) == 3
    assert idx[-1] == 10
    assert idx == sorted(idx)
    idx0 = sample_queue_indices(0, 3, rng)
    assert idx0[-1] == 0 and len(idx0) == 3


def test_clip_polyline():
    line = np.array([[-5, 0], [5, 0]], np.float64)
    pieces = clip_polyline_to_box(line, 2.0, 2.0)
    assert len(pieces) == 1
    np.testing.assert_allclose(pieces[0], [[-2, 0], [2, 0]], atol=1e-9)
    # line passing outside → split into two pieces
    vee = np.array([[-5, 0], [0, 10], [5, 0]], np.float64)
    pieces = clip_polyline_to_box(vee, 4.0, 2.0)
    assert len(pieces) == 2


def test_scale_images_patches_projection():
    rng = np.random.default_rng(0)
    imgs = rng.random((2, 8, 12, 3)).astype(np.float32)
    l2i = np.eye(4, dtype=np.float32)[None].repeat(2, 0)
    out, l2i2 = scale_images(imgs, l2i, 0.5)
    assert out.shape == (2, 4, 6, 3)
    assert l2i2[0, 0, 0] == 0.5 and l2i2[0, 1, 1] == 0.5
    assert l2i2[0, 2, 2] == 1.0


def test_pad_images():
    imgs = np.ones((1, 30, 50, 3), np.float32)
    out = pad_images(imgs, 32)
    assert out.shape == (1, 32, 64, 3)
    assert out[0, 31, 63, 0] == 0.0


def test_pack_map_gt_shapes():
    line = np.array([[0, 0], [3, 1], [5, 0]], np.float32)
    gt = pack_map_gt([line], [0], max_vec=4, fixed_num=6, pattern="v2")
    assert gt["shift_pts"].shape == (4, 5, 6, 2)
    assert gt["mask"].tolist() == [True, False, False, False]
    assert gt["order_mask"][0, :2].all() and not gt["order_mask"][0, 2:].any()


def test_boxes_to_occupancy_places_box():
    """paint_gt occ GT: voxels inside a GT box carry its class at the
    lidar voxelizer's (z*ydim + y)*xdim + x index convention (the
    reference's x-minor layout, which the occ heads emit)."""
    import dataclasses

    import numpy as np

    from apollo_vision_net_tpu import configs as cfglib
    from apollo_vision_net_tpu.data.synthetic import _boxes_to_occupancy

    cfg = cfglib.bev_smoke_det_occ()
    m = cfg.model
    pc = np.asarray(m.pc_range, np.float32)
    # a box centered at a known voxel, axis-aligned
    xd, yd, zd = m.occ_xdim, m.occ_ydim, m.occ_zdim
    vsx, vsy, vsz = ((pc[3] - pc[0]) / xd, (pc[4] - pc[1]) / yd,
                     (pc[5] - pc[2]) / zd)
    xi, yi, zi = xd // 2, yd // 3, zd // 2
    cx = pc[0] + (xi + 0.5) * vsx
    cy = pc[1] + (yi + 0.5) * vsy
    cz = pc[2] + (zi + 0.5) * vsz
    box = np.array([[cx, cy, cz, vsy * 0.9, vsx * 0.9, vsz * 0.9, 0.0,
                     0, 0]], np.float32)
    dense = _boxes_to_occupancy(box, np.array([3]), m)
    idx = (zi * yd + yi) * xd + xi
    assert dense[idx] == 3
    # tiny box -> only the one voxel (plus possible half-voxel neighbours)
    occ_frac = (dense != m.occupancy_classes).mean()
    assert occ_frac < 0.001
    # empty boxes -> all empty
    empty = _boxes_to_occupancy(np.zeros((0, 9)), np.zeros((0,)), m)
    assert (empty == m.occupancy_classes).all()
