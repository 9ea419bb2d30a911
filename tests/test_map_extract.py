"""Online vector-map GT extraction (reference VectorizedLocalMap,
nuscenes_det_occ_map_dataset.py:283-569 and the v2 centerline dataset)
against a synthetic city map written in the nuScenes map-expansion JSON
schema — divider/ped/boundary/centerline geometry is known in closed form.
"""
import json
import math

import numpy as np
import pytest

from apollo_vision_net_tpu.data import geometry2d as g2
from apollo_vision_net_tpu.data.map_extract import (
    VectorizedLocalMap,
    VectorizedLocalMapV2,
    quaternion_yaw,
)
from apollo_vision_net_tpu.data.nusc_map import (
    NuScenesMapJSON,
    discretize_arcline_path,
)
from apollo_vision_net_tpu.data.vector_map import pack_map_gt

pytestmark = pytest.mark.quick  # numpy/interpret tier, no big jit graphs


# ---------------------------------------------------------------------------
# geometry2d primitives
# ---------------------------------------------------------------------------

SQUARE = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])


def test_ring_area_orientation():
    assert g2.ring_area(SQUARE) == pytest.approx(16.0)
    assert g2.ring_area(SQUARE[::-1]) == pytest.approx(-16.0)


def test_point_in_ring_and_polygon_with_hole():
    assert g2.point_in_ring((2, 2), SQUARE)
    assert not g2.point_in_ring((5, 2), SQUARE)
    hole = np.array([[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0]])
    assert not g2.point_in_polygon((2, 2), (SQUARE, [hole]))
    assert g2.point_in_polygon((0.5, 0.5), (SQUARE, [hole]))


def test_clip_ring_to_box():
    ring = g2.clip_ring_to_box(SQUARE + 3.0, half_w=5.0, half_h=5.0)
    # square (3..7)^2 clipped to (±5)^2 -> (3..5)^2
    assert ring is not None and g2.ring_is_closed(ring)
    assert abs(g2.ring_area(ring)) == pytest.approx(4.0)
    assert ring[:, 0].min() == pytest.approx(3.0)
    assert ring[:, 0].max() == pytest.approx(5.0)
    # fully outside
    assert g2.clip_ring_to_box(SQUARE + 20.0, 5.0, 5.0) is None


def test_union_two_overlapping_squares():
    a = (SQUARE, [])
    b = (SQUARE + 2.0, [])  # overlap on (2..4)^2
    rings = g2.union_exterior_contours([a, b])
    assert len(rings) == 1
    ring = rings[0]
    assert g2.ring_is_closed(ring)
    # union of the two 4x4 squares overlapping 2x2: area 16+16-4 = 28
    assert abs(g2.ring_area(ring)) == pytest.approx(28.0, abs=1e-6)
    # the staircase corner points must be on the contour
    for corner in [(4.0, 2.0), (2.0, 4.0), (6.0, 2.0), (2.0, 6.0)]:
        d = np.min(np.linalg.norm(ring - np.array(corner), axis=1))
        assert d < 1e-6, (corner, ring)


def test_union_shared_edge_vanishes():
    """Two squares sharing edge x=4: the shared edge is interior and must
    not appear in the union contour (the lane/road tiling case)."""
    a = (SQUARE, [])
    b = (SQUARE + np.array([4.0, 0.0]), [])
    rings = g2.union_exterior_contours([a, b])
    assert len(rings) == 1
    ring = rings[0]
    assert abs(g2.ring_area(ring)) == pytest.approx(32.0, abs=1e-6)
    # no vertical run along x=4 should survive
    on_seam = ring[np.abs(ring[:, 0] - 4.0) < 1e-9]
    assert not np.any((on_seam[:, 1] > 1e-9) & (on_seam[:, 1] < 4 - 1e-9))


def test_union_contained_polygon_vanishes():
    inner = (SQUARE * 0.25 + 1.0, [])
    rings = g2.union_exterior_contours([(SQUARE, []), inner])
    assert len(rings) == 1
    assert abs(g2.ring_area(rings[0])) == pytest.approx(16.0, abs=1e-6)


def test_union_disjoint_components():
    rings = g2.union_exterior_contours(
        [(SQUARE, []), (SQUARE + 10.0, [])])
    assert len(rings) == 2
    areas = sorted(abs(g2.ring_area(r)) for r in rings)
    assert areas == pytest.approx([16.0, 16.0])


def test_union_hole_rings_dropped():
    """A polygon with a hole: the hole ring is not an exterior contour
    (reference takes union-component .exterior only, :530-534)."""
    hole = np.array([[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0]])
    rings = g2.union_exterior_contours([(SQUARE, [hole])])
    assert len(rings) == 1
    assert abs(g2.ring_area(rings[0])) == pytest.approx(16.0, abs=1e-6)


def test_simplify_line():
    pts = np.array([[0.0, 0.0], [1.0, 0.01], [2.0, 0.0], [2.0, 5.0]])
    out = g2.simplify_line(pts, tol=0.1)
    np.testing.assert_allclose(
        out, [[0.0, 0.0], [2.0, 0.0], [2.0, 5.0]])
    # below tolerance nothing is dropped
    assert len(g2.simplify_line(pts, tol=0.001)) == 4


# ---------------------------------------------------------------------------
# arcline discretization
# ---------------------------------------------------------------------------

def test_discretize_straight_and_arc():
    straight = dict(start_pose=[0.0, 0.0, 0.0], end_pose=[10.0, 0.0, 0.0],
                    shape="LSR", radius=5.0, segment_length=[0.0, 10.0, 0.0])
    pts = discretize_arcline_path(straight, resolution=0.5)
    np.testing.assert_allclose(pts[0], [0, 0, 0], atol=1e-9)
    np.testing.assert_allclose(pts[-1], [10, 0, 0], atol=1e-9)
    assert np.all(np.abs(pts[:, 1]) < 1e-9)

    quarter = math.pi * 5.0 / 2.0
    arc = dict(start_pose=[10.0, 0.0, 0.0], end_pose=[15.0, 5.0, math.pi / 2],
               shape="LSR", radius=5.0, segment_length=[quarter, 0.0, 0.0])
    pts = discretize_arcline_path(arc, resolution=0.5)
    np.testing.assert_allclose(pts[0], [10, 0, 0], atol=1e-9)
    np.testing.assert_allclose(pts[-1], [15, 5, math.pi / 2], atol=1e-6)
    # all points on the radius-5 circle centered (10, 5)
    d = np.hypot(pts[:, 0] - 10.0, pts[:, 1] - 5.0)
    np.testing.assert_allclose(d, 5.0, atol=1e-9)


def test_quaternion_yaw():
    assert quaternion_yaw([1, 0, 0, 0]) == pytest.approx(0.0)
    half = math.pi / 4
    q = [math.cos(half), 0, 0, math.sin(half)]  # yaw pi/2
    assert quaternion_yaw(q) == pytest.approx(math.pi / 2)


# ---------------------------------------------------------------------------
# synthetic city map in the map-expansion JSON schema
# ---------------------------------------------------------------------------

def _node(tok, x, y):
    return dict(token=tok, x=x, y=y)


def _build_city() -> dict:
    nodes, lines, polygons = [], [], []

    def add_line(tok, pts):
        node_toks = []
        for i, (x, y) in enumerate(pts):
            nt = f"n_{tok}_{i}"
            nodes.append(_node(nt, x, y))
            node_toks.append(nt)
        lines.append(dict(token=tok, node_tokens=node_toks))

    def add_polygon(tok, pts):
        node_toks = []
        for i, (x, y) in enumerate(pts):
            nt = f"n_{tok}_{i}"
            nodes.append(_node(nt, x, y))
            node_toks.append(nt)
        polygons.append(
            dict(token=tok, exterior_node_tokens=node_toks, holes=[]))

    # dividers: D1 along y=5 (x 0..40), D2 along x=20 (y -20..20)
    add_line("ln_d1", [(0.0, 5.0), (40.0, 5.0)])
    add_line("ln_d2", [(20.0, -20.0), (20.0, 20.0)])
    # ped crossing square (10..14, -2..2)
    add_polygon("pg_ped", [(10, -2), (14, -2), (14, 2), (10, 2)])
    # road segments: R1 (0..20, -10..10), R2 (15..35, -5..15) (overlap)
    add_polygon("pg_r1", [(0, -10), (20, -10), (20, 10), (0, 10)])
    add_polygon("pg_r2", [(15, -5), (35, -5), (35, 15), (15, 15)])
    # lane polygons for centerline records (geometry barely matters; must
    # intersect the patch)
    add_polygon("pg_laneA", [(0, -2), (10, -2), (10, 2), (0, 2)])
    add_polygon("pg_laneB", [(10, 0), (15, 0), (15, 5), (10, 5)])

    quarter = math.pi * 5.0 / 2.0
    return dict(
        node=nodes,
        line=lines,
        polygon=polygons,
        road_divider=[dict(token="rd1", line_token="ln_d1")],
        lane_divider=[dict(token="ld1", line_token="ln_d2")],
        ped_crossing=[dict(token="ped1", polygon_token="pg_ped")],
        road_segment=[
            dict(token="rs1", polygon_token="pg_r1"),
            dict(token="rs2", polygon_token="pg_r2"),
        ],
        lane=[dict(token="laneA", polygon_token="pg_laneA")],
        lane_connector=[dict(token="laneB", polygon_token="pg_laneB")],
        arcline_path_3=[
            dict(token="laneA", arcline_paths=[dict(
                start_pose=[0.0, 0.0, 0.0], end_pose=[10.0, 0.0, 0.0],
                shape="LSR", radius=5.0, segment_length=[0.0, 10.0, 0.0])]),
            dict(token="laneB", arcline_paths=[dict(
                start_pose=[10.0, 0.0, 0.0],
                end_pose=[15.0, 5.0, math.pi / 2],
                shape="LSR", radius=5.0,
                segment_length=[quarter, 0.0, 0.0])]),
        ],
        connectivity=[
            dict(token="laneA",
                 connectivity=dict(incoming=[], outgoing=["laneB"])),
            dict(token="laneB",
                 connectivity=dict(incoming=["laneA"], outgoing=[])),
        ],
    )


EGO = dict(location="testville",
           lidar2global_translation=[20.0, 0.0, 0.0],
           lidar2global_rotation=[1.0, 0.0, 0.0, 0.0])


def _vmap(cls=VectorizedLocalMap):
    maps = {"testville": NuScenesMapJSON(_build_city(), "testville")}
    return cls(maps, patch_size=(60.0, 30.0))


def test_extraction_dividers():
    vm = _vmap()
    vectors, labels = vm.gen_vectorized_samples(**EGO)
    div = [v for v, l in zip(vectors, labels) if l == 0]
    assert len(div) == 2
    d1 = min(div, key=lambda v: v[0, 1].min() - v[0, 1].max())  # stable pick
    horiz = [v for v in div if np.allclose(v[:, 1], 5.0)]
    vert = [v for v in div if np.allclose(v[:, 0], 0.0)]
    assert len(horiz) == 1 and len(vert) == 1
    # y=5 divider spans full patch width (clipped at ±15)
    assert horiz[0][:, 0].min() == pytest.approx(-15.0)
    assert horiz[0][:, 0].max() == pytest.approx(15.0)
    # x=20 divider is at ego x=0, unclipped in y
    assert vert[0][:, 1].min() == pytest.approx(-20.0)
    assert vert[0][:, 1].max() == pytest.approx(20.0)


def test_extraction_ped_crossing_closed_ring():
    vectors, labels = _vmap().gen_vectorized_samples(**EGO)
    peds = [v for v, l in zip(vectors, labels) if l == 1]
    assert len(peds) == 1
    ring = peds[0]
    assert g2.ring_is_closed(ring)
    assert abs(g2.ring_area(ring)) == pytest.approx(16.0, abs=1e-4)
    # ego frame: global (10..14) - 20 -> (-10..-6)
    assert ring[:, 0].min() == pytest.approx(-10.0)
    assert ring[:, 0].max() == pytest.approx(-6.0)


def test_extraction_boundary_union_contour():
    vectors, labels = _vmap().gen_vectorized_samples(**EGO)
    bnds = [v for v, l in zip(vectors, labels) if l == 2]
    assert bnds, "no boundary contours extracted"
    allpts = np.concatenate(bnds)
    # the union notch corners (ego frame): R1∪R2 staircase at (0,-5)/(0,-10)
    for corner in [(0.0, -10.0), (0.0, -5.0), (-5.0, 10.0), (-5.0, 15.0)]:
        d = np.min(np.linalg.norm(allpts - np.array(corner), axis=1))
        assert d < 1e-3, (corner, [b.round(2) for b in bnds])
    # no contour point on R1's right edge inside R2 (removed by the union)
    seam = allpts[np.abs(allpts[:, 0]) < 1e-6]
    assert not np.any((seam[:, 1] > -4.99) & (seam[:, 1] < 9.99))
    # patch-boundary edges removed by the 0.2 m shrink: nothing at |x|=15
    assert np.all(np.abs(allpts[:, 0]) <= 14.8 + 1e-6)


def test_extraction_centerline_v2_joins_lanes():
    vectors, labels = _vmap(VectorizedLocalMapV2).gen_vectorized_samples(**EGO)
    ctr = [v for v, l in zip(vectors, labels) if l == 3]
    assert len(ctr) == 1, [c.round(2) for c in ctr]
    path = ctr[0]
    # laneA straight (clipped at x=-15) joined through connectivity into
    # laneB's quarter arc ending at ego (-5, 5)
    np.testing.assert_allclose(path[0], [-15.0, 0.0], atol=0.51)
    np.testing.assert_allclose(path[-1], [-5.0, 5.0], atol=1e-2)
    # passes near the lane junction at (-10, 0) (simplify(0.2) may drop the
    # exact junction vertex when it lies inside the DP corridor)
    d = np.min(np.linalg.norm(path - np.array([-10.0, 0.0]), axis=1))
    assert d < 0.6
    # v1 extractor emits no centerlines (3-class vec set)
    _, v1_labels = _vmap().gen_vectorized_samples(**EGO)
    assert 3 not in v1_labels


def test_extraction_deterministic_and_packs():
    vm = _vmap(VectorizedLocalMapV2)
    v1, l1 = vm.gen_vectorized_samples(**EGO)
    v2_, l2 = vm.gen_vectorized_samples(**EGO)
    assert l1 == l2
    for a, b in zip(v1, v2_):
        np.testing.assert_array_equal(a, b)
    packed = pack_map_gt(v1, l1, max_vec=50, fixed_num=20, seed=7)
    assert packed["shift_pts"].shape == (50, 19, 20, 2)
    assert packed["mask"].sum() == len(v1)
    assert set(np.asarray(packed["labels"][packed["mask"]]).tolist()) <= {
        0, 1, 2, 3}


def test_map_json_from_file(tmp_path):
    p = tmp_path / "testville.json"
    p.write_text(json.dumps(_build_city()))
    m = NuScenesMapJSON.from_file(str(p), "testville")
    assert m.extract_line("ln_d1").shape == (2, 2)
    ext, holes = m.extract_polygon("pg_r1")
    assert ext.shape == (4, 2) and holes == []
    assert m.outgoing_lane_ids("laneA") == ["laneB"]
