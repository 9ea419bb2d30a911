"""Multi-scale deformable attention: XLA and Pallas vs torch grid_sample.

Mirrors the reference's kernel-vs-reference strategy (ops_dcnv3/test.py,
SURVEY.md §4.1): the semantic ground truth is torch ``F.grid_sample`` with
``bilinear/zeros/align_corners=False`` on grids ``2*loc - 1`` and an
attention-weighted sum over levels × points (reference
temporal_self_attention.py:293-348).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from apollo_vision_net_tpu.ops.msda import ms_deform_attn_xla
from apollo_vision_net_tpu.ops.msda_pallas import _msda_pallas_fwd_impl


def torch_msda_reference(value, spatial_shapes, locs, attn):
    """Independent torch implementation of MSDA semantics."""
    import torch
    import torch.nn.functional as F

    value = torch.from_numpy(value)
    locs = torch.from_numpy(locs)
    attn = torch.from_numpy(attn)
    B, V, H, D = value.shape
    _, Q, _, L, P, _ = locs.shape
    start = 0
    sampled = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, start:start + h * w]  # (B, hw, H, D)
        start += h * w
        v = v.permute(0, 2, 3, 1).reshape(B * H, D, h, w)
        grid = 2.0 * locs[:, :, :, lvl] - 1.0  # (B, Q, H, P, 2)
        grid = grid.permute(0, 2, 1, 3, 4).reshape(B * H, Q, P, 2)
        out = F.grid_sample(v, grid, mode="bilinear", padding_mode="zeros",
                            align_corners=False)  # (B*H, D, Q, P)
        sampled.append(out)
    stacked = torch.stack(sampled, dim=-2)  # (B*H, D, Q, L, P)
    w = attn.permute(0, 2, 1, 3, 4).reshape(B * H, 1, Q, L, P)
    out = (stacked * w).sum(dim=(-2, -1))  # (B*H, D, Q)
    out = out.reshape(B, H, D, Q).permute(0, 3, 1, 2).reshape(B, Q, H * D)
    return out.numpy()


def make_inputs(rng, B=2, H=4, D=8, Q=37, P=5,
                spatial_shapes=((6, 9), (3, 5))):
    V = sum(h * w for h, w in spatial_shapes)
    L = len(spatial_shapes)
    value = rng.standard_normal((B, V, H, D)).astype(np.float32)
    # include locations outside [0,1] to exercise zero padding
    locs = rng.uniform(-0.2, 1.2, (B, Q, H, L, P, 2)).astype(np.float32)
    attn = rng.random((B, Q, H, L, P)).astype(np.float32)
    attn /= attn.reshape(B, Q, H, -1).sum(-1).reshape(B, Q, H, 1, 1)
    return value, spatial_shapes, locs, attn


def test_xla_matches_torch():
    rng = np.random.default_rng(0)
    value, shapes, locs, attn = make_inputs(rng)
    got = np.asarray(ms_deform_attn_xla(value, shapes, locs, attn))
    want = torch_msda_reference(value, shapes, locs, attn)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_matches_xla_interpret():
    rng = np.random.default_rng(1)
    value, shapes, locs, attn = make_inputs(rng, B=1, Q=140)
    want = np.asarray(ms_deform_attn_xla(value, shapes, locs, attn))
    got = np.asarray(
        _msda_pallas_fwd_impl(value, shapes, locs, attn, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_xla_gradients_match_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    value, shapes, locs, attn = make_inputs(rng, B=1, H=2, D=4, Q=9, P=3,
                                            spatial_shapes=((5, 7),))

    def loss_jax(v, l, a):
        return jnp.sum(ms_deform_attn_xla(v, shapes, l, a) ** 2)

    gv, gl, ga = jax.grad(loss_jax, argnums=(0, 1, 2))(value, locs, attn)

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(locs).requires_grad_(True)
    ta = torch.from_numpy(attn).requires_grad_(True)

    B, V, H, D = value.shape
    _, Q, _, L, P, _ = locs.shape
    h, w = shapes[0]
    v = tv.permute(0, 2, 3, 1).reshape(B * H, D, h, w)
    grid = (2.0 * tl[:, :, :, 0] - 1.0).permute(0, 2, 1, 3, 4).reshape(
        B * H, Q, P, 2)
    out = F.grid_sample(v, grid, mode="bilinear", padding_mode="zeros",
                        align_corners=False)
    wgt = ta.permute(0, 2, 1, 3, 4).reshape(B * H, 1, Q, L * P)
    res = (out * wgt).sum(-1).reshape(B, H, D, Q).permute(0, 3, 1, 2)
    (res.reshape(B, Q, H * D) ** 2).sum().backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(),
                               rtol=1e-4, atol=1e-4)
    # location grads: grid_sample gradients are undefined exactly on integer
    # lattice points; random floats almost surely avoid them.
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(),
                               rtol=1e-3, atol=1e-3)


def test_dispatch_auto():
    from apollo_vision_net_tpu.ops import ms_deform_attn

    rng = np.random.default_rng(3)
    value, shapes, locs, attn = make_inputs(rng)
    got = np.asarray(ms_deform_attn(value, shapes, locs, attn, impl="xla"))
    want = torch_msda_reference(value, shapes, locs, attn)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_slab_matches_xla_interpret():
    """Row-slab windowed kernel == full kernel == XLA, including wide-tile
    fallback and tile skipping."""
    rng = np.random.default_rng(3)
    shapes = ((12, 10),)
    B, H, D, Q, P = 2, 2, 8, 256, 4
    V = sum(h * w for h, w in shapes)
    value = rng.standard_normal((B, V, H, D)).astype(np.float32)
    # tile 0: rows clustered around 0.3 (narrow); tile 1: full spread (wide)
    locs = np.empty((B, Q, H, 1, P, 2), np.float32)
    locs[..., 0] = rng.uniform(-0.1, 1.1, (B, Q, H, 1, P))
    locs[:, :128, ..., 1] = rng.uniform(0.25, 0.4, (B, 128, H, 1, P))
    locs[:, 128:, ..., 1] = rng.uniform(-0.2, 1.2, (B, 128, H, 1, P))
    attn = rng.random((B, Q, H, 1, P)).astype(np.float32)
    attn /= attn.reshape(B, Q, H, -1).sum(-1).reshape(B, Q, H, 1, 1)

    want = np.asarray(ms_deform_attn_xla(value, shapes, locs, attn))
    got = np.asarray(_msda_pallas_fwd_impl(
        value, shapes, locs, attn, interpret=True, slab_rows=6))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # with tile skipping: skipped tiles are zero, others exact
    tile_mask = np.array([[True, False], [True, True]])
    got = np.asarray(_msda_pallas_fwd_impl(
        value, shapes, locs, attn, interpret=True, slab_rows=6,
        tile_mask=jnp.asarray(tile_mask)))
    np.testing.assert_allclose(got[0, :128], want[0, :128], rtol=1e-5,
                               atol=1e-5)
    assert np.all(got[0, 128:] == 0)
    np.testing.assert_allclose(got[1], want[1], rtol=1e-5, atol=1e-5)


def test_pallas_slab_all_narrow_and_degenerate():
    """Slab larger than the grid degenerates to the full kernel; every
    location inside one band stays exact."""
    rng = np.random.default_rng(4)
    shapes = ((8, 130),)  # wide rows: wp=132, exercises 8-alignment
    B, H, D, Q, P = 1, 2, 8, 128, 4
    V = sum(h * w for h, w in shapes)
    value = rng.standard_normal((B, V, H, D)).astype(np.float32)
    locs = np.empty((B, Q, H, 1, P, 2), np.float32)
    locs[..., 0] = rng.uniform(0, 1, (B, Q, H, 1, P))
    locs[..., 1] = rng.uniform(0.5, 0.75, (B, Q, H, 1, P))
    attn = rng.random((B, Q, H, 1, P)).astype(np.float32)
    attn /= attn.reshape(B, Q, H, -1).sum(-1).reshape(B, Q, H, 1, 1)
    want = np.asarray(ms_deform_attn_xla(value, shapes, locs, attn))
    for slab in (4, 100):
        got = np.asarray(_msda_pallas_fwd_impl(
            value, shapes, locs, attn, interpret=True, slab_rows=slab))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=f"slab={slab}")


def test_pallas_fast_bf16_close():
    """Fast mode (bf16 patches + bf16 one-hot mask, single MXU pass) stays
    within bf16 rounding of the exact kernel, slab and full paths."""
    rng = np.random.default_rng(5)
    value, shapes, locs, attn = make_inputs(
        rng, B=2, H=2, D=8, Q=256, P=4, spatial_shapes=((12, 10),))
    want = np.asarray(ms_deform_attn_xla(value, shapes, locs, attn))
    for slab in (None, 6):
        got = np.asarray(_msda_pallas_fwd_impl(
            value, shapes, locs, attn, interpret=True, fast=True,
            slab_rows=slab))
        # bf16 has ~3 decimal digits; weighted sums of O(1) values
        np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05,
                                   err_msg=f"slab={slab}")
        assert got.dtype == want.dtype == np.float32


def test_pallas_window_kernel():
    """Block-window kernel (large single-level grids): exact vs the XLA
    reference when every tile's samples fit its centered 24x32-cell
    window; wide samples clamp finitely (documented deviation)."""
    from apollo_vision_net_tpu.ops.msda_pallas import _msda_pallas_window_impl

    rng = np.random.default_rng(7)
    B, H, D, Q, P = 2, 2, 8, 128, 4
    h, w = 40, 36
    value = jnp.asarray(rng.standard_normal((B, h * w, H, D)), jnp.float32)
    nt = Q // 32
    locs = np.empty((B, Q, H, 1, P, 2), np.float32)
    centers = rng.uniform(0.25, 0.75, (B, nt, 2))
    for b in range(B):
        for t in range(nt):
            locs[b, t * 32:(t + 1) * 32] = centers[b, t] + rng.uniform(
                -0.1, 0.1, (32, H, 1, P, 2))
    locs = jnp.asarray(np.clip(locs, 0, 1))
    attn = jnp.asarray(rng.random((B, Q, H, 1, P)), np.float32)
    want = np.asarray(ms_deform_attn_xla(value, ((h, w),), locs, attn))
    got = np.asarray(_msda_pallas_window_impl(
        value, ((h, w),), locs, attn, interpret=True, q_tile=32))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # spread-everywhere samples: clamped, finite, and masked tiles zero
    locs2 = jnp.asarray(rng.uniform(0, 1, (B, Q, H, 1, P, 2)), np.float32)
    tm = np.ones((B, nt), np.int32)
    tm[:, -1] = 0
    got2 = np.asarray(_msda_pallas_window_impl(
        value, ((h, w),), locs2, attn, interpret=True, q_tile=32,
        tile_mask=jnp.asarray(tm)))
    assert np.isfinite(got2).all()
    assert np.all(got2[:, 96:] == 0)


def test_pallas_window_kernel_origin_robustness():
    """The window center must ignore (a) zero-padded tail queries when
    Q % q_tile != 0 and (b) far out-of-grid samples (which contribute zero
    anyway): with both present, in-grid compact samples stay exact vs XLA
    (ADVICE round-2 medium finding)."""
    from apollo_vision_net_tpu.ops.msda_pallas import _msda_pallas_window_impl

    rng = np.random.default_rng(11)
    B, H, D, P = 1, 2, 8, 4
    h, w = 48, 48
    Q = 40  # one 32-tile + a 8-query tail tile padded to 32
    value = jnp.asarray(rng.standard_normal((B, h * w, H, D)), jnp.float32)
    locs = np.empty((B, Q, H, 1, P, 2), np.float32)
    # tile 0: compact cluster near the FAR corner (0.85) — a zero-padded
    # tail at loc=0 or an outlier at -3 used to drag its window to origin
    locs[:, :32] = 0.85 + rng.uniform(-0.05, 0.05, (B, 32, H, 1, P, 2))
    locs[:, 32:] = 0.85 + rng.uniform(-0.05, 0.05, (B, Q - 32, H, 1, P, 2))
    # one far out-of-grid sample per tile (contributes 0 via inside flag)
    locs[:, 0, 0, 0, 0] = (-3.0, -3.0)
    locs[:, 33, 0, 0, 0] = (4.0, 4.0)
    locs = jnp.asarray(locs)
    attn = jnp.asarray(rng.random((B, Q, H, 1, P)), np.float32)
    want = np.asarray(ms_deform_attn_xla(value, ((h, w),), locs, attn))
    got = np.asarray(_msda_pallas_window_impl(
        value, ((h, w),), locs, attn, interpret=True, q_tile=32))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pallas_window_kernel_border_fade():
    """Samples within half a cell of the image border bilinearly fade into
    the zero padding exactly (the former 1-cell-tighter clamp snapped them
    to the edge pixel at full weight — ADVICE round-2 low finding)."""
    from apollo_vision_net_tpu.ops.msda_pallas import _msda_pallas_window_impl

    rng = np.random.default_rng(13)
    B, H, D, P = 1, 2, 8, 4
    h, w = 40, 40
    Q = 32
    value = jnp.asarray(rng.standard_normal((B, h * w, H, D)), jnp.float32)
    # all samples hug the top-left border: normalized coords in
    # (0, 0.5/w) — i.e. inside the image but within half a cell of the
    # edge, where grid_sample blends with zero padding
    locs = jnp.asarray(
        rng.uniform(1e-3, 0.5 / w, (B, Q, H, 1, P, 2)), np.float32)
    attn = jnp.asarray(rng.random((B, Q, H, 1, P)), np.float32)
    want = np.asarray(ms_deform_attn_xla(value, ((h, w),), locs, attn))
    got = np.asarray(_msda_pallas_window_impl(
        value, ((h, w),), locs, attn, interpret=True, q_tile=32))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pallas_ml_slab_matches_xla_interpret():
    """Multi-level row-slab kernel (base-scale SCA path) == XLA, including
    the tile-granular wide fallback, tile skipping, and tail queries."""
    from apollo_vision_net_tpu.ops.msda_pallas import _msda_pallas_fwd_impl

    rng = np.random.default_rng(11)
    shapes = ((14, 10), (7, 5), (4, 3))
    B, H, D, Q, P = 2, 3, 8, 150, 4  # Q=150, QT=64 -> padded tail
    V = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = rng.standard_normal((B, V, H, D)).astype(np.float32)
    locs = np.empty((B, Q, H, L, P, 2), np.float32)
    locs[..., 0] = rng.uniform(-0.1, 1.1, (B, Q, H, L, P))
    # tile 0 narrow at every level; tile 1 wide at level 1 only; tile 2
    # (tail-padded) spread everywhere
    locs[:, :64, ..., 1] = rng.uniform(0.30, 0.42, (B, 64, H, L, P))
    locs[:, 64:128, ..., 1] = rng.uniform(0.30, 0.42, (B, 64, H, L, P))
    locs[:, 64:128, :, 1, :, 1] = rng.uniform(-0.2, 1.2, (B, 64, H, P))
    locs[:, 128:, ..., 1] = rng.uniform(-0.2, 1.2, (B, Q - 128, H, L, P))
    attn = rng.random((B, Q, H, L, P)).astype(np.float32)
    attn /= attn.reshape(B, Q, H, -1).sum(-1).reshape(B, Q, H, 1, 1)

    want = np.asarray(ms_deform_attn_xla(value, shapes, locs, attn))
    got = np.asarray(_msda_pallas_fwd_impl(
        value, shapes, locs, attn, interpret=True, q_tile=64,
        slab_rows=(6, 4, 3)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # tile skipping composes with the slab path
    tile_mask = np.array([[True, False, True], [True, True, False]])
    got = np.asarray(_msda_pallas_fwd_impl(
        value, shapes, locs, attn, interpret=True, q_tile=64,
        slab_rows=(6, 4, 3), tile_mask=jnp.asarray(tile_mask)))
    np.testing.assert_allclose(got[0, :64], want[0, :64], rtol=1e-5,
                               atol=1e-5)
    assert np.all(got[0, 64:128] == 0)
    np.testing.assert_allclose(got[1, :128], want[1, :128], rtol=1e-5,
                               atol=1e-5)
    assert np.all(got[1, 128:] == 0)

    # degenerate: slabs covering every grid row == full kernel
    got = np.asarray(_msda_pallas_fwd_impl(
        value, shapes, locs, attn, interpret=True, q_tile=64,
        slab_rows=(16, 9, 6)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_pt2d_matches_xla_interpret(monkeypatch):
    """Transposed point-stacked multi-level kernel (base-scale SCA default
    at q_tile=128) == XLA: tail queries, tile skipping, fast mode, and
    off-grid samples (zero via the s-fold, col bounds stay clipped)."""
    from apollo_vision_net_tpu.ops.msda_pallas import _msda_pallas_fwd_impl

    monkeypatch.setenv("MSDA_ML_KERNEL", "pt2d")
    rng = np.random.default_rng(13)
    shapes = ((14, 10), (7, 5), (4, 3))
    B, H, D, Q, P = 2, 3, 8, 300, 4  # QT=128 -> Qp=384, padded tail
    V = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = rng.standard_normal((B, V, H, D)).astype(np.float32)
    locs = rng.uniform(-0.15, 1.15, (B, Q, H, L, P, 2)).astype(np.float32)
    attn = rng.random((B, Q, H, L, P)).astype(np.float32)
    attn /= attn.reshape(B, Q, H, -1).sum(-1).reshape(B, Q, H, 1, 1)

    want = np.asarray(ms_deform_attn_xla(value, shapes, locs, attn))
    got = np.asarray(_msda_pallas_fwd_impl(
        value, shapes, locs, attn, interpret=True, q_tile=128,
        slab_rows=(6, 4, 3)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # tile skipping zeroes skipped tiles and keeps kept tiles exact
    tile_mask = np.array([[True, False, True], [True, True, False]])
    got = np.asarray(_msda_pallas_fwd_impl(
        value, shapes, locs, attn, interpret=True, q_tile=128,
        slab_rows=(6, 4, 3), tile_mask=jnp.asarray(tile_mask)))
    np.testing.assert_allclose(got[0, :128], want[0, :128], rtol=1e-5,
                               atol=1e-5)
    assert np.all(got[0, 128:256] == 0)
    np.testing.assert_allclose(got[1, :256], want[1, :256], rtol=1e-5,
                               atol=1e-5)
    assert np.all(got[1, 256:] == 0)

    # fast (bf16 contraction) stays within bf16 tolerance
    got = np.asarray(_msda_pallas_fwd_impl(
        value, shapes, locs, attn, interpret=True, q_tile=128,
        slab_rows=(6, 4, 3), fast=True))
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)

    # active-tile compaction: same result through the compact grid (cap
    # covers the 2 active tiles) AND through the lax.cond full-grid
    # fallback (cap below the active count)
    monkeypatch.setenv("MSDA_PT2D_COMPACT_MIN", "2")
    for cap_frac in ("0.67", "0.2"):  # cap=3 (compact), cap=1 < count=2
        monkeypatch.setenv("MSDA_PT2D_CAP", cap_frac)
        got = np.asarray(_msda_pallas_fwd_impl(
            value, shapes, locs, attn, interpret=True, q_tile=128,
            slab_rows=(6, 4, 3), tile_mask=jnp.asarray(tile_mask)))
        np.testing.assert_allclose(got[0, :128], want[0, :128], rtol=1e-5,
                                   atol=1e-5)
        assert np.all(got[0, 128:256] == 0)
        np.testing.assert_allclose(got[1, :256], want[1, :256], rtol=1e-5,
                                   atol=1e-5)
        assert np.all(got[1, 256:] == 0)


def make_factored_inputs(rng, B=6, Bs=2, H=3, D=8, Q=300, P=4, Dz=2,
                         spatial_shapes=((14, 10), (7, 5), (4, 3))):
    """Factored SCA-style operands: per-camera refs (B = Bs·N), shared
    raw-cell offsets / softmaxed attention (Bs)."""
    V = sum(h * w for h, w in spatial_shapes)
    L = len(spatial_shapes)
    value = rng.standard_normal((B, V, H, D)).astype(np.float32)
    ref = rng.uniform(-0.1, 1.1, (B, Q, Dz, 2)).astype(np.float32)
    off = rng.uniform(-3.0, 3.0, (Bs, Q, H * L * P * 2)).astype(np.float32)
    attn = rng.random((Bs, Q, H * L * P)).astype(np.float32)
    attn /= attn.reshape(Bs, Q, H, L * P).sum(-1).repeat(L * P, -1).reshape(
        Bs, Q, H * L * P)
    ref_flat = np.tile(ref.reshape(B, Q, Dz * 2), (1, 1, P // Dz))
    return value, spatial_shapes, ref_flat, off, attn


def _materialized_want(value, shapes, ref_flat, off, attn):
    from apollo_vision_net_tpu.ops.msda_pallas import _materialize_factored

    B, Q, P2 = ref_flat.shape
    H, L, P = value.shape[2], len(shapes), P2 // 2
    loc, aw = _materialize_factored(
        jnp.asarray(ref_flat), jnp.asarray(off), jnp.asarray(attn),
        shapes, H, P)
    loc = np.asarray(loc).reshape(B, Q, H, L, P, 2)
    aw = np.asarray(aw).reshape(B, Q, H, L, P)
    return np.asarray(ms_deform_attn_xla(value, shapes, loc, aw)), loc, aw


def test_pallas_factored_pt2d_matches_unfactored(monkeypatch):
    """Factored pt2d pack == unfactored pack == XLA on the materialized
    operands — incl. Bs < B replication, tail queries, tile compaction
    (the round-3 ADVICE medium: the factored+pt2d branch crashed at trace
    time because the precomputed pack was dropped)."""
    from apollo_vision_net_tpu.ops.msda_pallas import _msda_pallas_fwd_impl

    monkeypatch.setenv("MSDA_ML_KERNEL", "pt2d")
    rng = np.random.default_rng(17)
    value, shapes, ref_flat, off, attn = make_factored_inputs(rng)
    want, loc, aw = _materialized_want(value, shapes, ref_flat, off, attn)

    got = np.asarray(_msda_pallas_fwd_impl(
        value, shapes, None, None, interpret=True, q_tile=128,
        slab_rows=(6, 4, 3),
        factored=(jnp.asarray(ref_flat), jnp.asarray(off),
                  jnp.asarray(attn))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # unfactored pt2d on the materialized forms agrees too
    got_u = np.asarray(_msda_pallas_fwd_impl(
        value, shapes, loc, aw, interpret=True, q_tile=128,
        slab_rows=(6, 4, 3)))
    np.testing.assert_allclose(got_u, want, rtol=1e-4, atol=1e-5)

    # tile skipping + active-tile compaction through the factored pack
    B = value.shape[0]
    tile_mask = np.ones((B, 3), bool)
    tile_mask[0, 1] = False
    tile_mask[3, 2] = False
    monkeypatch.setenv("MSDA_PT2D_COMPACT_MIN", "2")
    monkeypatch.setenv("MSDA_PT2D_CAP", "0.67")
    got = np.asarray(_msda_pallas_fwd_impl(
        value, shapes, None, None, interpret=True, q_tile=128,
        slab_rows=(6, 4, 3), tile_mask=jnp.asarray(tile_mask),
        factored=(jnp.asarray(ref_flat), jnp.asarray(off),
                  jnp.asarray(attn))))
    assert np.all(got[0, 128:256] == 0)
    np.testing.assert_allclose(got[0, :128], want[0, :128], rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(got[1], want[1], rtol=1e-4, atol=1e-5)


def test_pallas_factored_materialize_paths(monkeypatch):
    """Factored operands through the NON-pt2d paths (chunk kernel, slab
    single-level) materialize first — identical results."""
    from apollo_vision_net_tpu.ops.msda_pallas import _msda_pallas_fwd_impl

    rng = np.random.default_rng(19)
    value, shapes, ref_flat, off, attn = make_factored_inputs(
        rng, B=4, Bs=4, Q=150)
    want, _, _ = _materialized_want(value, shapes, ref_flat, off, attn)
    monkeypatch.setenv("MSDA_ML_KERNEL", "chunk")
    got = np.asarray(_msda_pallas_fwd_impl(
        value, shapes, None, None, interpret=True, q_tile=64,
        slab_rows=(6, 4, 3),
        factored=(jnp.asarray(ref_flat), jnp.asarray(off),
                  jnp.asarray(attn))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # single-level slab path, Bs < B
    value, shapes, ref_flat, off, attn = make_factored_inputs(
        rng, B=6, Bs=3, Q=100, spatial_shapes=((12, 9),))
    want, _, _ = _materialized_want(value, shapes, ref_flat, off, attn)
    got = np.asarray(_msda_pallas_fwd_impl(
        value, shapes, None, None, interpret=True, q_tile=32, slab_rows=8,
        factored=(jnp.asarray(ref_flat), jnp.asarray(off),
                  jnp.asarray(attn))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_factored_vjp_matches_xla_grads(monkeypatch):
    """ms_deform_attn_pallas_factored gradients == jax.grad of the XLA
    composition (the custom_vjp contracts d_off/d_attn over cameras and
    d_ref over heads·levels)."""
    from apollo_vision_net_tpu.ops import msda_pallas as mp

    orig_impl = mp._msda_pallas_fwd_impl
    monkeypatch.setattr(
        mp, "_msda_pallas_fwd_impl",
        lambda *a, **k: orig_impl(*a, **{**k, "interpret": True}))

    rng = np.random.default_rng(23)
    value, shapes, ref_flat, off, attn = make_factored_inputs(
        rng, B=4, Bs=2, Q=40, spatial_shapes=((6, 9), (3, 5)))
    H, L = value.shape[2], len(shapes)
    P = ref_flat.shape[-1] // 2
    B, Q = ref_flat.shape[:2]

    def ref_fn(v, r, o, a):
        loc, aw = mp._materialize_factored(r, o, a, shapes, H, P)
        return jnp.sum(ms_deform_attn_xla(
            v, shapes, loc.reshape(B, Q, H, L, P, 2),
            aw.reshape(B, Q, H, L, P)) ** 2)

    def fact_fn(v, r, o, a):
        return jnp.sum(mp.ms_deform_attn_pallas_factored(
            v, shapes, r, o, a, False, None, None, 32) ** 2)

    args = tuple(map(jnp.asarray, (value, ref_flat, off, attn)))
    want = jax.grad(ref_fn, argnums=(0, 1, 2, 3))(*args)
    got = jax.grad(fact_fn, argnums=(0, 1, 2, 3))(*args)
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-5)
