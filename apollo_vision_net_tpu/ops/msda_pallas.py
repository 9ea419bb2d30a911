"""Fused Pallas TPU kernel for multi-scale deformable attention.

TPU-first design — NOT a translation of the CUDA kernel
(reference mmcv ``ms_deform_attn``): TPUs do per-row gathers at a fixed
~17 ns/row (measured, v5e), so instead each grid program materializes a
weighted scatter mask ``W ∈ R^{Q_tile × V_pad}`` on the VPU — every
sampling point deposits its 4 bilinear-corner weights × attention weight at
the corner cells' flat indices (4 compares per point) — and contracts it
against the level's 1-ring zero-padded value block with ONE MXU matmul per
level: ``out = W @ value``. The bilinear/attention algebra rides inside the
mask, so the MXU streams each value element once per tile instead of P
times through 4·D-wide patch columns (the v2 design, kept for A/B: one 0/1
mask + one dot per point against a 2×2-patch-expanded operand).

The padded value for one batch element lives in VMEM, so the kernel covers
BEV grids ≤ ~128×128 (bf16) and image pyramids of similar size; larger
operands fall back to the XLA patch-gather path in ``msda.py``.

Differentiation: forward runs the Pallas kernel; backward reuses the VJP of
the (numerically identical) XLA implementation.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget: patched value block (Vp · H · 4D · 4B) must fit comfortably.
_VMEM_VALUE_LIMIT_BYTES = 12 * 1024 * 1024
_MAX_LEVEL_SIZE = 8192


def _padded_sizes(spatial_shapes):
    return [(h + 2) * (w + 2) for h, w in spatial_shapes]


def is_profitable(value, spatial_shapes, sampling_locations,
                  itemsize: int = 4) -> bool:
    """itemsize: bytes per operand element (2 in fast/bf16 mode — doubles
    the grid size the kernel covers before falling back to XLA gathers).
    The scatter-mask kernel holds the 1-ring padded value (Vp, D) per head
    in VMEM (not the 4D-wide patch expansion)."""
    B, V, H, D = value.shape
    vp = sum(_padded_sizes(spatial_shapes))
    if vp * H * D * itemsize > _VMEM_VALUE_LIMIT_BYTES:
        return False
    if max(_padded_sizes(spatial_shapes)) > _MAX_LEVEL_SIZE:
        return False
    return True


def _build_patches(value, spatial_shapes, dtype=None):
    """(B, V, H, D) -> (B, H, Vp, 4*D): zero-padded 2×2 neighbourhoods,
    built head-major so no large transpose follows (the head axis moves
    while the tensor is still 4× smaller than the patched result).

    ``dtype`` (fast mode: bfloat16) casts BEFORE the expansion, so the
    patched tensor is built, stored and DMA'd at half width and the kernel's
    mask contraction runs as a native single-pass bf16 matmul with no
    per-point operand conversions."""
    if dtype is not None and value.dtype != dtype:
        value = value.astype(dtype)
    B, V, H, D = value.shape
    sizes = [h * w for h, w in spatial_shapes]
    starts = np.concatenate([[0], np.cumsum(sizes)])
    out = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = jax.lax.slice_in_dim(
            value, int(starts[lvl]), int(starts[lvl + 1]), axis=1
        ).reshape(B, h, w, H, D).transpose(0, 3, 1, 2, 4)  # (B,H,h,w,D)
        vp = jnp.pad(v, [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)])
        p01 = jnp.roll(vp, -1, axis=3)
        p10 = jnp.roll(vp, -1, axis=2)
        p11 = jnp.roll(p10, -1, axis=3)
        patch = jnp.concatenate([vp, p01, p10, p11], axis=-1)  # (...,4D)
        out.append(patch.reshape(B, H, (h + 2) * (w + 2), 4 * D))
    return jnp.concatenate(out, axis=2)


def _build_padded_value(value, spatial_shapes, dtype=None):
    """(B, V, H, D) -> (B, H, Vp, D): per-level zero-padded (+1 ring) value,
    head-major. The scatter-mask (v3) kernel contracts directly against this
    — 4× less VMEM and DMA than the 2×2 patch expansion."""
    if dtype is not None and value.dtype != dtype:
        value = value.astype(dtype)
    B, V, H, D = value.shape
    sizes = [h * w for h, w in spatial_shapes]
    starts = np.concatenate([[0], np.cumsum(sizes)])
    out = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = jax.lax.slice_in_dim(
            value, int(starts[lvl]), int(starts[lvl + 1]), axis=1
        ).reshape(B, h, w, H, D).transpose(0, 3, 1, 2, 4)  # (B,H,h,w,D)
        vp = jnp.pad(v, [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)])
        out.append(vp.reshape(B, H, (h + 2) * (w + 2), D))
    return jnp.concatenate(out, axis=2)


def _weighted_mask(loc_ref, attn_ref, *, lvl, num_points, h, w, QT, S, base):
    """Combined (QT, S) f32 scatter mask for one level. The MSDA output is
    then ONE contraction ``mask @ value`` per level — the bilinear/attention
    algebra rides inside the mask instead of 4·D-wide patch columns, so the
    MXU streams D-wide (not 4D-wide) operands once (not P times).

    The bilinear weight is SEPARABLE: on the 1-ring zero-padded grid,
    point p's contribution to cell (y, x) is exactly
    ``relu(1-|x - px_pad|) · relu(1-|y - py_pad|)`` — a product of two hat
    functions whose 2-cell supports are the bilinear corners, with the
    padding ring supplying grid_sample's zero-padding semantics. Pure f32
    VPU arithmetic on a flat iota (no integer compare/select chains);
    samples fully outside the grid are zeroed by the ``inside`` flag, which
    matches the reference clip+mask exactly."""
    wp = w + 2
    col = jax.lax.broadcasted_iota(jnp.int32, (QT, S), 1) + base
    # padded-grid continuous coords of every flat cell (computed once)
    yc = (col // wp).astype(jnp.float32)
    xc = (col % wp).astype(jnp.float32)
    Wm = jnp.zeros((QT, S), jnp.float32)
    for p in range(num_points):
        flat = lvl * num_points + p
        px = loc_ref[0, 0, :, 2 * flat:2 * flat + 1].astype(jnp.float32) * w + 0.5
        py = loc_ref[0, 0, :, 2 * flat + 1:2 * flat + 2].astype(jnp.float32) * h + 0.5
        aw = attn_ref[0, 0, :, flat:flat + 1].astype(jnp.float32)
        # inside: the sample's 2x2 support intersects the image
        # (px/py here are PADDED coords: img coord + 1)
        inside = (
            (px > 0.0) & (px < w + 1.0) & (py > 0.0) & (py < h + 1.0)
        ).astype(jnp.float32)
        wx = jnp.maximum(1.0 - jnp.abs(xc - px), 0.0)
        wy = jnp.maximum(1.0 - jnp.abs(yc - py), 0.0)
        Wm = Wm + (aw * inside) * wx * wy
    return Wm


def _msda_kernel_v3(
    value_ref,  # (1, 1, Vp, D) — this head's padded value
    loc_ref,    # (1, 1, QT, L*P*2)
    attn_ref,   # (1, 1, QT, L*P)
    out_ref,    # (1, 1, QT, D)
    *,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    num_points: int,
    head_dim: int,
    precision=None,
):
    QT = loc_ref.shape[2]
    D = head_dim
    pstarts = np.concatenate([[0], np.cumsum(_padded_sizes(spatial_shapes))])
    kdt = value_ref.dtype
    prec = precision or jax.lax.Precision.HIGHEST
    acc = jnp.zeros((QT, D), dtype=jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        S = int(pstarts[lvl + 1] - pstarts[lvl])
        vblock = value_ref[0, 0, pstarts[lvl]:pstarts[lvl + 1], :]
        Wm = _weighted_mask(loc_ref, attn_ref, lvl=lvl, num_points=num_points,
                            h=h, w=w, QT=QT, S=S, base=0)
        acc = acc + jnp.dot(
            Wm.astype(kdt), vblock,
            preferred_element_type=jnp.float32, precision=prec,
        )
    out_ref[0, 0, :, :] = acc.astype(out_ref.dtype)


def _msda_kernel_v3_masked(
    tile_mask_ref,  # scalar prefetch: (B, n_qtiles) int32
    value_ref, loc_ref, attn_ref, out_ref,
    *, spatial_shapes, num_points, head_dim, precision=None,
):
    b = pl.program_id(0)
    q = pl.program_id(2)
    active = tile_mask_ref[b, q] > 0

    @pl.when(active)
    def _():
        _msda_kernel_v3(
            value_ref, loc_ref, attn_ref, out_ref,
            spatial_shapes=spatial_shapes, num_points=num_points,
            head_dim=head_dim, precision=precision,
        )

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[0, 0, :, :] = jnp.zeros_like(out_ref[0, 0, :, :])


def _msda_kernel_slab_v3(
    slab_ref,       # scalar prefetch: (B, n_qtiles) int32 slab starts / align
    wide_ref,       # (B, n_qtiles) int32: 1 -> slab overflow, use full width
    tmask_ref,      # (B, n_qtiles) int32 tile visibility
    value_ref, loc_ref, attn_ref, out_ref,
    *, spatial_shapes, num_points, head_dim, slab_elems, sublane_align,
    precision=None,
):
    """Row-slab windowed scatter-mask variant (single level); see
    _msda_kernel_slab for the windowing contract."""
    b = pl.program_id(0)
    q = pl.program_id(2)
    (h, w) = spatial_shapes[0]
    QT = loc_ref.shape[2]
    D = head_dim
    active = tmask_ref[b, q] > 0
    wide = wide_ref[b, q] > 0

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[0, 0, :, :] = jnp.zeros_like(out_ref[0, 0, :, :])

    @pl.when(active & wide)
    def _():
        _msda_kernel_v3(
            value_ref, loc_ref, attn_ref, out_ref,
            spatial_shapes=spatial_shapes, num_points=num_points,
            head_dim=D, precision=precision,
        )

    @pl.when(active & jnp.logical_not(wide))
    def _():
        base = slab_ref[b, q] * sublane_align  # provably aligned (see slab v2)
        vblock = value_ref[0, 0, pl.ds(base, slab_elems), :]
        kdt = value_ref.dtype
        prec = precision or jax.lax.Precision.HIGHEST
        Wm = _weighted_mask(loc_ref, attn_ref, lvl=0, num_points=num_points,
                            h=h, w=w, QT=QT, S=slab_elems, base=base)
        out_ref[0, 0, :, :] = jnp.dot(
            Wm.astype(kdt), vblock,
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(out_ref.dtype)


def _msda_kernel_v2(
    patch_ref,  # (1, 1, Vp, 4D)     — this head's patch block
    loc_ref,    # (1, 1, QT, L*P*2)
    attn_ref,   # (1, 1, QT, L*P)
    out_ref,    # (1, 1, QT, D)
    *,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    num_points: int,
    head_dim: int,
    precision=None,
):
    QT = loc_ref.shape[2]
    L = len(spatial_shapes)
    P = num_points
    D = head_dim
    pstarts = np.concatenate([[0], np.cumsum(_padded_sizes(spatial_shapes))])
    kdt = patch_ref.dtype  # bf16 in fast mode: native 1-pass MXU contraction
    acc = jnp.zeros((QT, D), dtype=jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        size = int(pstarts[lvl + 1] - pstarts[lvl])
        col = jax.lax.broadcasted_iota(jnp.int32, (QT, size), 1)
        patch = patch_ref[0, 0, pstarts[lvl]:pstarts[lvl + 1], :]
        for p in range(P):
            flat = lvl * P + p
            px = loc_ref[0, 0, :, 2 * flat:2 * flat + 1].astype(jnp.float32) * w - 0.5
            py = loc_ref[0, 0, :, 2 * flat + 1:2 * flat + 2].astype(jnp.float32) * h - 0.5
            aw = attn_ref[0, 0, :, flat:flat + 1].astype(jnp.float32)
            x0 = jnp.floor(px)
            y0 = jnp.floor(py)
            fx = px - x0
            fy = py - y0
            x0 = x0.astype(jnp.int32)
            y0 = y0.astype(jnp.int32)
            inside = (
                (x0 >= -1) & (x0 <= w - 1) & (y0 >= -1) & (y0 <= h - 1)
            ).astype(jnp.float32)
            idx = (jnp.clip(y0, -1, h - 1) + 1) * (w + 2) + (
                jnp.clip(x0, -1, w - 1) + 1
            )
            mask = (col == idx).astype(kdt)  # one cmp per lane
            # exact mode: f32 operands + HIGHEST (f32-exact selection);
            # fast mode: bf16 patches + bf16 mask -> one native MXU pass,
            # no per-point operand conversion work
            prec = precision or jax.lax.Precision.HIGHEST
            rows = jnp.dot(
                mask, patch,
                preferred_element_type=jnp.float32,
                precision=prec,
            )  # (QT, 4D)
            s = aw * inside
            acc = (
                acc
                + rows[:, 0:D] * ((1 - fx) * (1 - fy) * s)
                + rows[:, D:2 * D] * (fx * (1 - fy) * s)
                + rows[:, 2 * D:3 * D] * ((1 - fx) * fy * s)
                + rows[:, 3 * D:4 * D] * (fx * fy * s)
            )
    out_ref[0, 0, :, :] = acc.astype(out_ref.dtype)


def _msda_kernel_v2_masked(
    tile_mask_ref,  # scalar prefetch: (B, n_qtiles) int32
    patch_ref, loc_ref, attn_ref, out_ref,
    *, spatial_shapes, num_points, head_dim, precision=None,
):
    """Camera-tile skipping variant: programs whose (batch, query-tile) has
    no visible query write zeros and skip the sampling entirely — the
    TPU-native equivalent of the reference SCA's per-camera query rebatching
    (spatial_cross_attention.py:136-165)."""
    b = pl.program_id(0)
    q = pl.program_id(2)
    active = tile_mask_ref[b, q] > 0

    @pl.when(active)
    def _():
        _msda_kernel_v2(
            patch_ref, loc_ref, attn_ref, out_ref,
            spatial_shapes=spatial_shapes, num_points=num_points,
            head_dim=head_dim, precision=precision,
        )

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[0, 0, :, :] = jnp.zeros_like(out_ref[0, 0, :, :])


def _msda_kernel_slab(
    slab_ref,       # scalar prefetch: (B, n_qtiles) int32 slab starts / align
    wide_ref,       # (B, n_qtiles) int32: 1 -> slab overflow, use full width
    tmask_ref,      # (B, n_qtiles) int32 tile visibility
    patch_ref, loc_ref, attn_ref, out_ref,
    *, spatial_shapes, num_points, head_dim, slab_elems, sublane_align,
    precision=None,
):
    """Row-slab windowed variant (single level).

    The one-hot MXU contraction is O(Q_tile · V_pad); but a spatially
    compact query tile only samples a narrow band of value ROWS (BEV tiles
    for TSA, projected image bands for SCA). The caller computes each
    (batch, tile)'s touched-row interval; this kernel contracts the mask
    against just that slab (dynamic start, static size), falling back to
    the exact full-width path for the rare tile whose sampling spread
    exceeds the slab. Numerically identical to the full kernel: a sample
    outside the slab can only exist when wide=1, which routes to the full
    path."""
    b = pl.program_id(0)
    q = pl.program_id(2)
    (h, w) = spatial_shapes[0]
    wp = w + 2
    QT = loc_ref.shape[2]
    P = num_points
    D = head_dim
    active = tmask_ref[b, q] > 0
    wide = wide_ref[b, q] > 0

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[0, 0, :, :] = jnp.zeros_like(out_ref[0, 0, :, :])

    @pl.when(active & wide)
    def _():
        _msda_kernel_v2(
            patch_ref, loc_ref, attn_ref, out_ref,
            spatial_shapes=spatial_shapes, num_points=P, head_dim=D,
            precision=precision,
        )

    @pl.when(active & jnp.logical_not(wide))
    def _():
        # slab_ref carries start // sublane_align; multiplying by the static
        # align constant in-kernel lets Mosaic PROVE the dynamic vector.load
        # offset is sublane-aligned (raw SMEM scalars have no divisibility
        # info -> "cannot statically prove index is a multiple of 8").
        base = slab_ref[b, q] * sublane_align
        patch = patch_ref[0, 0, pl.ds(base, slab_elems), :]
        kdt = patch_ref.dtype
        col = jax.lax.broadcasted_iota(jnp.int32, (QT, slab_elems), 1)
        acc = jnp.zeros((QT, D), dtype=jnp.float32)
        prec = precision or jax.lax.Precision.HIGHEST
        for p in range(P):
            px = loc_ref[0, 0, :, 2 * p:2 * p + 1].astype(jnp.float32) * w - 0.5
            py = loc_ref[0, 0, :, 2 * p + 1:2 * p + 2].astype(jnp.float32) * h - 0.5
            aw = attn_ref[0, 0, :, p:p + 1].astype(jnp.float32)
            x0 = jnp.floor(px)
            y0 = jnp.floor(py)
            fx = px - x0
            fy = py - y0
            x0 = x0.astype(jnp.int32)
            y0 = y0.astype(jnp.int32)
            inside = (
                (x0 >= -1) & (x0 <= w - 1) & (y0 >= -1) & (y0 <= h - 1)
            ).astype(jnp.float32)
            idx = (jnp.clip(y0, -1, h - 1) + 1) * wp + (
                jnp.clip(x0, -1, w - 1) + 1
            ) - base
            mask = (col == idx).astype(kdt)
            rows = jnp.dot(
                mask, patch,
                preferred_element_type=jnp.float32, precision=prec,
            )
            s = aw * inside
            acc = (
                acc
                + rows[:, 0:D] * ((1 - fx) * (1 - fy) * s)
                + rows[:, D:2 * D] * (fx * (1 - fy) * s)
                + rows[:, 2 * D:3 * D] * ((1 - fx) * fy * s)
                + rows[:, 3 * D:4 * D] * (fx * fy * s)
            )
        out_ref[0, 0, :, :] = acc.astype(out_ref.dtype)


def _slab_bounds(loc, spatial_shapes, q_tile, slab_elems, B, H, align=8):
    """Per-(batch, tile) flat slab starts + wide flags from the sampling
    locations. loc: (B, H, Qp, L*P*2) with L == 1. A tile is 'wide' when
    its touched flat-index interval does not fit in slab_elems.

    align: sublane alignment of the dynamic start — 8 for f32 patches,
    16 for bf16 (TPU (16, 128) tiling)."""
    (h, w) = spatial_shapes[0]
    wp = w + 2
    vp = (h + 2) * wp
    Qp = loc.shape[2]
    n_tiles = Qp // q_tile
    ll = loc.reshape(B, H, n_tiles, q_tile, -1, 2)
    py = ll[..., 1].astype(jnp.float32) * h - 0.5
    y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), -1, h - 1) + 1  # [0, h]
    rmin = y0.min(axis=(1, 3, 4))          # (B, n_tiles)
    rmax = y0.max(axis=(1, 3, 4)) + 1      # +1: lower bilinear corner row
    base = (rmin * wp) // align * align    # sublane-aligned flat start
    base = jnp.clip(base, 0, max(vp - slab_elems, 0))
    base = base // align * align           # re-align: the clip cap (vp -
    #                                        slab_elems) need not be aligned
    wide = ((rmax + 1) * wp > base + slab_elems).astype(jnp.int32)
    # the kernel rebuilds base as (base // align) * align so Mosaic can prove
    # the dynamic-slice alignment — return it pre-divided
    return (base // align).astype(jnp.int32), wide


def _msda_pallas_fwd_impl(
    value, spatial_shapes, sampling_locations, attention_weights, *,
    interpret=False, q_tile=128, tile_mask=None, fast=False, slab_rows=None,
    scatter=True,
):
    precision = jax.lax.Precision.DEFAULT if fast else None
    B, V, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    QT = q_tile
    Qp = ((Q + QT - 1) // QT) * QT
    # (B, Q, H, L, P, 2) -> (B, H, Qp, L*P*2): head is a grid dimension
    loc = sampling_locations.reshape(B, Q, H, L * P * 2).transpose(0, 2, 1, 3)
    attn = attention_weights.reshape(B, Q, H, L * P).transpose(0, 2, 1, 3)
    if Qp != Q:
        loc = jnp.pad(loc, [(0, 0), (0, 0), (0, Qp - Q), (0, 0)])
        attn = jnp.pad(attn, [(0, 0), (0, 0), (0, Qp - Q), (0, 0)])
    kdtype = jnp.bfloat16 if fast else None
    if scatter:
        operand = _build_padded_value(value, spatial_shapes, dtype=kdtype)
        OW = D  # operand width per head
        k_plain, k_masked, k_slab = (
            _msda_kernel_v3, _msda_kernel_v3_masked, _msda_kernel_slab_v3)
        dots_per_level = 1
    else:
        operand = _build_patches(value, spatial_shapes, dtype=kdtype)
        OW = 4 * D
        k_plain, k_masked, k_slab = (
            _msda_kernel_v2, _msda_kernel_v2_masked, _msda_kernel_slab)
        dots_per_level = P
    Vp = operand.shape[2]
    shapes_t = tuple(tuple(s) for s in spatial_shapes)
    cost = pl.CostEstimate(
        flops=2 * B * Qp * H * L * dots_per_level * (Vp // max(L, 1)) * OW,
        bytes_accessed=B * (Vp * H * OW * 4 + Qp * H * L * P * 6 * 4),
        transcendentals=0,
    )
    common = dict(
        out_shape=jax.ShapeDtypeStruct((B, H, Qp, D), value.dtype),
        interpret=interpret,
        cost_estimate=cost,
    )
    if slab_rows is not None and L == 1:
        (h0, w0) = spatial_shapes[0]
        wp0 = w0 + 2
        align = 16 if operand.dtype == jnp.bfloat16 else 8
        slab_elems = min(((slab_rows * wp0 + align - 1) // align) * align, Vp)
        n_tiles = Qp // QT
        base, wide = _slab_bounds(loc, spatial_shapes, QT, slab_elems, B, H,
                                  align=align)
        tm = (tile_mask.astype(jnp.int32) if tile_mask is not None
              else jnp.ones((B, n_tiles), jnp.int32))
        assert tm.shape == (B, n_tiles), (tm.shape, (B, n_tiles))
        kernel = functools.partial(
            k_slab,
            spatial_shapes=shapes_t, num_points=P, head_dim=D,
            slab_elems=slab_elems, sublane_align=align,
            precision=precision,
        )
        cost_slab = pl.CostEstimate(
            flops=2 * B * Qp * H * dots_per_level * slab_elems * OW,
            bytes_accessed=cost.bytes_accessed,
            transcendentals=0,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, H, n_tiles),
            in_specs=[
                pl.BlockSpec((1, 1, Vp, OW),
                             lambda b, h, q, s, wf, m: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, QT, L * P * 2),
                             lambda b, h, q, s, wf, m: (b, h, q, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, QT, L * P),
                             lambda b, h, q, s, wf, m: (b, h, q, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, QT, D),
                                   lambda b, h, q, s, wf, m: (b, h, q, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=common["out_shape"], interpret=interpret,
            cost_estimate=cost_slab,
        )(base, wide, tm, operand, loc, attn)
        return out[:, :, :Q].transpose(0, 2, 1, 3).reshape(B, Q, H * D)
    if tile_mask is not None:
        n_tiles = Qp // QT
        tm = tile_mask.astype(jnp.int32)
        assert tm.shape == (B, n_tiles), (tm.shape, (B, n_tiles))
        kernel = functools.partial(
            k_masked,
            spatial_shapes=shapes_t, num_points=P, head_dim=D,
            precision=precision,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, n_tiles),
            in_specs=[
                pl.BlockSpec((1, 1, Vp, OW),
                             lambda b, h, q, m: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, QT, L * P * 2),
                             lambda b, h, q, m: (b, h, q, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, QT, L * P),
                             lambda b, h, q, m: (b, h, q, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, QT, D),
                                   lambda b, h, q, m: (b, h, q, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, **common
        )(tm, operand, loc, attn)
    else:
        kernel = functools.partial(
            k_plain,
            spatial_shapes=shapes_t, num_points=P, head_dim=D,
            precision=precision,
        )
        out = pl.pallas_call(
            kernel,
            grid=(B, H, Qp // QT),
            in_specs=[
                pl.BlockSpec((1, 1, Vp, OW), lambda b, h, q: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, QT, L * P * 2),
                             lambda b, h, q: (b, h, q, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, QT, L * P), lambda b, h, q: (b, h, q, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, QT, D), lambda b, h, q: (b, h, q, 0),
                                   memory_space=pltpu.VMEM),
            **common,
        )(operand, loc, attn)
    # (B, H, Qp, D) -> (B, Q, H*D)
    return out[:, :, :Q].transpose(0, 2, 1, 3).reshape(B, Q, H * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 6))
def ms_deform_attn_pallas(
    value,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations,
    attention_weights,
    fast: bool = False,
    tile_mask=None,
    slab_rows=None,
):
    return _msda_pallas_fwd_impl(
        value, spatial_shapes, sampling_locations, attention_weights,
        tile_mask=tile_mask, fast=fast, slab_rows=slab_rows,
    )


def _fwd(value, spatial_shapes, sampling_locations, attention_weights,
         fast, tile_mask, slab_rows):
    out = _msda_pallas_fwd_impl(
        value, spatial_shapes, sampling_locations, attention_weights,
        tile_mask=tile_mask, fast=fast, slab_rows=slab_rows,
    )
    return out, (value, sampling_locations, attention_weights, tile_mask)


def _bwd(spatial_shapes, fast, slab_rows, residuals, g):
    # Backward uses the unmasked XLA VJP: skipped tiles only exist where the
    # caller zeroes the output (and hence the cotangent) anyway.
    from apollo_vision_net_tpu.ops.msda import ms_deform_attn_xla

    value, sampling_locations, attention_weights, tile_mask = residuals
    _, vjp = jax.vjp(
        lambda v, s, a: ms_deform_attn_xla(v, spatial_shapes, s, a),
        value, sampling_locations, attention_weights,
    )
    dv, ds, da = vjp(g)
    return dv, ds, da, None


ms_deform_attn_pallas.defvjp(_fwd, _bwd)
