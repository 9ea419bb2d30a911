"""Fused Pallas TPU kernel for multi-scale deformable attention.

TPU-first design — NOT a translation of the CUDA kernel
(reference mmcv ``ms_deform_attn``): TPUs do per-row gathers at a fixed
~17 ns/row (measured, v5e), so instead each grid program materializes a
weighted scatter mask ``W ∈ R^{Q_tile × V_pad}`` on the VPU and contracts
it against the level's 1-ring zero-padded value block with ONE MXU matmul
per (head, level): ``out = W @ value``.

The mask exploits that the bilinear weight is SEPARABLE: point p's
contribution to padded cell (y, x) is exactly
``attn_p · relu(1-|x-px|) · relu(1-|y-py|)`` — two hat functions whose
2-cell supports are the bilinear corners, with the padding ring supplying
grid_sample's zero-padding semantics. Pure f32 VPU arithmetic on a flat
iota; no gathers, no integer compare/select chains, no 2×2 patch
expansion (an earlier design contracted one 0/1 mask per point against a
4D-wide patched operand: 8× the MXU streaming and 4× the VMEM for the
same math — measured slower).

Grid layout: one program per (batch, query-tile); ALL heads are processed
inside the program (unrolled loop). Per-program grid overhead on TPU is
~2 µs (measured: a 960-program grid costs 1.9 ms even when every program
is masked off and writes zeros), so head-per-program grids waste more
time sequencing programs than computing — folding the 8 heads into one
program cuts that fixed cost 8×.

Three variants share the weighted-mask body:
- plain: every (batch, tile) computed;
- masked: scalar-prefetched tile visibility skips (batch, tile) programs
  entirely — the TPU-native equivalent of the reference SCA's per-camera
  query rebatching (spatial_cross_attention.py:136-165);
- slab: single-level row-windowed — a spatially compact query tile only
  samples a narrow band of value rows (BEV tiles for TSA, projected
  camera bands for SCA), so the contraction runs against a
  dynamically-positioned row slab, with an exact full-width fallback for
  the rare wide tile.

The padded value for one batch element lives in VMEM, so the kernel
covers BEV grids ≤ ~128×128 (bf16) and image pyramids of similar size;
larger operands fall back to the XLA patch-gather path in ``msda.py``.

Differentiation: forward runs the Pallas kernel; backward reuses the VJP
of the (numerically identical) XLA implementation.
"""
from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget: the padded value block (Vp · H · D · itemsize) must fit
# comfortably alongside the transient (Q_tile, S) masks.
_VMEM_VALUE_LIMIT_BYTES = 12 * 1024 * 1024
_MAX_LEVEL_SIZE = 8192


def _padded_sizes(spatial_shapes):
    return [(h + 2) * (w + 2) for h, w in spatial_shapes]


def is_profitable(value, spatial_shapes, sampling_locations,
                  itemsize: int = 4) -> bool:
    """itemsize: bytes per operand element (2 in fast/bf16 mode — doubles
    the grid size the kernel covers before falling back to XLA gathers)."""
    B, V, H, D = value.shape
    vp = sum(_padded_sizes(spatial_shapes))
    if vp * H * D * itemsize > _VMEM_VALUE_LIMIT_BYTES:
        return False
    if max(_padded_sizes(spatial_shapes)) > _MAX_LEVEL_SIZE:
        return False
    return True


def _build_padded_value(value, spatial_shapes, dtype=None):
    """(B, V, H, D) -> (B, H, Vp, D): per-level zero-padded (+1 ring) value,
    head-major. ``dtype`` (fast mode: bfloat16) casts before the build so
    the operand is stored and DMA'd at half width and the contraction runs
    as a native single-pass bf16 MXU matmul."""
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


def _weighted_mask(loc_hd, attn_hd, *, lvl, num_points, h, w, QT, S, base,
                   yx=None):
    """Combined (QT, S) scatter mask for one (head, level).

    loc_hd: (QT, L*P*2) this head's sampling locations; attn_hd: (QT, L*P).
    ``base``: flat offset of the value window (slab start; 0 full-width).
    Samples fully outside the grid are zeroed by the ``inside`` flag,
    which matches the reference clip+mask exactly; border corners land on
    the zero padding ring.

    The mask build is pinned to f32. A bf16 variant (int/frac-split hat
    arithmetic to keep the cell coords exact) was measured 1.4x SLOWER
    end-to-end: Mosaic does not pack these mixed-width VPU chains, so the
    extra passes only added cost (round-2 negative result)."""
    wp = w + 2
    if yx is not None:
        # caller-precomputed padded-grid coords (hoisted across the head
        # loop: the iota + integer div/mod are identical for all heads)
        yc, xc = yx
    else:
        col = jax.lax.broadcasted_iota(jnp.int32, (QT, S), 1) + base
        # padded-grid integer coords of every flat cell (computed once,
        # amortized over the point loop)
        yc = (col // wp).astype(jnp.float32)
        xc = (col % wp).astype(jnp.float32)
    Wm = jnp.zeros((QT, S), jnp.float32)
    for p in range(num_points):
        flat = lvl * num_points + p
        # PADDED coords: img coord + 1  (px_img = loc*w - 0.5)
        px = loc_hd[:, 2 * flat:2 * flat + 1].astype(jnp.float32) * w + 0.5
        py = loc_hd[:, 2 * flat + 1:2 * flat + 2].astype(jnp.float32) * h + 0.5
        aw = attn_hd[:, flat:flat + 1].astype(jnp.float32)
        # inside: the sample's 2x2 support intersects the image
        inside = (
            (px > 0.0) & (px < w + 1.0) & (py > 0.0) & (py < h + 1.0)
        ).astype(jnp.float32)
        s = aw * inside
        wx = jnp.maximum(1.0 - jnp.abs(xc - px), 0)
        wy = jnp.maximum(1.0 - jnp.abs(yc - py), 0)
        Wm = Wm + s * wx * wy
    return Wm


def _contract_all_heads(
    value_ref, loc_ref, attn_ref, out_ref, *,
    spatial_shapes, num_points, head_dim, precision,
):
    """Full-width body: for every head, build the per-level scatter mask
    and contract against that level's value block.

    loc/attn ride in their NATURAL (QT, H·L·P·…) layout — the head axis
    lives in lanes, so the head loop is a static Python unroll (a traced
    lane offset would force Mosaic lane-rotate ops; a static slice is
    free). The old head-major (H, QT, LP) layout needed a host-side
    transpose copy AND lane-padded LP=8 → 128 in every VMEM block (16×
    DMA bloat) — measured ~0.9 ms/frame of pad/copy glue at the flagship."""
    H = value_ref.shape[1]
    QT = loc_ref.shape[1]
    D = head_dim
    L = len(spatial_shapes)
    P = num_points
    lp2, lp = L * P * 2, L * P
    pstarts = np.concatenate([[0], np.cumsum(_padded_sizes(spatial_shapes))])
    kdt = value_ref.dtype
    prec = precision or jax.lax.Precision.HIGHEST

    # padded-grid coords per level, hoisted across the head loop (the
    # iota + integer div/mod are identical for all heads)
    yxs = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        S = int(pstarts[lvl + 1] - pstarts[lvl])
        col = jax.lax.broadcasted_iota(jnp.int32, (QT, S), 1)
        yxs.append(((col // (w + 2)).astype(jnp.float32),
                    (col % (w + 2)).astype(jnp.float32)))

    for hh in range(H):
        loc_hd = loc_ref[0, :, hh * lp2:(hh + 1) * lp2]
        attn_hd = attn_ref[0, :, hh * lp:(hh + 1) * lp]
        acc = jnp.zeros((QT, D), dtype=jnp.float32)
        for lvl, (h, w) in enumerate(spatial_shapes):
            S = int(pstarts[lvl + 1] - pstarts[lvl])
            vblock = value_ref[0, hh, pstarts[lvl]:pstarts[lvl + 1], :]
            Wm = _weighted_mask(
                loc_hd, attn_hd, lvl=lvl,
                num_points=num_points, h=h, w=w, QT=QT, S=S, base=0,
                yx=yxs[lvl],
            )
            acc = acc + jnp.dot(
                Wm.astype(kdt), vblock,
                preferred_element_type=jnp.float32, precision=prec,
            )
        out_ref[0, hh, :, :] = acc.astype(out_ref.dtype)


def _msda_kernel(
    value_ref,  # (1, H, Vp, D) — one batch element's padded value
    loc_ref,    # (1, QT, H*L*P*2) natural layout
    attn_ref,   # (1, QT, H*L*P)
    out_ref,    # (1, H, QT, D)
    *,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    num_points: int,
    head_dim: int,
    precision=None,
):
    _contract_all_heads(
        value_ref, loc_ref, attn_ref, out_ref,
        spatial_shapes=spatial_shapes, num_points=num_points,
        head_dim=head_dim, precision=precision,
    )


def _msda_kernel_masked(
    tile_mask_ref,  # scalar prefetch: (B, n_qtiles) int32
    value_ref, loc_ref, attn_ref, out_ref,
    *, spatial_shapes, num_points, head_dim, precision=None,
):
    b = pl.program_id(0)
    q = pl.program_id(1)
    active = tile_mask_ref[b, q] > 0

    @pl.when(active)
    def _():
        _contract_all_heads(
            value_ref, loc_ref, attn_ref, out_ref,
            spatial_shapes=spatial_shapes, num_points=num_points,
            head_dim=head_dim, precision=precision,
        )

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[0, :, :, :] = jnp.zeros_like(out_ref[0, :, :, :])


def _msda_kernel_slab(
    slab_ref,       # scalar prefetch: (B, n_qtiles) int32 slab starts / align
    wide_ref,       # (B, n_qtiles) int32: 1 -> slab overflow, use full width
    tmask_ref,      # (B, n_qtiles) int32 tile visibility
    value_ref, loc_ref, attn_ref, out_ref,
    *, spatial_shapes, num_points, head_dim, slab_elems, sublane_align,
    precision=None,
):
    """Row-slab windowed variant (single level). Numerically identical to
    the full kernel: a sample outside the slab can only exist when wide=1,
    which routes to the full-width path."""
    b = pl.program_id(0)
    q = pl.program_id(1)
    (h, w) = spatial_shapes[0]
    H = value_ref.shape[1]
    QT = loc_ref.shape[1]
    D = head_dim
    P = num_points
    active = tmask_ref[b, q] > 0
    wide = wide_ref[b, q] > 0

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[0, :, :, :] = jnp.zeros_like(out_ref[0, :, :, :])

    @pl.when(active & wide)
    def _():
        _contract_all_heads(
            value_ref, loc_ref, attn_ref, out_ref,
            spatial_shapes=spatial_shapes, num_points=num_points,
            head_dim=D, precision=precision,
        )

    @pl.when(active & jnp.logical_not(wide))
    def _():
        # slab_ref carries start // sublane_align; multiplying by the
        # static align constant in-kernel lets Mosaic PROVE the dynamic
        # vector.load offset is sublane-aligned (raw SMEM scalars have no
        # divisibility info -> "cannot statically prove index is a
        # multiple of 8").
        base = slab_ref[b, q] * sublane_align
        kdt = value_ref.dtype
        prec = precision or jax.lax.Precision.HIGHEST
        col = jax.lax.broadcasted_iota(
            jnp.int32, (QT, slab_elems), 1) + base
        yx = ((col // (w + 2)).astype(jnp.float32),
              (col % (w + 2)).astype(jnp.float32))

        for hh in range(H):
            vblock = value_ref[0, hh, pl.ds(base, slab_elems), :]
            Wm = _weighted_mask(
                loc_ref[0, :, hh * P * 2:(hh + 1) * P * 2],
                attn_ref[0, :, hh * P:(hh + 1) * P], lvl=0,
                num_points=num_points, h=h, w=w, QT=QT, S=slab_elems,
                base=base, yx=yx,
            )
            out_ref[0, hh, :, :] = jnp.dot(
                Wm.astype(kdt), vblock,
                preferred_element_type=jnp.float32, precision=prec,
            ).astype(out_ref.dtype)


def _slab_bounds(loc, spatial_shapes, q_tile, slab_elems, B, H, align=8):
    """Per-(batch, tile) flat slab starts + wide flags from the sampling
    locations. loc: natural (B, Qp, H*L*P*2) with L == 1. A tile is 'wide'
    when its touched flat-index interval does not fit in slab_elems. The
    bounds pool over heads: all heads share one slab per (batch, tile).

    align: sublane alignment of the dynamic start — 8 for f32 operands,
    16 for bf16 (TPU (16, 128) tiling)."""
    (h, w) = spatial_shapes[0]
    wp = w + 2
    vp = (h + 2) * wp
    Qp = loc.shape[1]
    n_tiles = Qp // q_tile
    ll = loc.reshape(B, n_tiles, q_tile, H, -1, 2)
    py = ll[..., 1].astype(jnp.float32) * h - 0.5
    y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), -1, h - 1) + 1  # [0, h]
    rmin = y0.min(axis=(2, 3, 4))          # (B, n_tiles)
    rmax = y0.max(axis=(2, 3, 4)) + 1      # +1: lower bilinear corner row
    base = (rmin * wp) // align * align    # sublane-aligned flat start
    base = jnp.clip(base, 0, max(vp - slab_elems, 0))
    base = base // align * align           # re-align: the clip cap (vp -
    #                                        slab_elems) need not be aligned
    wide = ((rmax + 1) * wp > base + slab_elems).astype(jnp.int32)
    # the kernel rebuilds base as slab_ref * align so Mosaic can prove the
    # dynamic-slice alignment — return it pre-divided
    return (base // align).astype(jnp.int32), wide


def _build_level_value(value, spatial_shapes, lvl, dtype, align):
    """One level's (B, H, Vp_l_pad, D) padded value block, flat size padded
    up to a multiple of ``align`` with zero rows. Separate per-level buffers
    (instead of one concatenated operand) keep every dynamic slab start
    provably ``align``-aligned — the concatenated layout's level offsets
    (pstarts) are not multiples of the bf16 sublane tile. Zero pad rows are
    harmless: stray mask weights on phantom cells multiply zero values."""
    if dtype is not None and value.dtype != dtype:
        value = value.astype(dtype)
    B, V, H, D = value.shape
    sizes = [h * w for h, w in spatial_shapes]
    starts = np.concatenate([[0], np.cumsum(sizes)])
    (h, w) = spatial_shapes[lvl]
    v = jax.lax.slice_in_dim(
        value, int(starts[lvl]), int(starts[lvl + 1]), axis=1
    ).reshape(B, h, w, H, D).transpose(0, 3, 1, 2, 4)  # (B,H,h,w,D)
    vp = jnp.pad(v, [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)])
    flat = vp.reshape(B, H, (h + 2) * (w + 2), D)
    vp_pad = ((h + 2) * (w + 2) + align - 1) // align * align
    if vp_pad != flat.shape[2]:
        flat = jnp.pad(flat, [(0, 0), (0, 0), (0, vp_pad - flat.shape[2]),
                              (0, 0)])
    return flat


def _ml_chunk_bounds(loc, spatial_shapes, q_tile, chunk_elems, n_chunks,
                     B, H, q_valid=None):
    """Per-(level, batch, tile) [lo, hi) CHUNK-index bounds covering the
    tile's sampling extent. loc: natural (B, Qp, H*L*P*2). Pooling masks
    out zero-padded tail queries (q >= q_valid) so they don't drag the
    bounds to row 0; out-of-grid samples are clipped into the padded grid
    (they only widen the bounds — exactness is unconditional since every
    touched cell lies inside some covered chunk)."""
    L = len(spatial_shapes)
    Qp = loc.shape[1]
    n_tiles = Qp // q_tile
    ll = loc.reshape(B, n_tiles, q_tile, H, L, -1, 2)
    tail = None
    if q_valid is not None and q_valid != Qp:
        qidx = jnp.arange(Qp).reshape(n_tiles, q_tile)
        tail = (qidx < q_valid)[None, :, :, None, None]  # (1,T,QT,1,1)
    los, his = [], []
    for lvl, (h, w) in enumerate(spatial_shapes):
        wp = w + 2
        py = ll[..., lvl, :, 1].astype(jnp.float32) * h - 0.5
        y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), -1, h - 1) + 1
        if tail is not None:
            rmin = jnp.where(tail, y0, h + 1).min(axis=(2, 3, 4))
            rmax = jnp.where(tail, y0, -1).max(axis=(2, 3, 4)) + 1
        else:
            rmin = y0.min(axis=(2, 3, 4))
            rmax = y0.max(axis=(2, 3, 4)) + 1
        lo = jnp.clip((rmin * wp) // chunk_elems[lvl], 0,
                      n_chunks[lvl])
        hi = jnp.clip(-(-((rmax + 1) * wp) // chunk_elems[lvl]), 0,
                      n_chunks[lvl])
        los.append(lo.astype(jnp.int32))
        his.append(hi.astype(jnp.int32))
    return jnp.stack(los), jnp.stack(his)  # (L, B, n_tiles) each


def _msda_kernel_ml_chunk(
    lo_ref,     # scalar prefetch: (L, B, n_tiles) int32 first chunk
    hi_ref,     # (L, B, n_tiles) int32 one-past-last chunk
    tmask_ref,  # (B, n_tiles) int32 tile visibility
    *refs,      # v_0..v_{L-1}, loc_ref, attn_ref, out_ref
    spatial_shapes, num_points, head_dim, chunk_elems, precision=None,
):
    """Multi-level chunked variant of the masked kernel (base-scale SCA):
    each level's padded grid is cut into fixed chunk_elems-cell column
    chunks; a tile contracts only against the [lo, hi) chunks its sampling
    extent touches (typically one). ALWAYS exact — no clamping, no wide
    fallback: a chunk either contains a sample's bilinear support cells
    (covered by the bounds) or contributes zero. The single straight-line
    body sidesteps the pl.when dual-path structure, which executed both
    branches' cost at every program (measured 269 ms vs 76+106 ms split at
    base-SCA shapes), and the bounded (QT, chunk) mask temporaries keep the
    Mosaic stack small enough for q_tile=128."""
    L = len(spatial_shapes)
    value_refs = refs[:L]
    loc_ref, attn_ref, out_ref = refs[L], refs[L + 1], refs[L + 2]
    b = pl.program_id(0)
    q = pl.program_id(1)
    H = value_refs[0].shape[1]
    QT = loc_ref.shape[1]
    D = head_dim
    P = num_points
    lp2, lp = L * P * 2, L * P
    active = tmask_ref[b, q] > 0
    kdt = value_refs[0].dtype
    prec = precision or jax.lax.Precision.HIGHEST

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[0, :, :, :] = jnp.zeros_like(out_ref[0, :, :, :])

    @pl.when(active)
    def _():
        accs = [jnp.zeros((QT, D), jnp.float32) for _ in range(H)]
        for lvl, (h, w) in enumerate(spatial_shapes):
            S = chunk_elems[lvl]

            def chunk_body(c, accs, lvl=lvl, h=h, w=w, S=S):
                base = c * S
                wp = w + 2
                col = jax.lax.broadcasted_iota(jnp.int32, (QT, S), 1) + base
                yx = ((col // wp).astype(jnp.float32),
                      (col % wp).astype(jnp.float32))
                new = []
                for hh in range(H):
                    loc_hd = loc_ref[0, :, hh * lp2:(hh + 1) * lp2]
                    attn_hd = attn_ref[0, :, hh * lp:(hh + 1) * lp]
                    vblock = value_refs[lvl][0, hh, pl.ds(base, S), :]
                    Wm = _weighted_mask(
                        loc_hd, attn_hd, lvl=lvl, num_points=P,
                        h=h, w=w, QT=QT, S=S, base=base, yx=yx,
                    )
                    new.append(accs[hh] + jnp.dot(
                        Wm.astype(kdt), vblock,
                        preferred_element_type=jnp.float32, precision=prec,
                    ))
                return tuple(new)

            accs = jax.lax.fori_loop(
                lo_ref[lvl, b, q], hi_ref[lvl, b, q], chunk_body,
                tuple(accs))
        for hh in range(H):
            out_ref[0, hh, :, :] = accs[hh].astype(out_ref.dtype)


def _build_level_value_2dT(value, spatial_shapes, lvl, dtype, row_align,
                           col_block):
    """One level's column-blocked (B, H, n_cb, hp_pad, CB·D) operand:
    1-ring zero-padded grid, columns grouped into CB-cell blocks (CB·D =
    one 128-LANE group for D=32 — exact, no lane padding waste), padded
    rows in SUBLANES (rounded up to row_align=8 — exact).
    v[b, h, c, r, k·D + d] = grid cell (r, c·CB + k) channel d. The pt2d
    kernel contracts over rows via dot_general on lhs dim 0 (the MXU
    takes the transposed feed natively), producing g in (CB·D, P·QT)
    orientation, where the per-column post-weights are sublane broadcasts
    and the point reduction is vreg-aligned lane slices (the
    natural-orientation kernel spent 6x the matmul time on (QT, 1)-lane-
    sliced post ops). Rows-in-lanes was the first layout here; it padded
    hp to 128 lanes — 2x resident VMEM (13 MB vs 6.6 at base scale),
    enough to crash the TPU worker inside large combined graphs."""
    if dtype is not None and value.dtype != dtype:
        value = value.astype(dtype)
    B, V, H, D = value.shape
    sizes = [h * w for h, w in spatial_shapes]
    starts = np.concatenate([[0], np.cumsum(sizes)])
    (h, w) = spatial_shapes[lvl]
    hp, wp = h + 2, w + 2
    hp_pad = -(-hp // row_align) * row_align
    n_cb = -(-wp // col_block)
    # ONE transpose (pad fuses into its input, the (CB, D) merge into its
    # output): the head-major two-transpose form materialized an extra
    # full-size copy per (level, layer) — this build runs inside every
    # encoder layer (value_proj is per-layer), so the copies were ~12% of
    # the base-config frame
    v = jax.lax.slice_in_dim(
        value, int(starts[lvl]), int(starts[lvl + 1]), axis=1
    ).reshape(B, h, w, H, D)
    v = jnp.pad(v, [(0, 0), (1, hp_pad - hp + 1),
                    (1, n_cb * col_block - wp + 1), (0, 0), (0, 0)])
    v = v.reshape(B, hp_pad, n_cb, col_block, H, D)
    v = v.transpose(0, 4, 2, 1, 3, 5)  # (B, H, n_cb, hp_pad, CB, D)
    return v.reshape(B, H, n_cb, hp_pad, col_block * D)


def _pack_tile_major(loc_flat, attn_flat, spatial_shapes, num_heads,
                     num_points, q_tile):
    """(B,Qp,H·L·P·2)+(B,Qp,H·L·P) flat operands -> tile-major lane-packed
    kernel operands pxs/pys (padded-grid pixel coords) and ss
    (attention · inside), each (B, n_tiles, L·H, P·q_tile) f32: value at
    [b, t, lvl·H + h, p·QT + q] belongs to sample (query t·QT+q, head h,
    level lvl, point p); blocked axes (b, t) lead so the VMEM block's
    trailing two dims are full-size (the Pallas TPU (8, 128)-divisibility
    rule). In this layout every per-(head, point) scalar the kernel needs
    sits along LANES in (1, P·QT) rows, so the row-hat build and the
    column post-weights are sublane broadcasts — the natural (QT, 1)
    orientation cost ~50 cycles per scalar op in Mosaic (measured: the
    post-weight loop alone was 6x the kernel's matmul time). Coordinate
    scaling / inside flag / s-fold also happen here, as fused XLA
    elementwise.

    Inputs MUST be the flat (512-wide minor dim) layout: a 6-D
    (..., P, 2) operand materialized row-major pads its minor dim 2 to
    128 lanes under TPU tiling — a 64x (31 GB at base-SCA scale) copy
    that OOM-crashed the TPU worker when XLA chose to materialize it at a
    fusion boundary inside the encoder graph. Reshaping the materialized
    flat buffer is free; the 6-D view lives only inside this fusion.

    Order of operations: scale on the FLAT side (a (H·L·P·2,)-constant
    multiply that fuses INTO the pack's transpose copy), pack x/y as the
    two dim-0 slots of ONE buffer (the Pallas caller addresses slot 0/1
    through BlockSpec index maps — no slice copies), inside/s-fold in
    packed space. Doing the coordinate math in 6-D space made XLA
    materialize a chain of full-size 6-D intermediates with conflicting
    layouts (reshape/copy/pad/slice-reduce, ~9-13 ms EACH at base-SCA
    scale, ~190 ms/frame of glue in the traced encoder); a first
    transpose-THEN-scale variant materialized both the raw and the
    scaled packs (+9 ms/call).

    Returns (pxyk, sk): pxyk (2, B, n_tiles, L·H, P·QT) padded-grid
    pixel coords (x = slot 0, y = slot 1), sk (B, n_tiles, L·H, P·QT)
    attention · inside."""
    B, Qp, _ = loc_flat.shape
    H, P, L = num_heads, num_points, len(spatial_shapes)
    n_tiles = Qp // q_tile

    def pack(a, nd):  # (B, Qp, H·L·P·nd) -> (nd, B, n_tiles, L·H, P·QT)
        a = a.reshape(B, n_tiles, q_tile, H, L, P, nd)
        a = a.transpose(6, 0, 1, 4, 3, 5, 2)  # (nd, B, T, L, H, P, QT)
        return a.reshape(nd, B, n_tiles, L * H, P * q_tile)

    # per-flat-index scale: even components x(w_l), odd y(h_l)
    whv = np.empty(H * L * P * 2, np.float32)
    fi = np.arange(H * L * P * 2)
    l_of = (fi // (2 * P)) % L
    wh = np.array([[w, h] for h, w in spatial_shapes], np.float32)
    whv[:] = wh[l_of, fi % 2]
    pxy_flat = loc_flat.astype(jnp.float32) * whv[None, None] + 0.5
    pxyk = pack(pxy_flat, 2)
    # attention rides in its caller dtype (bf16 in fast mode — halves the
    # sk buffer + its kernel DMA; coords stay f32: bf16 would quantize a
    # padded 100-grid coordinate by ~0.4 cell)
    ak = pack(attn_flat, 1)[0]

    # per-packed-row (lvl·H + h) bound constants; broadcast over lanes
    wv = np.repeat(np.array([w for h, w in spatial_shapes], np.float32), H)
    hv = np.repeat(np.array([h for h, w in spatial_shapes], np.float32), H)
    wv = wv.reshape(1, 1, L * H, 1)
    hv = hv.reshape(1, 1, L * H, 1)
    pxk, pyk = pxyk[0], pxyk[1]
    inside = ((pxk > 0.0) & (pxk < wv + 1.0)
              & (pyk > 0.0) & (pyk < hv + 1.0))
    sk = ak * inside.astype(ak.dtype)
    return pxyk, sk


def _pack_tile_major_factored(ref_flat, off_flat, attn_flat, spatial_shapes,
                              num_heads, num_points, q_tile):
    """Factored-operand variant of ``_pack_tile_major`` (same outputs).

    SCA's sampling locations are ``loc = ref_cam + offsets / wh`` where the
    reference points are PER CAMERA (batch dim B = Bq·num_cams, but only
    P·2 wide) and the offsets/attention are CAMERA-INVARIANT (predicted
    from the shared BEV query, batch dim Bs = Bq). The unfactored pack
    transposes the materialized per-camera (B, Qp, H·L·P·2) f32 buffer —
    at base-SCA scale ~0.5 GB of layout copies per encoder layer, ~75
    ms/frame traced. Here the transpose runs on the Bs-sized offsets (1/6)
    and the P·2-wide refs (1/32), and the full-size packed buffer is
    written ONCE by the fused broadcast ``ref·wh_l + off + 0.5``.

    ref_flat (B, Qp, P·2): z-repeated [0,1] reference points, flat (p, c)
    minor. off_flat (Bs, Qp, H·L·P·2): RAW-CELL offsets (the Dense output —
    already in grid cells of each level, no 1/wh normalization). attn_flat
    (Bs, Qp, H·L·P): softmaxed weights in their ride dtype. Bs must divide
    B with the replication axis FAST (value batch index b serves shared
    index b // (B // Bs) — SCA's (Bq, N_cam) → Bq·N fold).

    Returns (pxyk, sk) exactly as ``_pack_tile_major``: pxyk
    (2, B, n_tiles, L·H, P·QT) padded-grid pixel coords, sk
    (B, n_tiles, L·H, P·QT) attention · inside."""
    B, Qp, P2 = ref_flat.shape
    H, P, L = num_heads, num_points, len(spatial_shapes)
    assert P2 == P * 2, (P2, P)
    Bs = attn_flat.shape[0]
    assert attn_flat.shape[-1] == H * L * P, (attn_flat.shape, H, L, P)
    assert off_flat.shape[0] == Bs and B % Bs == 0, (off_flat.shape, B, Bs)
    n_tiles = Qp // q_tile

    def pack(a, nd):  # (Bs, Qp, H·L·P·nd) -> (nd, Bs, T, L·H, P·QT)
        bs = a.shape[0]
        a = a.reshape(bs, n_tiles, q_tile, H, L, P, nd)
        a = a.transpose(6, 0, 1, 4, 3, 5, 2)
        return a.reshape(nd, bs, n_tiles, L * H, P * q_tile)

    # refs: QT stays minor through the whole pack (cheap small transpose)
    r = ref_flat.astype(jnp.float32).reshape(B, n_tiles, q_tile, P, 2)
    ref_pack = r.transpose(4, 0, 1, 3, 2).reshape(2, B, n_tiles, P * q_tile)

    off_pack = pack(off_flat.astype(jnp.float32), 2)

    # per-row (r = lvl·H + h) pixel scale wh[l, c]
    wxy = np.array([[w, h] for h, w in spatial_shapes], np.float32)  # (L, 2)
    scale = np.repeat(wxy, H, axis=0).T.reshape(2, 1, 1, 1, L * H, 1)
    N = B // Bs  # replication factor (camera axis, FAST in the value batch)
    refp = ref_pack.reshape(2, Bs, N, n_tiles, 1, P * q_tile)
    pxyk = (refp * jnp.asarray(scale) + off_pack[:, :, None] + 0.5)
    pxyk = pxyk.reshape(2, B, n_tiles, L * H, P * q_tile)

    ak = pack(attn_flat, 1)[0]  # (Bs, T, L·H, P·QT)
    wv = np.repeat(np.array([w for h, w in spatial_shapes], np.float32), H)
    hv = np.repeat(np.array([h for h, w in spatial_shapes], np.float32), H)
    wv = wv.reshape(1, 1, L * H, 1)
    hv = hv.reshape(1, 1, L * H, 1)
    pxk, pyk = pxyk[0], pxyk[1]
    inside = ((pxk > 0.0) & (pxk < wv + 1.0)
              & (pyk > 0.0) & (pyk < hv + 1.0))
    sk = (ak[:, None] * inside.reshape(Bs, N, *inside.shape[1:]).astype(
        ak.dtype)).reshape(B, n_tiles, L * H, P * q_tile)
    return pxyk, sk


def _materialize_factored(ref_flat, off_flat, attn_flat, spatial_shapes,
                          num_heads, num_points):
    """Factored operands -> the flat (B, Qp, H·L·P·2)/(B, Qp, H·L·P)
    loc/attn the non-pt2d paths (slab/chunk kernels, XLA fallback)
    consume. Exact: ``tile`` replicates ref[p % Dz] per (head, level)
    block (the flat layout is (h, l, p, c) minor-last) and the per-index
    1/wh constant matches the caller-side normalization."""
    B, Qp, _ = ref_flat.shape
    Bs = attn_flat.shape[0]
    N = B // Bs
    H, P, L = num_heads, num_points, len(spatial_shapes)
    fi = np.arange(H * L * P * 2)
    l_of = (fi // (2 * P)) % L
    wh = np.array([[w, h] for h, w in spatial_shapes], np.float32)
    inv = (1.0 / wh[l_of, fi % 2]).astype(np.float32)
    off = (off_flat.astype(jnp.float32)
           * jnp.asarray(inv)[None, None]).reshape(Bs, 1, Qp, -1)
    loc = (jnp.tile(ref_flat.astype(jnp.float32), (1, 1, H * L))
           .reshape(Bs, N, Qp, -1) + off).reshape(B, Qp, H * L * P * 2)
    attn = jnp.broadcast_to(
        attn_flat.reshape(Bs, 1, Qp, -1),
        (Bs, N, Qp, H * L * P)).reshape(B, Qp, H * L * P)
    return loc, attn


def _bounds_cols(pxs, spatial_shapes, q_tile, col_block, n_cb, B, H,
                 num_points):
    """Per-(level, batch, tile) [lo, hi) col-block bounds covering the
    tile's bilinear support (exact coverage: padded corner col =
    clip(floor(px), 0, w), support = {col, col+1}). Operates on the
    tile-major packed coords from _pack_tile_major; tail queries need no
    masking — the caller EDGE-pads locations, so padded samples mirror
    the last real query instead of dragging the bounds to the origin."""
    L = len(spatial_shapes)
    B_, n_tiles, LH, PQT = pxs.shape
    px = pxs.reshape(B, n_tiles, L, H, PQT)
    clo, chi = [], []
    for lvl, (h, w) in enumerate(spatial_shapes):
        x0 = jnp.clip(jnp.floor(px[:, :, lvl]).astype(jnp.int32), 0, w)
        cmin = x0.min(axis=(2, 3))
        cmax = x0.max(axis=(2, 3)) + 1
        clo.append(jnp.clip(cmin // col_block, 0, n_cb[lvl]).astype(jnp.int32))
        chi.append(jnp.clip(-(-(cmax + 1) // col_block), 0,
                            n_cb[lvl]).astype(jnp.int32))
    return jnp.stack(clo), jnp.stack(chi)  # (L, B, n_tiles) each


def _msda_kernel_pt2d(
    *args,              # scalar prefetch (see below), v_0..v_{L-1},
                        # pxk_ref, pyk_ref, sk_ref, out_ref
    spatial_shapes, num_points, head_dim, col_block, q_tile,
    compact=False, precision=None,
):
    """Point-stacked column-windowed MSDA kernel, TRANSPOSED orientation
    (base-scale SCA).

    Exploits bilinear-hat separability per point p —
    s_p·wy_p(row)·wx_p(col) — to move the mask work onto the MXU, with
    every vector op in Mosaic's cheap orientation: scalars-per-sample ride
    in LANES as (1, P·QT) rows (tile-major packing), grids put rows in
    lanes / channels in sublanes. Per (level, head) the s-folded row hats
    over the full padded height build as ONE (hp, P·QT) op chain (sublane
    iota × lane row — no (QT, 1) scalar broadcasts, which cost a full
    8-vreg op per scalar and made the natural-orientation variant 3x
    slower than the chunk kernel: 359 vs 110 ms/frame measured); the
    column blocks contract as vT(CB·D, hp) @ W(hp, P·QT) → gT(CB·D, P·QT)
    on the MXU; the column hats apply as ONE (CB·D, P·QT) multiply (built
    from a sublane coordinate iota, k = sublane//D) followed by lane-block
    (over p) and sublane-block (over k) reductions — ~15 big vector ops
    per (head, col-block) instead of P·CB=32 lane-sliced FMAs. The
    [lo, hi) col-block bounds skip the columns the full-width row slabs
    used to stream. ALWAYS exact — any touched cell lies inside some
    covered column block; cells outside a sample's 2-cell hat support
    contribute exactly zero. Output is transposed (B, H, D, Qp); the
    caller untransposes in XLA (one fused copy) rather than paying
    per-program (D, QT) transposes in Mosaic.

    compact=False scalar prefetch: clo, chi (L, B, n_tiles) col-block
    bounds; tmask (B, n_tiles) tile visibility — grid (B, n_tiles), one
    program per tile, masked tiles write zeros.
    compact=True scalar prefetch: tids (B, cap) tile ids with the ACTIVE
    tiles first (then inactive fill); cnt (B,) active counts; clo, chi —
    grid (B, cap): program g serves tile tids[b, g], so the per-program
    dispatch floor (~13.5 ms of the 32 ms call at base-SCA scale, ~75%
    of programs inactive) shrinks with the cap. Programs g >= cnt[b]
    write zeros into (inactive) tiles; inactive tiles beyond the cap are
    never written — the caller masks them out in XLA.

    NEGATIVE RESULT (kept as a note so it isn't retried): row-chunking
    the contraction ([rlo, rhi) row-chunk bounds per (tile, level),
    pl.ds row slices, depth 64→24 at L0) measured 35→66 ms/frame — the
    MXU matmul here is N-streaming-bound (PQT=1024 columns; time ≈
    N + K pipeline cycles), so cutting contraction depth K saves almost
    nothing while the dynamic sublane slices and nested fori_loop add
    real overhead. Reducing matmul COUNT or N is what would pay."""
    if compact:
        tids_ref, cnt_ref, clo_ref, chi_ref = args[:4]
        refs = args[4:]
    else:
        clo_ref, chi_ref, tmask_ref = args[:3]
        refs = args[3:]
    L = len(spatial_shapes)
    value_refs = refs[:L]
    pxk_ref, pyk_ref, sk_ref = refs[L], refs[L + 1], refs[L + 2]
    out_ref = refs[L + 3]
    b = pl.program_id(0)
    g = pl.program_id(1)
    H = value_refs[0].shape[1]
    QT = q_tile
    D = head_dim
    P = num_points
    CB = col_block
    PQT = P * QT
    if compact:
        q = tids_ref[b, g]
        active = g < cnt_ref[b]
    else:
        q = g
        active = tmask_ref[b, g] > 0
    kdt = value_refs[0].dtype
    prec = precision or jax.lax.Precision.HIGHEST
    _dbg = os.environ.get("MSDA_PT2D_DEBUG", "full")

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[0, :, :, :] = jnp.zeros_like(out_ref[0, :, :, :])

    @pl.when(active)
    def _():
        accs = [jnp.zeros((D, QT), jnp.float32) for _ in range(H)]
        for lvl, (h, w) in enumerate(spatial_shapes):
            hp_pad = value_refs[lvl].shape[3]
            # per-head transposed row-hat matrices (hp, P·QT), hoisted out
            # of the column loop (column-invariant): rows-in-sublanes iota
            # against the lane-packed py/s rows — full-width 2D vector ops
            yc = jax.lax.broadcasted_iota(
                jnp.int32, (hp_pad, PQT), 0).astype(jnp.float32)
            w_alls, pxs = [], []
            for hh in range(H):
                r = lvl * H + hh
                py = pyk_ref[0, 0, 0, r:r + 1, :]   # (1, P·QT)
                s = sk_ref[0, 0, r:r + 1, :]
                # s-folded row hat: s·relu(1 - |yc - py|)
                w_alls.append(jnp.maximum(
                    s - jnp.abs(yc - py) * s, 0.0).astype(kdt))
                pxs.append(pxk_ref[0, 0, 0, r:r + 1, :])
            # sublane → within-block column offset map (k = sublane // D),
            # shared by all heads and column blocks
            kcol = (jax.lax.broadcasted_iota(
                jnp.int32, (CB * D, PQT), 0) // D).astype(jnp.float32)

            def cb_body(cb, accs, lvl=lvl, w_alls=w_alls, pxs=pxs,
                        kcol=kcol):
                new = list(accs)
                ccol = kcol + cb.astype(jnp.float32) * CB
                for hh in range(H):
                    vblk = value_refs[lvl][0, hh, cb, :, :]  # (hp, CB·D)
                    gT = jax.lax.dot_general(
                        vblk, w_alls[hh],
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    )  # (CB·D, P·QT)
                    if _dbg != "nopost":
                        # column hats for all (k, p, q) in one op chain;
                        # sublane k·D+d holds column cb·CB+k's hat
                        gT = gT * jnp.maximum(
                            1.0 - jnp.abs(ccol - pxs[hh]), 0.0)
                    # reduce p (lane blocks) then k (sublane blocks)
                    red = gT[:, :QT]
                    for p in range(1, P):
                        red = red + gT[:, p * QT:(p + 1) * QT]
                    a = new[hh]
                    for k in range(CB):
                        a = a + red[k * D:(k + 1) * D, :]
                    new[hh] = a
                return tuple(new)

            accs = jax.lax.fori_loop(
                clo_ref[lvl, b, q], chi_ref[lvl, b, q], cb_body, tuple(accs))
        for hh in range(H):
            out_ref[0, hh, :, :] = accs[hh].astype(out_ref.dtype)


def _msda_pallas_fwd_impl(
    value, spatial_shapes, sampling_locations, attention_weights, *,
    interpret=False, q_tile=128, tile_mask=None, fast=False, slab_rows=None,
    factored=None,
):
    """factored: optional (ref_flat (B, Q, P·2), off_flat (Bs, Q, H·L·P·2)
    raw-cell offsets, attn_flat (Bs, Q, H·L·P)) replacing sampling_locations
    / attention_weights (pass those as None). The pt2d path packs the
    factored forms directly (see _pack_tile_major_factored); other paths
    materialize the flat loc/attn first — identical math either way."""
    precision = jax.lax.Precision.DEFAULT if fast else None
    B, V, H, D = value.shape
    L = len(spatial_shapes)
    if factored is not None:
        ref_flat, off_flat, attn_flat_f = factored
        Q = ref_flat.shape[1]
        P = ref_flat.shape[-1] // 2
        assert off_flat.shape[-1] == H * L * P * 2, (off_flat.shape, H, L, P)
    else:
        _, Q, _, L, P, _ = sampling_locations.shape
    QT = q_tile
    Qp = ((Q + QT - 1) // QT) * QT
    # loc/attn keep their NATURAL (B, Q, H·L·P·…) flat layout: no host-side
    # transpose copy, and the lane dim is H·L·P(·2) — 64/128 at the flagship
    # — instead of the head-major layout's LP=8 lanes padded 16× to 128.
    # fast mode: attention weights ride in bf16 (softmax outputs in [0,1] —
    # 8 mantissa bits ≈ 0.4% rel err). Locations stay f32: bf16 would
    # quantize a 50-grid coordinate by ~0.4 cell.
    use_pt2d = (
        L > 1 and slab_rows is not None and not isinstance(slab_rows, int)
        and (QT % 128 == 0 or Qp == QT)  # out block: QT rides in lanes
        and os.environ.get("MSDA_ML_KERNEL", "pt2d") == "pt2d")
    packed = None
    if factored is not None:
        if fast:
            attn_flat_f = attn_flat_f.astype(jnp.bfloat16)
        if Qp != Q:
            # EDGE-pad (see the unfactored branch below for why)
            ref_flat = jnp.pad(ref_flat, [(0, 0), (0, Qp - Q), (0, 0)],
                               mode="edge")
            off_flat = jnp.pad(off_flat, [(0, 0), (0, Qp - Q), (0, 0)],
                               mode="edge")
            attn_flat_f = jnp.pad(attn_flat_f, [(0, 0), (0, Qp - Q), (0, 0)])
        if use_pt2d:
            packed = _pack_tile_major_factored(
                ref_flat, off_flat, attn_flat_f, spatial_shapes, H, P, QT)
            loc = attn = None
        else:
            loc, attn = _materialize_factored(
                ref_flat, off_flat, attn_flat_f, spatial_shapes, H, P)
    else:
        if fast:
            attention_weights = attention_weights.astype(jnp.bfloat16)
        loc = sampling_locations.reshape(B, Q, H * L * P * 2)
        attn = attention_weights.reshape(B, Q, H * L * P)
        if Qp != Q:
            # EDGE-pad the tail locations (attention pads zero, so padded
            # queries contribute nothing): zero-padding put px=py=0.5 on the
            # tail, dragging every extent/bounds computation toward the
            # origin — replicating the last real query keeps the tail tile's
            # bounds tight without q_valid masking
            loc = jnp.pad(loc, [(0, 0), (0, Qp - Q), (0, 0)], mode="edge")
            attn = jnp.pad(attn, [(0, 0), (0, Qp - Q), (0, 0)])
    kdtype = jnp.bfloat16 if fast else jnp.float32
    align = 16 if kdtype == jnp.bfloat16 else 8
    n_tiles_pre = Qp // QT
    if use_pt2d:
        # multi-level point-stacked transposed path (base-scale SCA):
        # MXU row-hat contraction + one-multiply column post-weights,
        # [lo, hi) col-block bounds per (tile, level) — always exact.
        # Column-block M (= CB·D sublanes per matmul): swept {128, 256,
        # 512} at base-SCA scale — 128 wins (32.1 / 33.6 / 36 ms): wider
        # blocks halve the matmul count but double the wasted edge
        # columns, so the loop is execution-bound, not dispatch-bound
        CB = max(1, int(os.environ.get("MSDA_PT2D_M", "128")) // D)
        n_cb = tuple(-(-(w + 2) // CB) for (h, w) in spatial_shapes)
        levels = [
            _build_level_value_2dT(value, spatial_shapes, lvl, kdtype, 8, CB)
            for lvl in range(L)
        ]
        _dbg = os.environ.get("MSDA_PT2D_DEBUG", "full")

        # NEGATIVE RESULT: gathering the served tiles and packing only
        # them (pack volume × cap_frac) measured 42 → 48 ms/call — the
        # gather breaks the pad/scale → pack-transpose fusion, adding a
        # full extra pass over the flat operands that outweighs the
        # halved pack. Pack stays full-size, fused.
        pxyk, sk = (packed if packed is not None
                    else _pack_tile_major(loc, attn, spatial_shapes, H, P,
                                          QT))
        clo, chi = _bounds_cols(
            pxyk[0], spatial_shapes, QT, CB, n_cb, B, H, P)
        if _dbg == "nocb":
            chi = clo
        tm = (tile_mask.astype(jnp.int32) if tile_mask is not None
              else jnp.ones((B, n_tiles_pre), jnp.int32))
        if _dbg == "alloff":
            tm = jnp.zeros_like(tm)
        assert tm.shape == (B, n_tiles_pre), (tm.shape, (B, n_tiles_pre))
        shapes_t0 = tuple(tuple(s) for s in spatial_shapes)
        cost_2d = pl.CostEstimate(
            flops=2 * B * Qp * H * P
            * sum(lv.shape[3] * CB * D for lv in levels),
            bytes_accessed=B * (sum(lv.size // B for lv in levels)
                                * (2 if fast else 4)
                                + Qp * H * L * P * 3 * 4),
            transcendentals=0,
        )
        cparams = pltpu.CompilerParams(
            vmem_limit_bytes=int(os.environ.get(
                "MSDA_VMEM_LIMIT_MB", "32")) * 1024 * 1024)
        out_sds = jax.ShapeDtypeStruct((B, H, D, Qp), value.dtype)

        def pt2d_call(compact, cap=None):
            kernel = functools.partial(
                _msda_kernel_pt2d,
                spatial_shapes=shapes_t0, num_points=P, head_dim=D,
                col_block=CB, q_tile=QT, compact=compact,
                precision=jax.lax.Precision.DEFAULT if fast else None,
            )
            if compact:
                tile_of = lambda b, g, tids, *_: tids[b, g]
                out_idx = lambda b, g, tids, *_: (b, 0, 0, tids[b, g])
            else:
                tile_of = lambda b, g, *_: g
                out_idx = lambda b, g, *_: (b, 0, 0, g)
            # px and py are dim-0 slots of the SAME pxyk buffer, addressed
            # through the index map (no XLA slice copies)
            px_spec = pl.BlockSpec(
                (1, 1, 1, L * H, P * QT),
                lambda b, g, *a: (0, b, tile_of(b, g, *a), 0, 0),
                memory_space=pltpu.VMEM)
            py_spec = pl.BlockSpec(
                (1, 1, 1, L * H, P * QT),
                lambda b, g, *a: (1, b, tile_of(b, g, *a), 0, 0),
                memory_space=pltpu.VMEM)
            sk_spec = pl.BlockSpec(
                (1, 1, L * H, P * QT),
                lambda b, g, *a: (b, tile_of(b, g, *a), 0, 0),
                memory_space=pltpu.VMEM)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4 if compact else 3,
                grid=(B, cap if compact else n_tiles_pre),
                in_specs=[
                    pl.BlockSpec(
                        (1, H, n_cb[lvl], levels[lvl].shape[3], CB * D),
                        (lambda b, g, *_: (b, 0, 0, 0, 0)),
                        memory_space=pltpu.VMEM)
                    for lvl in range(L)
                ] + [px_spec, py_spec, sk_spec],
                out_specs=pl.BlockSpec((1, H, D, QT), out_idx,
                                       memory_space=pltpu.VMEM),
            )
            return pl.pallas_call(
                kernel, grid_spec=grid_spec, out_shape=out_sds,
                interpret=interpret, cost_estimate=cost_2d,
                compiler_params=cparams,
            )

        # Active-tile compaction: only ~20-25% of (camera, tile) programs
        # are visible at base-SCA scale, and the per-program dispatch floor
        # is ~40% of the kernel's runtime. Shrink the grid to a static cap
        # of tiles served through a scalar-prefetch tile-id map (active
        # first); if the active count ever exceeds the cap, lax.cond falls
        # back to the exact full grid, so the cap is a perf knob, never a
        # correctness one. Inactive tiles beyond the cap are never written
        # — the jnp.where masks their (uninitialized) slots.
        cap_frac = float(os.environ.get("MSDA_PT2D_CAP", "0.5"))
        cmin = int(os.environ.get("MSDA_PT2D_COMPACT_MIN", "64"))
        if tile_mask is not None and n_tiles_pre >= cmin and cap_frac > 0:
            cap = min(n_tiles_pre,
                      max(1, int(np.ceil(n_tiles_pre * cap_frac))))
            cnt = tm.sum(axis=1).astype(jnp.int32)
            order = jnp.argsort((tm == 0).astype(jnp.int32), axis=1,
                                stable=True).astype(jnp.int32)
            tids = order[:, :cap]

            out = jax.lax.cond(
                jnp.max(cnt) <= cap,
                lambda: pt2d_call(True, cap)(
                    tids, cnt, clo, chi, *levels, pxyk, pxyk, sk),
                lambda: pt2d_call(False)(
                    clo, chi, tm, *levels, pxyk, pxyk, sk),
            )
            qmask = jnp.repeat(tm.astype(jnp.bool_), QT, axis=1)  # (B, Qp)
            out = jnp.where(qmask[:, None, None, :], out,
                            jnp.zeros((), out.dtype))
        else:
            out = pt2d_call(False)(clo, chi, tm, *levels, pxyk, pxyk, sk)
        return out.transpose(0, 3, 1, 2)[:, :Q].reshape(B, Q, H * D)
    if L > 1 and slab_rows is not None and not isinstance(slab_rows, int):
        # multi-level chunked path (base-scale SCA): per-level operand
        # buffers, fixed per-level chunk sizes, dynamic [lo, hi) chunk
        # bounds per (tile, level) — always exact
        assert len(slab_rows) == L, (slab_rows, L)
        chunk_elems = tuple(
            ((int(slab_rows[lvl]) * (spatial_shapes[lvl][1] + 2)
              + align - 1) // align) * align
            for lvl in range(L)
        )
        levels, n_chunks = [], []
        for lvl in range(L):
            lv = _build_level_value(value, spatial_shapes, lvl, kdtype,
                                    align)
            nc = -(-lv.shape[2] // chunk_elems[lvl])
            pad_to = nc * chunk_elems[lvl]
            if pad_to != lv.shape[2]:
                lv = jnp.pad(lv, [(0, 0), (0, 0),
                                  (0, pad_to - lv.shape[2]), (0, 0)])
            levels.append(lv)
            n_chunks.append(nc)
        vp_pads = tuple(lv.shape[2] for lv in levels)
        lo, hi = _ml_chunk_bounds(
            loc, spatial_shapes, QT, chunk_elems, tuple(n_chunks), B, H,
            q_valid=Q)
        tm = (tile_mask.astype(jnp.int32) if tile_mask is not None
              else jnp.ones((B, n_tiles_pre), jnp.int32))
        assert tm.shape == (B, n_tiles_pre), (tm.shape, (B, n_tiles_pre))
        shapes_t0 = tuple(tuple(s) for s in spatial_shapes)
        kernel = functools.partial(
            _msda_kernel_ml_chunk,
            spatial_shapes=shapes_t0, num_points=P, head_dim=D,
            chunk_elems=chunk_elems,
            precision=jax.lax.Precision.DEFAULT if fast else None,
        )
        nvals = len(levels)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, n_tiles_pre),
            in_specs=[
                pl.BlockSpec((1, H, vp_pads[lvl], D),
                             (lambda b, q, s, wf, m: (b, 0, 0, 0)),
                             memory_space=pltpu.VMEM)
                for lvl in range(nvals)
            ] + [
                pl.BlockSpec((1, QT, H * L * P * 2),
                             lambda b, q, s, wf, m: (b, q, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, QT, H * L * P),
                             lambda b, q, s, wf, m: (b, q, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, QT, D),
                                   lambda b, q, s, wf, m: (b, 0, q, 0),
                                   memory_space=pltpu.VMEM),
        )
        cost_ml = pl.CostEstimate(
            flops=2 * B * Qp * H * sum(chunk_elems) * D,
            bytes_accessed=B * (sum(vp_pads) * H * D * 4
                                + Qp * H * L * P * 6 * 4),
            transcendentals=0,
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, H, Qp, D), value.dtype),
            interpret=interpret, cost_estimate=cost_ml,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(os.environ.get(
                    "MSDA_VMEM_LIMIT_MB", "32")) * 1024 * 1024),
        )(lo, hi, tm, *levels, loc, attn)
        return out[:, :, :Q].transpose(0, 2, 1, 3).reshape(B, Q, H * D)
    if L > 1:
        slab_rows = None
    # exact mode pins the operand to f32 even when the caller's trunk runs
    # bf16 activations: Mosaic rejects HIGHEST (fp32-contract) matmuls on
    # bf16 inputs ("Bad lhs type"), and exact mode's contract is f32 math
    operand = _build_padded_value(
        value, spatial_shapes,
        dtype=jnp.bfloat16 if fast else jnp.float32)
    Vp = operand.shape[2]
    n_tiles = Qp // QT
    shapes_t = tuple(tuple(s) for s in spatial_shapes)
    cost = pl.CostEstimate(
        flops=2 * B * Qp * H * L * (Vp // max(L, 1)) * D,
        bytes_accessed=B * (Vp * H * D * 4 + Qp * H * L * P * 6 * 4),
        transcendentals=0,
    )
    out_shape = jax.ShapeDtypeStruct((B, H, Qp, D), value.dtype)
    # multi-level / large-grid configs need more than the default 16 MB
    # Mosaic scoped-vmem stack for the per-level mask temporaries; leave
    # the default for small single-level grids (the flagship) — a blanket
    # raise measurably hurt the slab kernel's pipelining.
    # The raise is bounded at 64 MB (was 100 MB): physical VMEM is shared
    # with XLA's own pipelined buffers for neighbouring ops, and in large
    # combined graphs (base-config full step) a 100 MB scoped claim
    # next to XLA prefetch crashed the TPU worker at runtime even though
    # every subgraph ran clean in isolation.
    # 32 MB: the largest claim that coexists with XLA's own VMEM use in
    # scan-wrapped full-model graphs (64 MB ran single steps but crashed
    # the worker under lax.scan at base scale; 100 MB crashed everywhere
    # outside isolated subgraphs)
    _raise_mb = int(os.environ.get("MSDA_VMEM_LIMIT_MB", "32"))
    compiler_params = (
        pltpu.CompilerParams(vmem_limit_bytes=_raise_mb * 1024 * 1024)
        if (L > 1 or Vp * H * D * operand.dtype.itemsize > 4 * 1024 * 1024)
        else None)
    if slab_rows is not None and L == 1:
        (h0, w0) = spatial_shapes[0]
        wp0 = w0 + 2
        align = 16 if operand.dtype == jnp.bfloat16 else 8
        slab_elems = min(((slab_rows * wp0 + align - 1) // align) * align, Vp)
        base, wide = _slab_bounds(loc, spatial_shapes, QT, slab_elems, B, H,
                                  align=align)
        tm = (tile_mask.astype(jnp.int32) if tile_mask is not None
              else jnp.ones((B, n_tiles), jnp.int32))
        assert tm.shape == (B, n_tiles), (tm.shape, (B, n_tiles))
        kernel = functools.partial(
            _msda_kernel_slab,
            spatial_shapes=shapes_t, num_points=P, head_dim=D,
            slab_elems=slab_elems, sublane_align=align,
            precision=precision,
        )
        cost_slab = pl.CostEstimate(
            flops=2 * B * Qp * H * slab_elems * D,
            bytes_accessed=cost.bytes_accessed,
            transcendentals=0,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec((1, H, Vp, D),
                             lambda b, q, s, wf, m: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, QT, H * L * P * 2),
                             lambda b, q, s, wf, m: (b, q, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, QT, H * L * P),
                             lambda b, q, s, wf, m: (b, q, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, QT, D),
                                   lambda b, q, s, wf, m: (b, 0, q, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=out_shape, interpret=interpret,
            cost_estimate=cost_slab,
            compiler_params=compiler_params,
        )(base, wide, tm, operand, loc, attn)
        return out[:, :, :Q].transpose(0, 2, 1, 3).reshape(B, Q, H * D)
    if tile_mask is not None:
        tm = tile_mask.astype(jnp.int32)
        assert tm.shape == (B, n_tiles), (tm.shape, (B, n_tiles))
        kernel = functools.partial(
            _msda_kernel_masked,
            spatial_shapes=shapes_t, num_points=P, head_dim=D,
            precision=precision,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec((1, H, Vp, D),
                             lambda b, q, m: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, QT, H * L * P * 2),
                             lambda b, q, m: (b, q, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, QT, H * L * P),
                             lambda b, q, m: (b, q, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, QT, D),
                                   lambda b, q, m: (b, 0, q, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret, cost_estimate=cost,
            compiler_params=compiler_params,
        )(tm, operand, loc, attn)
    else:
        kernel = functools.partial(
            _msda_kernel,
            spatial_shapes=shapes_t, num_points=P, head_dim=D,
            precision=precision,
        )
        out = pl.pallas_call(
            kernel,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec((1, H, Vp, D), lambda b, q: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, QT, H * L * P * 2),
                             lambda b, q: (b, q, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, QT, H * L * P), lambda b, q: (b, q, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, QT, D), lambda b, q: (b, 0, q, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=out_shape, interpret=interpret, cost_estimate=cost,
            compiler_params=compiler_params,
        )(operand, loc, attn)
    # (B, H, Qp, D) -> (B, Q, H*D)
    return out[:, :, :Q].transpose(0, 2, 1, 3).reshape(B, Q, H * D)



# ---------------------------------------------------------------------------
# Block-window variant for single-level grids too large for whole-value VMEM
# residency (200x200 BEV TSA): the padded grid is pre-tiled into 8x16-cell
# value blocks; each query tile contracts against a 3x2-block (24x32-cell)
# window chosen per (batch, tile) through scalar-prefetched BLOCK indices —
# the six window blocks arrive as six pipelined BlockSpec inputs, so there
# is no in-kernel DMA and no VMEM residency requirement on the full grid.
#
# SEMANTIC NOTE (documented in DEVIATIONS.md): sampling locations are
# clamped into the window interior. The window is centered on the tile's
# sampling extent, so any sample within ~11 rows / ~15 cols of the tile's
# sampling centroid — in practice all of them for temporal self-attention,
# whose learned offsets are initialized within 4 cells — is EXACT; rare
# far outliers saturate at the window edge instead of sampling outside it.
# The backward pass reuses the unclamped XLA VJP.

_WIN_BH, _WIN_BW = 8, 16      # value block = 8 rows x 16 cols = 128 cells
_WIN_NY, _WIN_NX = 3, 2       # window = 3x2 blocks = 24 x 32 cells


def _build_blocked_value(value, h, w, dtype):
    """(B, V=h*w, H, D) -> (B, H, n_yb, n_xb, 128, D): 1-ring padded grid
    cut into (8, 16)-cell blocks (cell s = r*16 + c)."""
    if dtype is not None and value.dtype != dtype:
        value = value.astype(dtype)
    B, V, H, D = value.shape
    hp, wp = h + 2, w + 2
    hq = (hp + _WIN_BH - 1) // _WIN_BH * _WIN_BH
    wq = (wp + _WIN_BW - 1) // _WIN_BW * _WIN_BW
    v = value.reshape(B, h, w, H, D).transpose(0, 3, 1, 2, 4)
    v = jnp.pad(v, [(0, 0), (0, 0), (1, hq - hp + 1), (1, wq - wp + 1),
                    (0, 0)])
    n_yb, n_xb = hq // _WIN_BH, wq // _WIN_BW
    v = v.reshape(B, H, n_yb, _WIN_BH, n_xb, _WIN_BW, D)
    v = v.transpose(0, 1, 2, 4, 3, 5, 6)
    return v.reshape(B, H, n_yb, n_xb, _WIN_BH * _WIN_BW, D)


def _window_origins(loc, h, w, q_tile, B, H, n_yb, n_xb, q_valid=None):
    """Per-(batch, tile) window origin BLOCK indices, centered on the
    tile's sampling extent (pooled over heads/points). loc: natural
    (B, Qp, H*L*P*2) with L == 1.

    The extent pools only over samples that can CONTRIBUTE: out-of-grid
    samples are zeroed by the in-kernel ``inside`` flag and zero-padded
    tail queries (q >= q_valid when Q % q_tile != 0, loc=0 -> px=0.5) are
    sliced off by the caller — either kind used to drag the window center
    away from the tile's real samples, pushing in-grid samples into the
    clamp (round-2 ADVICE medium finding)."""
    Qp = loc.shape[1]
    n_tiles = Qp // q_tile
    ll = loc.reshape(B, n_tiles, q_tile, H, -1, 2)
    px = ll[..., 0].astype(jnp.float32) * w + 0.5   # padded coords
    py = ll[..., 1].astype(jnp.float32) * h + 0.5
    valid = (px > 0.0) & (px < w + 1.0) & (py > 0.0) & (py < h + 1.0)
    if q_valid is not None and q_valid != Qp:
        qidx = jnp.arange(Qp).reshape(n_tiles, q_tile)
        valid &= (qidx < q_valid)[None, :, :, None, None]  # (1,T,QT,1,1)
    big = jnp.float32(1e9)
    px_min = jnp.where(valid, px, big).min(axis=(2, 3, 4))
    px_max = jnp.where(valid, px, -big).max(axis=(2, 3, 4))
    py_min = jnp.where(valid, py, big).min(axis=(2, 3, 4))
    py_max = jnp.where(valid, py, -big).max(axis=(2, 3, 4))
    # a tile with no contributing samples yields (big + -big)/2 = 0 ->
    # clipped origin 0; its output is all-zero regardless of the window
    cx = (px_min + px_max) * 0.5
    cy = (py_min + py_max) * 0.5
    win_h = _WIN_NY * _WIN_BH
    win_w = _WIN_NX * _WIN_BW
    # round (not truncate) to the nearest block so the window is actually
    # centered — truncation shifted it by up to one block and pushed edge
    # samples into the clamp
    yb = jnp.clip(jnp.round((cy - win_h * 0.5) / _WIN_BH).astype(jnp.int32),
                  0, n_yb - _WIN_NY)
    xb = jnp.clip(jnp.round((cx - win_w * 0.5) / _WIN_BW).astype(jnp.int32),
                  0, n_xb - _WIN_NX)
    return yb.astype(jnp.int32), xb.astype(jnp.int32)


def _msda_kernel_window(
    yb_ref, xb_ref, tmask_ref,          # scalar prefetch (B, n_tiles)
    v00, v01, v10, v11, v20, v21,       # (1,H,1,1,128,D) window blocks
    loc_ref, attn_ref, out_ref,
    *, h, w, num_points, head_dim, precision=None,
):
    b = pl.program_id(0)
    q = pl.program_id(1)
    H = v00.shape[1]
    QT = loc_ref.shape[1]
    P = num_points
    D = head_dim
    active = tmask_ref[b, q] > 0
    blocks = ((v00, v01), (v10, v11), (v20, v21))
    y_lo = (yb_ref[b, q] * _WIN_BH).astype(jnp.float32)
    x_lo = (xb_ref[b, q] * _WIN_BW).astype(jnp.float32)
    win_h = _WIN_NY * _WIN_BH
    win_w = _WIN_NX * _WIN_BW

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[0, :, :, :] = jnp.zeros_like(out_ref[0, :, :, :])

    @pl.when(active)
    def _():
        kdt = v00.dtype
        prec = precision or jax.lax.Precision.HIGHEST
        # per-cell coords within one block (shared by all sub-blocks)
        sidx = jax.lax.broadcasted_iota(jnp.int32, (QT, _WIN_BH * _WIN_BW), 1)
        rr = (sidx // _WIN_BW).astype(jnp.float32)
        cc = (sidx % _WIN_BW).astype(jnp.float32)

        for hh in range(H):
            acc = jnp.zeros((QT, D), jnp.float32)
            # precompute per-point clamped coords + weights once per head
            pxs, pys, ss = [], [], []
            for p in range(P):
                f = hh * P + p
                px = loc_ref[0, :, 2 * f:2 * f + 1].astype(
                    jnp.float32) * w + 0.5
                py = loc_ref[0, :, 2 * f + 1:2 * f + 2].astype(
                    jnp.float32) * h + 0.5
                aw = attn_ref[0, :, f:f + 1].astype(jnp.float32)
                inside = (
                    (px > 0.0) & (px < w + 1.0) & (py > 0.0) & (py < h + 1.0)
                ).astype(jnp.float32)
                # clamp onto the window's cell range: a sample AT cell
                # x_lo (or x_lo+win_w-1) puts its whole hat mass on that
                # cell (the neighbour's weight is exactly 0), so the full
                # [x_lo, x_lo+win_w-1] range keeps the bilinear support
                # in-window — including the zero-padding fade at grid
                # borders, which a 1-cell-tighter clamp used to cut off
                pxs.append(jnp.clip(px, x_lo, x_lo + win_w - 1.0))
                pys.append(jnp.clip(py, y_lo, y_lo + win_h - 1.0))
                ss.append(aw * inside)
            for dy in range(_WIN_NY):
                for dx in range(_WIN_NX):
                    yy = y_lo + dy * _WIN_BH + rr
                    xx = x_lo + dx * _WIN_BW + cc
                    Wm = jnp.zeros((QT, _WIN_BH * _WIN_BW), jnp.float32)
                    for p in range(P):
                        wx = jnp.maximum(1.0 - jnp.abs(xx - pxs[p]), 0.0)
                        wy = jnp.maximum(1.0 - jnp.abs(yy - pys[p]), 0.0)
                        Wm = Wm + ss[p] * wx * wy
                    acc = acc + jnp.dot(
                        Wm.astype(kdt), blocks[dy][dx][0, hh, 0, 0],
                        preferred_element_type=jnp.float32, precision=prec,
                    )
            out_ref[0, hh, :, :] = acc.astype(out_ref.dtype)


def _msda_pallas_window_impl(
    value, spatial_shapes, sampling_locations, attention_weights, *,
    interpret=False, q_tile=32, tile_mask=None, fast=False,
):
    assert len(spatial_shapes) == 1, spatial_shapes
    (h, w) = spatial_shapes[0]
    precision = jax.lax.Precision.DEFAULT if fast else None
    B, V, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    QT = q_tile
    Qp = ((Q + QT - 1) // QT) * QT
    if fast:
        attention_weights = attention_weights.astype(jnp.bfloat16)
    loc = sampling_locations.reshape(B, Q, H * L * P * 2)
    attn = attention_weights.reshape(B, Q, H * L * P)
    if Qp != Q:
        loc = jnp.pad(loc, [(0, 0), (0, Qp - Q), (0, 0)])
        attn = jnp.pad(attn, [(0, 0), (0, Qp - Q), (0, 0)])
    operand = _build_blocked_value(
        value, h, w, dtype=jnp.bfloat16 if fast else jnp.float32)
    n_yb, n_xb = operand.shape[2], operand.shape[3]
    n_tiles = Qp // QT
    yb, xb = _window_origins(loc, h, w, QT, B, H, n_yb, n_xb, q_valid=Q)
    tm = (tile_mask.astype(jnp.int32) if tile_mask is not None
          else jnp.ones((B, n_tiles), jnp.int32))
    assert tm.shape == (B, n_tiles), (tm.shape, (B, n_tiles))
    kernel = functools.partial(
        _msda_kernel_window, h=h, w=w, num_points=P, head_dim=D,
        precision=precision,
    )
    BC = _WIN_BH * _WIN_BW
    vspecs = [
        pl.BlockSpec(
            (1, H, 1, 1, BC, D),
            (lambda dy, dx: (lambda b, q, yb, xb, m:
                             (b, 0, yb[b, q] + dy, xb[b, q] + dx, 0, 0)))(
                dy, dx),
            memory_space=pltpu.VMEM)
        for dy in range(_WIN_NY) for dx in range(_WIN_NX)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, n_tiles),
        in_specs=vspecs + [
            pl.BlockSpec((1, QT, H * L * P * 2),
                         lambda b, q, yb, xb, m: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QT, H * L * P),
                         lambda b, q, yb, xb, m: (b, q, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, QT, D),
                               lambda b, q, yb, xb, m: (b, 0, q, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Qp, D), value.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Qp * H * _WIN_NY * _WIN_NX * BC * D,
            bytes_accessed=B * Qp * H * (6 * BC * D * 2 + L * P * 24),
            transcendentals=0,
        ),
        # no scoped-vmem raise: the six (128, D) window blocks, masks and
        # out tile fit comfortably in the default 16 MB budget — and an
        # oversized claim risks colliding with XLA's own VMEM prefetch in
        # large graphs (see the bounded raise in _msda_pallas_fwd_impl)
    )(yb, xb, tm, *( [operand] * 6 ), loc, attn)
    return out[:, :, :Q].transpose(0, 2, 1, 3).reshape(B, Q, H * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 6, 7))
def ms_deform_attn_pallas(
    value,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations,
    attention_weights,
    fast: bool = False,
    tile_mask=None,
    slab_rows=None,
    q_tile: int = 128,
):
    return _msda_pallas_fwd_impl(
        value, spatial_shapes, sampling_locations, attention_weights,
        tile_mask=tile_mask, fast=fast, slab_rows=slab_rows, q_tile=q_tile,
    )


def _fwd(value, spatial_shapes, sampling_locations, attention_weights,
         fast, tile_mask, slab_rows, q_tile):
    out = _msda_pallas_fwd_impl(
        value, spatial_shapes, sampling_locations, attention_weights,
        tile_mask=tile_mask, fast=fast, slab_rows=slab_rows, q_tile=q_tile,
    )
    # residuals cross the custom_vjp boundary MATERIALIZED: save the flat
    # (wide-minor) forms — a row-major (..., P, 2) buffer pads its minor
    # dim 2 to 128 lanes under TPU tiling (64x memory; 31 GB at base-SCA
    # scale), and (..., P) pads 16x
    B, Q = sampling_locations.shape[:2]
    return out, (value, sampling_locations.reshape(B, Q, -1),
                 attention_weights.reshape(B, Q, -1), tile_mask)


def _bwd(spatial_shapes, fast, slab_rows, q_tile, residuals, g):
    # Backward uses the unmasked XLA VJP: skipped tiles only exist where the
    # caller zeroes the output (and hence the cotangent) anyway.
    from apollo_vision_net_tpu.ops.msda import ms_deform_attn_xla

    value, loc_flat, attn_flat, tile_mask = residuals
    B, Q = loc_flat.shape[:2]
    H, L = value.shape[2], len(spatial_shapes)
    P = attn_flat.shape[-1] // (H * L)
    sampling_locations = loc_flat.reshape(B, Q, H, L, P, 2)
    attention_weights = attn_flat.reshape(B, Q, H, L, P)
    _, vjp = jax.vjp(
        lambda v, s, a: ms_deform_attn_xla(v, spatial_shapes, s, a),
        value, sampling_locations, attention_weights,
    )
    dv, ds, da = vjp(g)
    return dv, ds, da, None


ms_deform_attn_pallas.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 6))
def ms_deform_attn_pallas_window(
    value,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations,
    attention_weights,
    fast: bool = False,
    tile_mask=None,
    q_tile: int = 32,
):
    """Block-window kernel for single-level grids beyond VMEM residency
    (see _msda_pallas_window_impl for the clamping semantics)."""
    return _msda_pallas_window_impl(
        value, spatial_shapes, sampling_locations, attention_weights,
        tile_mask=tile_mask, fast=fast, q_tile=q_tile,
    )


def _window_fwd(value, spatial_shapes, sampling_locations,
                attention_weights, fast, tile_mask, q_tile):
    out = _msda_pallas_window_impl(
        value, spatial_shapes, sampling_locations, attention_weights,
        tile_mask=tile_mask, fast=fast, q_tile=q_tile,
    )
    # flat residuals: see _fwd (narrow-minor buffers pad 16-64x when
    # materialized across the vjp boundary)
    B, Q = sampling_locations.shape[:2]
    return out, (value, sampling_locations.reshape(B, Q, -1),
                 attention_weights.reshape(B, Q, -1))


def _window_bwd(spatial_shapes, fast, q_tile, residuals, g):
    # unclamped XLA VJP — exact for in-window samples (all, in practice);
    # far-outlier clamping is a forward-only saturation
    from apollo_vision_net_tpu.ops.msda import ms_deform_attn_xla

    value, loc_flat, attn_flat = residuals
    B, Q = loc_flat.shape[:2]
    H, L = value.shape[2], len(spatial_shapes)
    P = attn_flat.shape[-1] // (H * L)
    sampling_locations = loc_flat.reshape(B, Q, H, L, P, 2)
    attention_weights = attn_flat.reshape(B, Q, H, L, P)
    _, vjp = jax.vjp(
        lambda v, s, a: ms_deform_attn_xla(v, spatial_shapes, s, a),
        value, sampling_locations, attention_weights,
    )
    dv, ds, da = vjp(g)
    return dv, ds, da, None


ms_deform_attn_pallas_window.defvjp(_window_fwd, _window_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5, 7, 8))
def ms_deform_attn_pallas_factored(
    value,
    spatial_shapes: Sequence[Tuple[int, int]],
    ref_flat,
    off_flat,
    attn_flat,
    fast: bool = False,
    tile_mask=None,
    slab_rows=None,
    q_tile: int = 128,
):
    """Factored-operand entry: sampling locations are never materialized
    per value-batch element. ``loc = ref·wh + off`` happens inside the
    pt2d pack (``_pack_tile_major_factored``) on the Bs-sized offsets and
    the P·2-wide refs — at base-SCA scale this replaces ~0.5 GB of
    per-camera layout copies per encoder layer (~75 ms/frame traced).

    ref_flat (B, Q, P·2): per-value-batch [0,1] reference points, flat
    (p, c) minor with ref[p] = ref_z[p % D_z]. off_flat (Bs, Q, H·L·P·2):
    RAW-CELL offsets (no 1/wh normalization). attn_flat (Bs, Q, H·L·P):
    softmaxed. Bs | B, replication axis fast (SCA's (Bq, N_cam) fold).
    Non-pt2d paths materialize the flat loc/attn first — identical math.
    """
    return _msda_pallas_fwd_impl(
        value, spatial_shapes, None, None,
        tile_mask=tile_mask, fast=fast, slab_rows=slab_rows, q_tile=q_tile,
        factored=(ref_flat, off_flat, attn_flat),
    )


def _factored_fwd(value, spatial_shapes, ref_flat, off_flat, attn_flat,
                  fast, tile_mask, slab_rows, q_tile):
    out = _msda_pallas_fwd_impl(
        value, spatial_shapes, None, None,
        tile_mask=tile_mask, fast=fast, slab_rows=slab_rows, q_tile=q_tile,
        factored=(ref_flat, off_flat, attn_flat),
    )
    # residuals stay FACTORED: 1/6 (offsets/attn) and 1/32 (refs) of the
    # materialized forms — and all wide-minor, so no narrow-minor padding
    return out, (value, ref_flat, off_flat, attn_flat)


def _factored_bwd(spatial_shapes, fast, slab_rows, q_tile, residuals, g):
    # Differentiate the numerically-identical XLA composition
    # materialize → msda; jax.vjp contracts d_off/d_attn over the
    # replication (camera) axis and d_ref over (head, level) for free.
    from apollo_vision_net_tpu.ops.msda import ms_deform_attn_xla

    value, ref_flat, off_flat, attn_flat = residuals
    B, Q, P2 = ref_flat.shape
    H, L = value.shape[2], len(spatial_shapes)
    P = P2 // 2

    def f(v, r, o, a):
        loc, attn = _materialize_factored(r, o, a.astype(jnp.float32),
                                          spatial_shapes, H, P)
        return ms_deform_attn_xla(
            v, spatial_shapes, loc.reshape(B, Q, H, L, P, 2),
            attn.reshape(B, Q, H, L, P))

    _, vjp = jax.vjp(f, value, ref_flat, off_flat, attn_flat)
    dv, dr, do, da = vjp(g)
    return dv, dr, do, da.astype(attn_flat.dtype), None


ms_deform_attn_pallas_factored.defvjp(_factored_fwd, _factored_bwd)
