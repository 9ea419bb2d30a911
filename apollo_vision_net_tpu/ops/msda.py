"""Multi-scale deformable attention — the hottest op in the framework.

Reference: mmcv CUDA ``ms_deform_attn_forward/backward`` used by spatial
cross-attention, temporal self-attention, the det decoder and the map decoder
(SURVEY.md §2.2/§2.4); the semantic ground truth is the pure-PyTorch fallback
``multi_scale_deformable_attn_pytorch_2d``
(reference temporal_self_attention.py:293-348): per level, ``F.grid_sample``
with ``mode='bilinear', padding_mode='zeros', align_corners=False`` on grids
``2 * sampling_locations - 1``, then an attention-weighted sum over
(levels × points).

This module provides the pure-XLA implementation (vectorized gather +
bilinear weights — static shapes, differentiable through the native
gather/scatter transpose). A fused Pallas kernel lives in
``msda_pallas.py``; ``ms_deform_attn`` dispatches between them.

Shapes (functional API, batch-first):
  value:               (B, V, H, D)   flattened multi-level features
  spatial_shapes:      static tuple ((h0, w0), (h1, w1), ...) with sum(h*w)=V
  sampling_locations:  (B, Q, H, L, P, 2) in [0, 1], last dim (x, y)
  attention_weights:   (B, Q, H, L, P) — softmaxed over L*P by the caller
  returns:             (B, Q, H * D)
"""
from __future__ import annotations

from typing import Sequence, Tuple

import os

import jax
import jax.numpy as jnp
import numpy as np


def ms_deform_attn_xla_patch(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    q_chunk: int | None = None,
) -> jnp.ndarray:
    """Corner-folded gather variant — the fast XLA path on TPU.

    XLA's TPU gather costs ~constant time per gathered row regardless of
    row width (measured ~17 ns/row on v5e), so the naive formulation's
    4 corner gathers dominate. Here each level is zero-padded by one cell
    and expanded into a (V_pad, 4·D) tensor holding the 2×2 neighbourhood
    of every cell (built with two rolls — dense, bandwidth-cheap); bilinear
    sampling then needs ONE gathered row per (query, head, point), with the
    4 corner weights applied to the row's 4 D-blocks. Zero padding makes
    the out-of-image semantics exact; samples entirely outside are masked.
    """
    B, V, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    sizes = [h * w for h, w in spatial_shapes]
    starts = np.concatenate([[0], np.cumsum(sizes)])
    out = jnp.zeros((B, H, Q, D), dtype=jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        v_l = jax.lax.slice_in_dim(
            value, int(starts[lvl]), int(starts[lvl + 1]), axis=1
        ).reshape(B, h, w, H, D)
        vp = jnp.pad(v_l, [(0, 0), (1, 1), (1, 1), (0, 0), (0, 0)])
        # 2x2 patch per padded cell: [(0,0), (0,1), (1,0), (1,1)]
        p00 = vp
        p01 = jnp.roll(vp, -1, axis=2)
        p10 = jnp.roll(vp, -1, axis=1)
        p11 = jnp.roll(p10, -1, axis=2)
        patch = jnp.stack([p00, p01, p10, p11], axis=4)  # (B,h+2,w+2,H,4,D)
        patch = patch.transpose(0, 3, 1, 2, 4, 5).reshape(
            B, H, (h + 2) * (w + 2), 4 * D
        )

        loc = sampling_locations[:, :, :, lvl]  # (B, Q, H, P, 2)
        attn = attention_weights[:, :, :, lvl].astype(jnp.float32)
        px = loc[..., 0].astype(jnp.float32) * w - 0.5
        py = loc[..., 1].astype(jnp.float32) * h - 0.5
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        fx = px - x0
        fy = py - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        inside = (x0i >= -1) & (x0i <= w - 1) & (y0i >= -1) & (y0i <= h - 1)
        idx = (jnp.clip(y0i, -1, h - 1) + 1) * (w + 2) + (
            jnp.clip(x0i, -1, w - 1) + 1
        )
        idx_t = idx.transpose(0, 2, 1, 3)  # (B, H, Q, P)
        cw = jnp.stack(
            [(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy],
            axis=-1,
        )  # (B, Q, H, P, 4)
        wgt = (cw * (attn * inside.astype(jnp.float32))[..., None])
        wgt = wgt.transpose(0, 2, 1, 3, 4)  # (B, H, Q, P, 4)

        # chunk the query axis so the gathered (B,H,qc,P,4,D) intermediate
        # stays bounded (~128MB) — XLA would otherwise materialize the full
        # (B,H,Q,P,4,D) tensor before the reduction
        target_elems = 32 * 1024 * 1024
        qc = q_chunk or max(
            min(Q, target_elems // max(B * H * P * 4 * D, 1)), 1
        )
        qc = min(qc, Q)
        n_chunks = (Q + qc - 1) // qc
        if n_chunks > 1:
            pad_q = n_chunks * qc - Q
            idx_c = jnp.pad(idx_t, [(0, 0), (0, 0), (0, pad_q), (0, 0)])
            wgt_c = jnp.pad(wgt, [(0, 0), (0, 0), (0, pad_q), (0, 0), (0, 0)])
            idx_c = idx_c.reshape(B, H, n_chunks, qc, P).transpose(2, 0, 1, 3, 4)
            wgt_c = wgt_c.reshape(B, H, n_chunks, qc, P, 4).transpose(
                2, 0, 1, 3, 4, 5)

            def chunk_fn(args):
                ic, wc = args  # (B,H,qc,P), (B,H,qc,P,4)
                rows = jnp.take_along_axis(
                    patch, ic.reshape(B, H, qc * P)[..., None], axis=2
                ).reshape(B, H, qc, P, 4, D).astype(jnp.float32)
                return jnp.einsum("bhqpcd,bhqpc->bhqd", rows, wc)

            chunks = jax.lax.map(chunk_fn, (idx_c, wgt_c))  # (n,B,H,qc,D)
            contrib = chunks.transpose(1, 2, 0, 3, 4).reshape(
                B, H, n_chunks * qc, D)[:, :, :Q]
        else:
            rows = jnp.take_along_axis(
                patch, idx_t.reshape(B, H, Q * P)[..., None], axis=2
            ).reshape(B, H, Q, P, 4, D).astype(jnp.float32)
            contrib = jnp.einsum("bhqpcd,bhqpc->bhqd", rows, wgt)
        out = out + contrib
    return out.transpose(0, 2, 1, 3).reshape(B, Q, H * D).astype(value.dtype)


def ms_deform_attn_xla(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Pure-XLA multi-scale deformable attention (see module docstring)."""
    B, V, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    assert len(spatial_shapes) == L, (spatial_shapes, L)
    sizes = [h * w for h, w in spatial_shapes]
    assert sum(sizes) == V, (spatial_shapes, V)
    starts = np.concatenate([[0], np.cumsum(sizes)])

    compute_dtype = value.dtype
    out = jnp.zeros((B, H, Q, D), dtype=jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        # (B, hw, H, D) -> (B, H, hw, D): gather axis contiguous per head
        v_l = jax.lax.slice_in_dim(value, int(starts[lvl]), int(starts[lvl + 1]), axis=1)
        v_l = v_l.transpose(0, 2, 1, 3)
        loc = sampling_locations[:, :, :, lvl]  # (B, Q, H, P, 2)
        attn = attention_weights[:, :, :, lvl]  # (B, Q, H, P)
        # grid_sample(align_corners=False) pixel coords
        px = loc[..., 0].astype(jnp.float32) * w - 0.5
        py = loc[..., 1].astype(jnp.float32) * h - 0.5
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        fx = px - x0
        fy = py - y0
        x0 = x0.astype(jnp.int32)
        y0 = y0.astype(jnp.int32)
        for cx, cy, cw in (
            (0, 0, (1 - fx) * (1 - fy)),
            (1, 0, fx * (1 - fy)),
            (0, 1, (1 - fx) * fy),
            (1, 1, fx * fy),
        ):
            ix = x0 + cx
            iy = y0 + cy
            valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
            idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
            # fold bilinear corner weight with attention weight before the
            # contraction so the (B,H,Q,P,D) intermediate is consumed at once
            wgt = (cw * valid * attn.astype(jnp.float32)).transpose(0, 2, 1, 3)
            idx_t = idx.transpose(0, 2, 1, 3).reshape(B, H, Q * P)
            g = jnp.take_along_axis(
                v_l, idx_t[..., None], axis=2
            ).reshape(B, H, Q, P, D)
            out = out + jnp.einsum(
                "bhqpd,bhqp->bhqd", g.astype(jnp.float32), wgt
            )
    # (B, H, Q, D) -> (B, Q, H*D)
    return out.transpose(0, 2, 1, 3).reshape(B, Q, H * D).astype(compute_dtype)


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    *,
    impl: str = "auto",
    tile_mask: jnp.ndarray | None = None,
    slab_rows: int | None = None,
    q_tile: int = 128,
    window: bool = False,
    factored: tuple | None = None,
) -> jnp.ndarray:
    """Dispatching front-end. impl in {'auto', 'xla', 'pallas'}, each with
    an optional '_fast' suffix (single-bf16-pass MXU sampling; pairs with
    bf16 trunks).

    tile_mask (B, ceil(Q/128)) lets the Pallas kernel skip (batch,
    query-tile) programs entirely — callers must mask skipped outputs. The
    XLA paths ignore it (they compute everything; downstream masking makes
    the results identical).

    slab_rows (single-level only): when query tiles sample spatially
    compact row bands of the value grid (BEV self-attention; projected
    camera bands), the Pallas kernel contracts each tile against only a
    slab_rows-tall window with an exact full-width fallback for outliers.

    window: EXPLICIT opt-in to the clamped block-window kernel for
    single-level grids beyond VMEM residency (200x200 BEV TSA). The window
    kernel caps each tile's sampling extent at a 24x32-cell window with no
    exact fallback, so only callers whose sampling offsets are known to be
    spatially compact (temporal self-attention) should set it; without it,
    oversize grids take the exact XLA patch-gather path.

    factored: optional (ref_flat (B, Q, P·2), off_flat (Bs, Q, H·L·P·2)
    raw-cell offsets, attn_flat (Bs, Q, H·L·P) softmaxed) replacing
    sampling_locations/attention_weights (pass those as None) — the
    Pallas pt2d path packs the factored forms directly without ever
    materializing per-value-batch locations (SCA: offsets/attention are
    camera-invariant); other paths materialize first, identical math.
    """
    fast = impl.endswith("_fast")
    impl = impl[:-5] if fast else impl
    if factored is not None:
        assert sampling_locations is None and attention_weights is None
        ref_flat, off_flat, attn_flat = factored
        if os.environ.get("MSDA_FACTORED", "1") == "0":
            # debug/bisect switch: materialize up front and take the
            # unfactored paths everywhere (the pre-factored graph shape)
            from apollo_vision_net_tpu.ops.msda_pallas import (
                _materialize_factored,
            )

            B_, Q_, P2_ = ref_flat.shape
            H_ = value.shape[2]
            L_ = len(spatial_shapes)
            P_ = P2_ // 2
            loc_, attn_ = _materialize_factored(
                ref_flat, off_flat, attn_flat, spatial_shapes, H_, P_)
            sampling_locations = loc_.reshape(B_, Q_, H_, L_, P_, 2)
            attention_weights = attn_.reshape(B_, Q_, H_, L_, P_)
            factored = None
        B, Q, P2 = ref_flat.shape
        H = value.shape[2]
        L = len(spatial_shapes)
        P = P2 // 2

        def _materialized():
            from apollo_vision_net_tpu.ops.msda_pallas import (
                _materialize_factored,
            )

            loc, attn = _materialize_factored(
                ref_flat, off_flat, attn_flat, spatial_shapes, H, P)
            return (loc.reshape(B, Q, H, L, P, 2),
                    attn.reshape(B, Q, H, L, P))
    if impl == "xla":
        if factored is not None:
            sampling_locations, attention_weights = _materialized()
        return ms_deform_attn_xla_patch(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    if impl in ("auto", "pallas"):
        from apollo_vision_net_tpu.ops import msda_pallas

        on_tpu = jax.default_backend() in ("tpu", "axon")
        if impl == "pallas" or (
            on_tpu
            and msda_pallas.is_profitable(
                value, spatial_shapes, sampling_locations,
                itemsize=2 if fast else 4,
            )
        ):
            if len(spatial_shapes) != 1 and isinstance(slab_rows, int):
                # int slab_rows is single-level-only; multi-level slabs
                # take a per-level tuple (base-scale SCA)
                slab_rows = None
            if factored is not None:
                return msda_pallas.ms_deform_attn_pallas_factored(
                    value, spatial_shapes, ref_flat, off_flat, attn_flat,
                    fast, tile_mask, slab_rows, q_tile,
                )
            return msda_pallas.ms_deform_attn_pallas(
                value, spatial_shapes, sampling_locations, attention_weights,
                fast, tile_mask, slab_rows, q_tile,
            )
        if factored is not None:
            sampling_locations, attention_weights = _materialized()
        if on_tpu and len(spatial_shapes) == 1 and window:
            # single-level grid too large for whole-value VMEM residency
            # (200x200 BEV TSA): block-window kernel — sampling locations
            # clamp into a per-tile 24x32-cell window (DEVIATIONS.md); the
            # XLA gather fallback below costs ~25x more at this size
            return msda_pallas.ms_deform_attn_pallas_window(
                value, spatial_shapes, sampling_locations, attention_weights,
                fast, tile_mask, q_tile,
            )
        return (
            ms_deform_attn_xla_patch(
                value, spatial_shapes, sampling_locations, attention_weights
            )
            if on_tpu
            else ms_deform_attn_xla(
                value, spatial_shapes, sampling_locations, attention_weights
            )
        )
    raise ValueError(f"unknown impl {impl!r}")
