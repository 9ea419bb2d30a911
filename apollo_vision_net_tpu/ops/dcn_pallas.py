"""Dedicated dense-window Pallas kernel for modulated deformable conv.

Parity target: the reference's only in-repo native op — DCNv3 CUDA im2col
(bevformer/backbones/ops_dcnv3/src/cuda/dcnv3_im2col_cuda.cuh) and mmdet's
DCNv2 ``modulated_deform_conv`` used by the R101-DCN base configs.

Why a dedicated kernel (vs routing through the MSDA primitive,
``ops/dcnv3.py``): the MSDA route must project the input by the K tap
weights FIRST (taps = heads), materializing a K·O-wide value in HBM —
83 MB round-trip per call at R101-stage-3 base scale — and the projected
operand overflows the MSDA kernel's VMEM gate on the stride-2 and
512-channel blocks, dropping them to the ~25x XLA patch-gather path.
Sampling the RAW C-channel input instead keeps the whole padded feature
map VMEM-resident (<=3.2 MB bf16 for every R101-DCN shape at 480x800) and
the tap projection fuses into the kernel's epilogue matmul.

Kernel shape (grid = (B, n_output_tiles), one program per QT=128 output
pixels):
  1. per tap k: scatter mask W_k (QT, S) over a dynamically-positioned
     row slab of the padded input (the separable-bilinear-hat trick of
     ``msda_pallas._weighted_mask``, with the sigmoid modulation folded
     in) and ONE MXU contraction W_k @ x_slab -> the modulated bilinear
     patch (QT, C): im2col without gathers;
  2. patches land in a (QT, K·C) VMEM scratch; the conv itself is then a
     single (QT, K·C) @ (K·C, O) MXU matmul against the full weight block
     (resident, constant index map).
HBM traffic = x + offsets/masks + output + weights — the op's
speed-of-light — vs the MSDA route's extra K·O-wide projected value.

Row-slab windowing reuses ``msda_pallas._slab_bounds``: a q_tile of
row-major output pixels spans ~stride·ceil(QT/Wo)+2 input rows plus the
learned-offset reach, computed EXACTLY per tile from the actual offsets;
tiles whose reach overflows the slab take an exact full-height fallback
(offsets are zero-init + L2-regularized, so outliers are rare).

Differentiation follows the module convention: forward runs the Pallas
kernel, backward differentiates a numerically-identical XLA composition
(per-tap MSDA sampling of a K-replicated value + the tap-weight einsum).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from apollo_vision_net_tpu.ops.msda_pallas import (
    _slab_bounds,
    _weighted_mask,
)

# whole padded input must stay VMEM-resident per batch element (largest
# R101-DCN shape at 480x800: 62x102x512 bf16 = 6.5 MB)
_VMEM_X_LIMIT_BYTES = 8 * 1024 * 1024


def is_dense_profitable(x, weight, fast: bool) -> bool:
    B, H, W, C = x.shape
    itemsize = 2 if fast else 4
    if (H + 2) * (W + 2) * C * itemsize > _VMEM_X_LIMIT_BYTES:
        return False
    K, _, O = weight.shape
    # weight block must also be resident
    if K * C * O * itemsize > _VMEM_X_LIMIT_BYTES:
        return False
    return True


def _dcn_kernel(
    slab_ref,   # scalar prefetch: (B, n_tiles) int32 slab starts / align
    wide_ref,   # (B, n_tiles) int32: 1 -> slab overflow, full-height path
    x_ref,      # (1, Vp_pad, C) one batch element's padded input, flat
    loc_ref,    # (1, QT, K*2) normalized [0,1] sampling locations
    attn_ref,   # (1, QT, K) modulation (sigmoid mask)
    w_ref,      # (K*C, O) conv weights, tap-major
    out_ref,    # (1, QT, O)
    patch_ref,  # VMEM scratch (QT, K*C) f32 — the im2col tile
    *,
    hw: Tuple[int, int], num_taps: int, slab_elems: int, vp_pad: int,
    sublane_align: int, precision=None,
):
    b = pl.program_id(0)
    q = pl.program_id(1)
    (h, w) = hw
    wp = w + 2
    K = num_taps
    QT = loc_ref.shape[1]
    C = x_ref.shape[2]
    kdt = x_ref.dtype
    prec = precision or jax.lax.Precision.HIGHEST
    wide = wide_ref[b, q] > 0

    def sample_taps(base, S, xblk):
        col = jax.lax.broadcasted_iota(jnp.int32, (QT, S), 1) + base
        yx = ((col // wp).astype(jnp.float32),
              (col % wp).astype(jnp.float32))
        for k in range(K):
            Wk = _weighted_mask(
                loc_ref[0, :, 2 * k:2 * k + 2],
                attn_ref[0, :, k:k + 1],
                lvl=0, num_points=1, h=h, w=w, QT=QT, S=S, base=base,
                yx=yx,
            )
            patch_ref[:, k * C:(k + 1) * C] = jnp.dot(
                Wk.astype(kdt), xblk,
                preferred_element_type=jnp.float32, precision=prec,
            )

    if slab_elems < vp_pad:
        @pl.when(jnp.logical_not(wide))
        def _():
            # slab_ref carries start // align (see _msda_kernel_slab:
            # Mosaic needs the static multiply to prove the dynamic-slice
            # alignment)
            base = slab_ref[b, q] * sublane_align
            sample_taps(base, slab_elems,
                        x_ref[0, pl.ds(base, slab_elems), :])

        @pl.when(wide)
        def _():
            sample_taps(0, vp_pad, x_ref[0, :, :])
    else:
        sample_taps(0, vp_pad, x_ref[0, :, :])

    out_ref[0, :, :] = jnp.dot(
        patch_ref[:, :].astype(kdt), w_ref[:, :],
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(out_ref.dtype)


def _dcn_dense_fwd_impl(
    x, loc_flat, attn_flat, weight, *, fast: bool, slab_rows: int,
    q_tile: int = 128, interpret: bool = False,
):
    """x (B, H, W, C); loc_flat (B, Q, K·2) normalized (x, y) in [0, 1];
    attn_flat (B, Q, K); weight (K, C, O). Returns (B, Q, O).
    ``slab_rows``: nominal input-row reach of one q_tile (caller knows the
    stride / output width); per-tile EXACT bounds route overflowing tiles
    to the full-height fallback."""
    B, H, W, C = x.shape
    _, Q, K2 = loc_flat.shape
    K = K2 // 2
    O = weight.shape[-1]
    QT = q_tile
    Qp = (Q + QT - 1) // QT * QT
    n_tiles = Qp // QT
    if Qp != Q:
        # EDGE-pad locations (msda_pallas convention: zero-pad would drag
        # the slab bounds to the origin); zero-pad modulation
        loc_flat = jnp.pad(loc_flat, [(0, 0), (0, Qp - Q), (0, 0)],
                           mode="edge")
        attn_flat = jnp.pad(attn_flat, [(0, 0), (0, Qp - Q), (0, 0)])

    kdt = jnp.bfloat16 if fast else jnp.float32
    align = 16 if kdt == jnp.bfloat16 else 8
    xp = jnp.pad(x.astype(kdt), [(0, 0), (1, 1), (1, 1), (0, 0)])
    Vp = (H + 2) * (W + 2)
    Vp_pad = (Vp + align - 1) // align * align
    xp = xp.reshape(B, Vp, C)
    if Vp_pad != Vp:
        # zero pad rows are harmless: their grid coords sit beyond h+1, so
        # every bilinear hat is zero there (and the values are zero anyway)
        xp = jnp.pad(xp, [(0, 0), (0, Vp_pad - Vp), (0, 0)])

    wp = W + 2
    slab_elems = min(((slab_rows * wp + align - 1) // align) * align, Vp_pad)
    base, wide = _slab_bounds(
        loc_flat, ((H, W),), QT, slab_elems, B, K, align=align)

    wflat = weight.astype(kdt).reshape(K * C, O)
    kernel = functools.partial(
        _dcn_kernel, hw=(H, W), num_taps=K, slab_elems=slab_elems,
        vp_pad=Vp_pad, sublane_align=align,
        precision=jax.lax.Precision.DEFAULT if fast else None,
    )
    itemsize = 2 if fast else 4
    cost = pl.CostEstimate(
        flops=2 * B * Qp * K * (slab_elems * C + C * O),
        bytes_accessed=B * (Vp_pad * C + Qp * (K * 3 + O)) * itemsize,
        transcendentals=0,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, Vp_pad, C), lambda b, q, s, wf: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QT, K * 2), lambda b, q, s, wf: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QT, K), lambda b, q, s, wf: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K * C, O), lambda b, q, s, wf: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, QT, O), lambda b, q, s, wf: (b, q, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((QT, K * C), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Qp, O), x.dtype),
        interpret=interpret, cost_estimate=cost,
    )(base, wide, xp, loc_flat.astype(jnp.float32),
      attn_flat.astype(jnp.float32), wflat)
    return out[:, :Q]


def _dcn_xla_ref(x, loc_flat, attn_flat, weight):
    """Numerically-identical XLA composition (CPU fallback + VJP source):
    per-tap modulated bilinear samples via the MSDA XLA path on a
    K-replicated value, then the tap-weight contraction."""
    from apollo_vision_net_tpu.ops.msda import ms_deform_attn_xla

    B, H, W, C = x.shape
    _, Q, K2 = loc_flat.shape
    K = K2 // 2
    v = jnp.broadcast_to(
        x.reshape(B, H * W, 1, C), (B, H * W, K, C))
    locs = loc_flat.reshape(B, Q, K, 1, 1, 2)
    attn = attn_flat.reshape(B, Q, K, 1, 1)
    sampled = ms_deform_attn_xla(v, ((H, W),), locs, attn)  # (B, Q, K*C)
    return jnp.einsum(
        "bqkc,kco->bqo",
        sampled.reshape(B, Q, K, C).astype(jnp.float32),
        weight.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def dcn_dense(x, loc_flat, attn_flat, weight, fast: bool = False,
              slab_rows: int = 10):
    """Fused dense-window deformable conv: (B, H, W, C) x (B, Q, K·2) x
    (B, Q, K) x (K, C, O) -> (B, Q, O). Q = output pixels (row-major);
    locations normalized to the INPUT grid ([0,1], (x, y) minor)."""
    return _dcn_dense_fwd_impl(
        x, loc_flat, attn_flat, weight, fast=fast, slab_rows=slab_rows)


def _dense_fwd(x, loc_flat, attn_flat, weight, fast, slab_rows):
    out = _dcn_dense_fwd_impl(
        x, loc_flat, attn_flat, weight, fast=fast, slab_rows=slab_rows)
    return out, (x, loc_flat, attn_flat, weight)


def _dense_bwd(fast, slab_rows, residuals, g):
    x, loc_flat, attn_flat, weight = residuals
    _, vjp = jax.vjp(_dcn_xla_ref, x, loc_flat, attn_flat, weight)
    return vjp(g)


dcn_dense.defvjp(_dense_fwd, _dense_bwd)
