"""Fused Pallas TPU kernel for multi-scale deformable attention.

TPU-first design — NOT a translation of the CUDA kernel
(reference mmcv ``ms_deform_attn``): instead of per-thread scalar gathers
(which TPUs do poorly), each grid program materializes, on the VPU, a sparse
sampling matrix ``W ∈ R^{Q_tile × V_level}`` whose rows hold the 4 bilinear
corner weights (pre-multiplied by the attention weights and the zero-padding
validity mask), then contracts it against the level's value block with one
MXU matmul per (head, level). The whole value tensor for one batch element
lives in VMEM, so the kernel is profitable when ``V · H · D`` fits on-chip
(BEV grids ≤ ~100×100 and tiny/small image pyramids); larger operands fall
back to the pure-XLA gather path in ``msda.py``.

VMEM layout note: operands are flattened to 3D with wide trailing dims
before the pallas_call — VMEM tiles the last two dims to (8, 128)-multiples,
so a 6D (..., P, 2) block would pad each (P, 2) tail to (8, 128), a >100×
memory blowup that OOMs scoped VMEM even for tiny inputs.

Differentiation: forward runs the Pallas kernel; the backward pass reuses
the VJP of the XLA implementation (numerically identical semantics), which
keeps the kernel simple and is cheap relative to the rest of the step.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget heuristic: value block + W matrix + scratch must fit in ~16MB.
_VMEM_VALUE_LIMIT_BYTES = 4 * 1024 * 1024
_MAX_LEVEL_SIZE = 8192  # widest one-hot contraction we are willing to build


def is_profitable(value, spatial_shapes, sampling_locations) -> bool:
    B, V, H, D = value.shape
    value_bytes = V * max(H * D, 128) * 4
    if value_bytes > _VMEM_VALUE_LIMIT_BYTES:
        return False
    if max(h * w for h, w in spatial_shapes) > _MAX_LEVEL_SIZE:
        return False
    return True


def _msda_kernel(
    value_ref,  # (1, V, H*D)
    loc_ref,    # (1, QT, H*L*P*2)   layout (h, l, p, xy)
    attn_ref,   # (1, QT, H*L*P)     layout (h, l, p)
    out_ref,    # (1, QT, H*D)
    *,
    spatial_shapes: Tuple[Tuple[int, int], ...],
    num_heads: int,
    num_points: int,
    head_dim: int,
):
    QT = loc_ref.shape[1]
    L = len(spatial_shapes)
    P = num_points
    D = head_dim
    starts = np.concatenate(
        [[0], np.cumsum([h * w for h, w in spatial_shapes])]
    ).astype(int)
    for head in range(num_heads):
        acc = jnp.zeros((QT, D), dtype=jnp.float32)
        for lvl, (h, w) in enumerate(spatial_shapes):
            size = h * w
            col = jax.lax.broadcasted_iota(jnp.int32, (QT, size), 1)
            w_mat = jnp.zeros((QT, size), dtype=jnp.float32)
            for p in range(P):
                flat = (head * L + lvl) * P + p
                px = loc_ref[0, :, 2 * flat:2 * flat + 1].astype(jnp.float32) * w - 0.5
                py = loc_ref[0, :, 2 * flat + 1:2 * flat + 2].astype(jnp.float32) * h - 0.5
                aw = attn_ref[0, :, flat:flat + 1].astype(jnp.float32)
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
                    wgt = aw * cw * valid.astype(jnp.float32)  # (QT, 1)
                    w_mat = w_mat + jnp.where(col == idx, wgt, 0.0)
            v_l = value_ref[
                0, starts[lvl]:starts[lvl + 1], head * D:(head + 1) * D
            ].astype(jnp.float32)
            # HIGHEST = bf16x3 passes on the MXU: f32-accurate sampling.
            # The VPU one-hot build dominates this kernel, not the MXU.
            acc = acc + jnp.dot(
                w_mat, v_l,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        out_ref[0, :, head * D:(head + 1) * D] = acc.astype(out_ref.dtype)


def _msda_pallas_fwd_impl(
    value, spatial_shapes, sampling_locations, attention_weights, *,
    interpret=False, q_tile=128,
):
    B, V, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    QT = q_tile
    Qp = ((Q + QT - 1) // QT) * QT
    loc = sampling_locations.reshape(B, Q, H * L * P * 2)
    attn = attention_weights.reshape(B, Q, H * L * P)
    if Qp != Q:
        loc = jnp.pad(loc, [(0, 0), (0, Qp - Q), (0, 0)])
        attn = jnp.pad(attn, [(0, 0), (0, Qp - Q), (0, 0)])
    value3 = value.reshape(B, V, H * D)
    kernel = functools.partial(
        _msda_kernel,
        spatial_shapes=tuple(tuple(s) for s in spatial_shapes),
        num_heads=H,
        num_points=P,
        head_dim=D,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, Qp // QT),
        in_specs=[
            pl.BlockSpec((1, V, H * D), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QT, H * L * P * 2), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QT, H * L * P), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, QT, H * D), lambda b, q: (b, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Qp, H * D), value.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Qp * H * V * D + B * Qp * H * L * P * 8 * V,
            bytes_accessed=B * (V * H * D * 4 + Qp * H * L * P * 6 * 4),
            transcendentals=0,
        ),
    )(value3, loc, attn)
    return out[:, :Q]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas(
    value,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations,
    attention_weights,
):
    return _msda_pallas_fwd_impl(
        value, spatial_shapes, sampling_locations, attention_weights
    )


def _fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = _msda_pallas_fwd_impl(
        value, spatial_shapes, sampling_locations, attention_weights
    )
    return out, (value, sampling_locations, attention_weights)


def _bwd(spatial_shapes, residuals, g):
    from apollo_vision_net_tpu.ops.msda import ms_deform_attn_xla

    value, sampling_locations, attention_weights = residuals
    _, vjp = jax.vjp(
        lambda v, s, a: ms_deform_attn_xla(v, spatial_shapes, s, a),
        value, sampling_locations, attention_weights,
    )
    return vjp(g)


ms_deform_attn_pallas.defvjp(_fwd, _bwd)
