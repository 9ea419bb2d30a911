"""3D (trilinear) multi-scale deformable attention for voxel queries.

Parity: voxel_multi_scale_deformable_attn_pytorch
(bevformer/modules/voxel_temporal_self_attention.py:270-330): per level a
(d, h, w) value grid, sampling locations (x, y, z) in [0,1], 3D
``F.grid_sample(bilinear, zeros, align_corners=False)``, attention-weighted
sum over levels × points.

Same TPU strategy as the 2D op: the value grid is zero-padded by one cell
and expanded into 2×2×2 corner stacks (8·D channels) so each sample is ONE
gathered row; corner weights apply to the row's 8 D-blocks.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def ms_deform_attn_3d(
    value: jnp.ndarray,              # (B, V, H, Dh) with V = Σ d·h·w
    spatial_shapes: Sequence[Tuple[int, int, int]],  # ((d, h, w), ...)
    sampling_locations: jnp.ndarray,  # (B, Q, H, L, P, 3) in [0,1], (x,y,z)
    attention_weights: jnp.ndarray,   # (B, Q, H, L, P)
) -> jnp.ndarray:
    B, V, H, Dh = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    sizes = [d * h * w for d, h, w in spatial_shapes]
    assert sum(sizes) == V
    starts = np.concatenate([[0], np.cumsum(sizes)])
    out = jnp.zeros((B, H, Q, Dh), jnp.float32)
    for lvl, (d, h, w) in enumerate(spatial_shapes):
        v = jax.lax.slice_in_dim(
            value, int(starts[lvl]), int(starts[lvl + 1]), axis=1
        ).reshape(B, d, h, w, H, Dh)
        vp = jnp.pad(v, [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0), (0, 0)])
        corners = []
        for cz in (0, 1):
            for cy in (0, 1):
                for cx in (0, 1):
                    c = vp
                    if cz:
                        c = jnp.roll(c, -1, axis=1)
                    if cy:
                        c = jnp.roll(c, -1, axis=2)
                    if cx:
                        c = jnp.roll(c, -1, axis=3)
                    corners.append(c)
        patch = jnp.stack(corners, axis=-2)  # (B,d+2,h+2,w+2,H,8,Dh)
        Vp = (d + 2) * (h + 2) * (w + 2)
        patch = patch.transpose(0, 4, 1, 2, 3, 5, 6).reshape(B, H, Vp, 8 * Dh)

        loc = sampling_locations[:, :, :, lvl]  # (B, Q, H, P, 3)
        attn = attention_weights[:, :, :, lvl].astype(jnp.float32)
        px = loc[..., 0].astype(jnp.float32) * w - 0.5
        py = loc[..., 1].astype(jnp.float32) * h - 0.5
        pz = loc[..., 2].astype(jnp.float32) * d - 0.5
        x0 = jnp.floor(px); y0 = jnp.floor(py); z0 = jnp.floor(pz)
        fx = px - x0; fy = py - y0; fz = pz - z0
        x0 = x0.astype(jnp.int32)
        y0 = y0.astype(jnp.int32)
        z0 = z0.astype(jnp.int32)
        inside = (
            (x0 >= -1) & (x0 <= w - 1) & (y0 >= -1) & (y0 <= h - 1)
            & (z0 >= -1) & (z0 <= d - 1)
        )
        idx = (
            (jnp.clip(z0, -1, d - 1) + 1) * ((h + 2) * (w + 2))
            + (jnp.clip(y0, -1, h - 1) + 1) * (w + 2)
            + (jnp.clip(x0, -1, w - 1) + 1)
        )
        idx_t = idx.transpose(0, 2, 1, 3).reshape(B, H, Q * P)
        rows = jnp.take_along_axis(patch, idx_t[..., None], axis=2)
        rows = rows.reshape(B, H, Q, P, 8, Dh).astype(jnp.float32)
        wz = jnp.stack([1 - fz, fz], -1)      # (B,Q,H,P,2)
        wy = jnp.stack([1 - fy, fy], -1)
        wx = jnp.stack([1 - fx, fx], -1)
        cw = (
            wz[..., :, None, None] * wy[..., None, :, None]
            * wx[..., None, None, :]
        ).reshape(*fx.shape, 8)               # (B,Q,H,P,8), (z,y,x) order
        wgt = cw * (attn * inside.astype(jnp.float32))[..., None]
        wgt = wgt.transpose(0, 2, 1, 3, 4)    # (B,H,Q,P,8)
        out = out + jnp.einsum("bhqpcd,bhqpc->bhqd", rows, wgt)
    return out.transpose(0, 2, 1, 3).reshape(B, Q, H * Dh).astype(value.dtype)
