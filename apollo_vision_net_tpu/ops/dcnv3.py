"""DCNv3 (deformable convolution v3) — the InternImage core operator.

Parity: the reference's in-repo native op
(bevformer/backbones/ops_dcnv3/src/, CUDA im2col; pure-torch reference
``dcnv3_core_pytorch`` in ops_dcnv3/functions/dcnv3_func.py:19-63): for each
output pixel p0, each of G groups samples K=kh·kw points at
``p0 + dilation·k_offset + Δp_k`` with bilinear/zeros semantics, weighted by
softmaxed modulation masks, over group channels.

TPU-first: DCNv3's sampling IS multi-scale deformable attention with L=1
level, P=K points and heads=G — so the op reuses the framework's MSDA
machinery (patch-gather / Pallas kernel), not a CUDA translation.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from apollo_vision_net_tpu.ops.msda import ms_deform_attn


def _kernel_grid(kh: int, kw: int, dil_h: int, dil_w: int) -> np.ndarray:
    """(K, 2) kernel offsets in pixels (x, y), centered."""
    ys = (np.arange(kh) - (kh - 1) / 2.0) * dil_h
    xs = (np.arange(kw) - (kw - 1) / 2.0) * dil_w
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    return np.stack([gx.reshape(-1), gy.reshape(-1)], -1).astype(np.float32)


def dcnv3_core(
    value: jnp.ndarray,    # (B, H, W, G, Dg) input features (post in-proj)
    offset: jnp.ndarray,   # (B, H, W, G, K, 2) learned offsets in pixels (x, y)
    mask: jnp.ndarray,     # (B, H, W, G, K) modulation, already softmaxed
    kernel: Tuple[int, int] = (3, 3),
    dilation: Tuple[int, int] = (1, 1),
    impl: str = "auto",
) -> jnp.ndarray:
    """Returns (B, H, W, G·Dg) sampled features (stride-1, same padding)."""
    B, H, W, G, Dg = value.shape
    K = kernel[0] * kernel[1]
    grid = _kernel_grid(kernel[0], kernel[1], dilation[0], dilation[1])

    # base sampling positions: own pixel center in [0,1] coords
    ys = (np.arange(H, dtype=np.float32) + 0.5) / H
    xs = (np.arange(W, dtype=np.float32) + 0.5) / W
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    p0 = jnp.asarray(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))  # (Q,2)
    Q = H * W
    norm = jnp.asarray([W, H], jnp.float32)

    locs = (
        p0[None, :, None, None, :]                             # (1,Q,1,1,2)
        + (jnp.asarray(grid)[None, None, None] +               # kernel grid
           offset.reshape(B, Q, G, K, 2)) / norm
    )  # (B, Q, G, K, 2)
    locs = locs[:, :, :, None, :, :]                           # L=1 level
    attn = mask.reshape(B, Q, G, 1, K)
    v = value.reshape(B, Q, G, Dg)
    out = ms_deform_attn(
        v, ((H, W),),
        locs.astype(jnp.float32), attn.astype(jnp.float32), impl=impl,
    )  # (B, Q, G*Dg)
    return out.reshape(B, H, W, G * Dg)


def modulated_deform_conv(
    x: jnp.ndarray,        # (B, H, W, C)
    offset: jnp.ndarray,   # (B, H, W, K, 2) pixel offsets (x, y)
    mask: jnp.ndarray,     # (B, H, W, K) sigmoid modulation
    weight: jnp.ndarray,   # (K, C, O) conv weights (kernel-major)
    kernel: Tuple[int, int] = (3, 3),
    dilation: Tuple[int, int] = (1, 1),
) -> jnp.ndarray:
    """DCNv2 (modulated deformable convolution), stride 1, same padding —
    the op mmdet's ResNet-DCN uses for the R101 'base' configs. Exact
    bilinear/zeros sampling via the framework's patch-gather trick.
    Returns (B, H, W, O)."""
    B, H, W, C = x.shape
    K = kernel[0] * kernel[1]
    grid = _kernel_grid(kernel[0], kernel[1], dilation[0], dilation[1])
    # zero-pad by 1 and build 2x2 corner stacks: (B, Hp*Wp, 4C)
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    p01 = jnp.roll(xp, -1, axis=2)
    p10 = jnp.roll(xp, -1, axis=1)
    p11 = jnp.roll(p10, -1, axis=2)
    patch = jnp.concatenate([xp, p01, p10, p11], axis=-1).reshape(
        B, (H + 2) * (W + 2), 4 * C)

    ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    base = np.stack([xs.reshape(-1), ys.reshape(-1)], -1)  # (Q, 2) pixels
    Q = H * W
    pos = (
        jnp.asarray(base)[None, :, None, :]
        + jnp.asarray(grid)[None, None, :, :]
        + offset.reshape(B, Q, K, 2)
    )  # (B, Q, K, 2) absolute pixels
    px, py = pos[..., 0], pos[..., 1]
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = (px - x0)[..., None]
    fy = (py - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    inside = (
        (x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1)
    ).astype(x.dtype)[..., None]
    idx = (jnp.clip(y0, -1, H - 1) + 1) * (W + 2) + jnp.clip(x0, -1, W - 1) + 1
    rows = jnp.take_along_axis(
        patch, idx.reshape(B, Q * K)[..., None], axis=1
    ).reshape(B, Q, K, 4, C)
    sampled = (
        rows[:, :, :, 0] * (1 - fx) * (1 - fy)
        + rows[:, :, :, 1] * fx * (1 - fy)
        + rows[:, :, :, 2] * (1 - fx) * fy
        + rows[:, :, :, 3] * fx * fy
    ) * inside * mask.reshape(B, Q, K, 1)
    out = jnp.einsum("bqkc,kco->bqo", sampled, weight)
    return out.reshape(B, H, W, -1)
