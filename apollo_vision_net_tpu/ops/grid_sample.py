"""Bilinear 2D grid sampling with torch `F.grid_sample` parity.

Used for: BEV rotation by ego yaw (reference rotates `prev_bev` with
torchvision `rotate`, bevformer/modules/transformer.py:182-203), occupancy
flow warping (bevformer_occupancy_head.py:253-301), and as the semantic
reference for the deformable-attention samplers.

Semantics: ``mode='bilinear', padding_mode='zeros', align_corners=False``.
Grid coords are in [-1, 1]; pixel position for size S is
``(g + 1) / 2 * S - 0.5``. Out-of-bounds corners contribute zero.
"""
from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    return (coord + 1.0) * (size / 2.0) - 0.5


def grid_sample_2d(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample `img` at `grid` with bilinear interpolation, zero padding.

    Args:
      img: (H, W, C) feature map.
      grid: (..., 2) normalized coords in [-1, 1], last dim = (x, y)
        where x indexes W and y indexes H (torch convention).

    Returns:
      (..., C) sampled values.
    """
    H, W, C = img.shape
    px = _unnormalize(grid[..., 0], W)
    py = _unnormalize(grid[..., 1], H)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    flat = img.reshape(H * W, C)
    out = jnp.zeros(grid.shape[:-1] + (C,), dtype=img.dtype)
    for cx, cy, w in (
        (0, 0, (1 - fx) * (1 - fy)),
        (1, 0, fx * (1 - fy)),
        (0, 1, (1 - fx) * fy),
        (1, 1, fx * fy),
    ):
        ix = x0 + cx
        iy = y0 + cy
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
        vals = jnp.take(flat, idx, axis=0)
        out = out + vals * (w * valid).astype(img.dtype)[..., None]
    return out


def grid_sample_3d(vol: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sampling of a (D, H, W, C) volume, zero padding.

    grid: (..., 3) normalized coords in [-1, 1], last dim = (x, y, z) with
    x indexing W, y indexing H, z indexing D (torch 5-D grid_sample
    convention, align_corners=False). Used by the occupancy flow
    aggregation (reference bevformer_occupancy_head.py:253-301 warps the
    (bs, dim, z, x, y) volume with F.grid_sample).
    """
    D, H, W, C = vol.shape
    px = _unnormalize(grid[..., 0], W)
    py = _unnormalize(grid[..., 1], H)
    pz = _unnormalize(grid[..., 2], D)
    x0f, y0f, z0f = jnp.floor(px), jnp.floor(py), jnp.floor(pz)
    fx, fy, fz = px - x0f, py - y0f, pz - z0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    z0 = z0f.astype(jnp.int32)

    flat = vol.reshape(D * H * W, C)
    out = jnp.zeros(grid.shape[:-1] + (C,), dtype=vol.dtype)
    for cz in (0, 1):
        wz = fz if cz else (1 - fz)
        iz = z0 + cz
        for cy in (0, 1):
            wy = fy if cy else (1 - fy)
            iy = y0 + cy
            for cx in (0, 1):
                wx = fx if cx else (1 - fx)
                ix = x0 + cx
                valid = (
                    (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
                    & (iz >= 0) & (iz < D)
                )
                idx = (
                    jnp.clip(iz, 0, D - 1) * (H * W)
                    + jnp.clip(iy, 0, H - 1) * W
                    + jnp.clip(ix, 0, W - 1)
                )
                vals = jnp.take(flat, idx, axis=0)
                w = (wx * wy * wz * valid).astype(vol.dtype)
                out = out + vals * w[..., None]
    return out


def rotate_2d(img: jnp.ndarray, angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotate (H, W, C) image by `angle_deg` counter-clockwise about its
    center, bilinear, zeros outside — matching torchvision
    ``transforms.functional.rotate(center=rotate_center)`` as used on
    `prev_bev` (reference transformer.py:193-198, default center = image
    center).
    """
    H, W, _ = img.shape
    theta = jnp.deg2rad(angle_deg)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) - H / 2.0
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) - W / 2.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    # Output pixel (gx, gy) samples the input at the inverse-rotated
    # position. Positive angle = counter-clockwise in the displayed image
    # (y-down), matching PIL/torchvision.
    sx = cos * gx - sin * gy
    sy = sin * gx + cos * gy
    # back to normalized [-1, 1]: pixel p -> (2p + 1)/S - 1
    nx = (2.0 * (sx + W / 2.0 - 0.5) + 1.0) / W - 1.0
    ny = (2.0 * (sy + H / 2.0 - 0.5) + 1.0) / H - 1.0
    grid = jnp.stack([nx, ny], axis=-1)
    return grid_sample_2d(img, grid)
