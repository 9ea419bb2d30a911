"""BEV/camera geometry: reference points, projection, ego-motion shift.

Parity targets (reference file:line):
- pillar / plane reference points: bevformer/modules/encoder.py:47-86
- `point_sampling` lidar→camera projection: encoder.py:123-241
- can_bus ego-motion BEV shift: bevformer/modules/transformer.py:156-178
- prev_bev rotation semantics: transformer.py:182-203 (see ops/grid_sample)

All functions are pure jnp on static shapes; batch via vmap.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def bev_reference_points_3d(
    bev_h: int, bev_w: int, z_size: float, num_points_in_pillar: int
) -> np.ndarray:
    """Pillar reference points for spatial cross-attention.

    Returns (num_points_in_pillar, bev_h*bev_w, 3) in normalized [0,1]
    (x, y, z) — matches encoder.py:61-72 (zs normalized by pillar height Z =
    pc_range[5]-pc_range[2]).
    """
    zs = np.linspace(0.5, z_size - 0.5, num_points_in_pillar) / z_size
    xs = (np.arange(bev_w) + 0.5) / bev_w
    ys = (np.arange(bev_h) + 0.5) / bev_h
    zz = zs[:, None, None] * np.ones((1, bev_h, bev_w))
    xx = np.broadcast_to(xs[None, None, :], (num_points_in_pillar, bev_h, bev_w))
    yy = np.broadcast_to(ys[None, :, None], (num_points_in_pillar, bev_h, bev_w))
    ref = np.stack([xx, yy, zz], axis=-1)  # (P, H, W, 3)
    return ref.reshape(num_points_in_pillar, bev_h * bev_w, 3).astype(np.float32)


def bev_reference_points_2d(bev_h: int, bev_w: int) -> np.ndarray:
    """Plane reference points for temporal self-attention.

    Returns (bev_h*bev_w, 2) normalized (x, y) — encoder.py:76-86.
    """
    ys, xs = np.meshgrid(
        (np.arange(bev_h) + 0.5) / bev_h,
        (np.arange(bev_w) + 0.5) / bev_w,
        indexing="ij",
    )
    return np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(np.float32)


def point_sampling(
    ref_3d: jnp.ndarray,
    pc_range: Sequence[float],
    lidar2img: jnp.ndarray,
    img_shape: Tuple[int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project pillar reference points into every camera (single sample).

    Args:
      ref_3d: (P, N, 3) normalized reference points.
      pc_range: [x0, y0, z0, x1, y1, z1] point-cloud range in meters.
      lidar2img: (num_cam, 4, 4) projection matrices.
      img_shape: (H_img, W_img) after augmentation (the size features were
        computed at).

    Returns:
      reference_points_cam: (num_cam, N, P, 2) in [0,1] image coords.
      bev_mask: (num_cam, N, P) bool visibility (depth > eps and inside img),
        matching encoder.py:185-233 (strict inequalities, exclusive bounds).
    """
    pc_range = np.asarray(pc_range, np.float32)
    P, N, _ = ref_3d.shape
    xyz = ref_3d * (pc_range[3:6] - pc_range[0:3]) + pc_range[0:3]
    xyz1 = jnp.concatenate([xyz, jnp.ones((P, N, 1), xyz.dtype)], axis=-1)
    # (cam, P, N, 4) = (cam, 1, 4, 4) @ (1, P, N, 4, 1)
    proj = jnp.einsum("cij,pnj->cpni", lidar2img.astype(jnp.float32),
                      xyz1.astype(jnp.float32))
    eps = 1e-5
    depth = proj[..., 2:3]
    mask = depth[..., 0] > eps
    uv = proj[..., 0:2] / jnp.maximum(depth, eps)
    h_img, w_img = img_shape
    u = uv[..., 0] / float(w_img)
    v = uv[..., 1] / float(h_img)
    mask = (
        mask & (u > 0.0) & (u < 1.0) & (v > 0.0) & (v < 1.0)
    )
    ref_cam = jnp.stack([u, v], axis=-1)  # (cam, P, N, 2)
    # match reference output layout: (num_cam, N, P, ...)
    return ref_cam.transpose(0, 2, 1, 3), mask.transpose(0, 2, 1)


def spatial_block_order(h: int, w: int, bh: int = 8, bw: int = 16
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Permutation reordering a row-major (h, w) grid into (bh, bw) blocks
    scanned block-row-major. Makes consecutive query tiles spatially
    compact, so per-(camera, tile) visibility masks actually skip work.

    Returns (perm, inv_perm), each (h*w,) int32 with
    ``flat_blocked = flat_rowmajor[perm]``.
    """
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    key = (
        (ys // bh) * ((w + bw - 1) // bw) + (xs // bw)
    ) * (bh * bw) + (ys % bh) * bw + (xs % bw)
    perm = np.argsort(key.reshape(-1), kind="stable").astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm), dtype=np.int32)
    return perm, inv


def bev_shift_from_can_bus(
    can_bus: jnp.ndarray,
    grid_length: Tuple[float, float],
    bev_h: int,
    bev_w: int,
    use_shift: bool = True,
) -> jnp.ndarray:
    """Normalized BEV grid shift (shift_x, shift_y) from ego motion.

    can_bus[0:2] = global translation delta vs previous frame, can_bus[-2] =
    global yaw in radians (patched by the dataset). Reproduces
    transformer.py:156-178 exactly, including the sin/cos axis convention.
    """
    delta_x, delta_y = can_bus[0], can_bus[1]
    ego_angle = can_bus[-2] / np.pi * 180.0
    grid_length_y, grid_length_x = grid_length[0], grid_length[1]
    translation_length = jnp.sqrt(delta_x**2 + delta_y**2)
    translation_angle = jnp.arctan2(delta_y, delta_x) / np.pi * 180.0
    bev_angle = ego_angle - translation_angle
    shift_y = (
        translation_length * jnp.cos(bev_angle / 180.0 * np.pi)
        / grid_length_y / bev_h
    )
    shift_x = (
        translation_length * jnp.sin(bev_angle / 180.0 * np.pi)
        / grid_length_x / bev_w
    )
    scale = 1.0 if use_shift else 0.0
    return jnp.stack([shift_x * scale, shift_y * scale]).astype(jnp.float32)
