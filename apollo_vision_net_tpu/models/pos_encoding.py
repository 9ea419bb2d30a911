"""Positional encodings.

Parity: mmdet LearnedPositionalEncoding (bev_tiny_det.py:139-144,
num_feats=128, row/col embeds of bev_h/bev_w) and the sine encoding used by
map/voxel variants.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class LearnedPositionalEncoding(nn.Module):
    """Row/col learned embedding -> (H*W, 2*num_feats)."""

    num_feats: int = 128
    row_num_embed: int = 200
    col_num_embed: int = 200

    @nn.compact
    def __call__(self, h: int, w: int) -> jnp.ndarray:
        row = self.param(
            "row_embed", nn.initializers.uniform(scale=1.0),
            (self.row_num_embed, self.num_feats),
        )
        col = self.param(
            "col_embed", nn.initializers.uniform(scale=1.0),
            (self.col_num_embed, self.num_feats),
        )
        # (h, w, 2F): col embedding first, then row — mmdet convention
        # (x/col features, then y/row features), flattened row-major.
        pos = jnp.concatenate(
            [
                jnp.broadcast_to(col[None, :w, :], (h, w, self.num_feats)),
                jnp.broadcast_to(row[:h, None, :], (h, w, self.num_feats)),
            ],
            axis=-1,
        )
        return pos.reshape(h * w, 2 * self.num_feats)


def sine_positional_encoding_1d(positions: jnp.ndarray, num_feats: int,
                                temperature: float = 10000.0) -> jnp.ndarray:
    """Standard DETR sine embedding for normalized positions in [0,1]."""
    scale = 2 * np.pi
    dim_t = temperature ** (
        2 * (np.arange(num_feats) // 2) / num_feats
    )
    pos = positions[..., None] * scale / dim_t
    return jnp.concatenate(
        [jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])], axis=-1
    )
