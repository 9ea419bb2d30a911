"""SECONDFPNV2 neck — fuse DLA levels to a single feature map.

Parity: models/necks/second_fpnv2.py:11-104 — per-level deblock
(ConvTranspose for stride>1, strided Conv for fractional stride, norm+ReLU),
channel concat, 3×3 fuse conv to 256. Norms are GroupNorm here (state-free;
see DEVIATIONS.md re: BatchNorm).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class SECONDFPNV2(nn.Module):
    out_channels: Sequence[int] = (256, 256, 256)
    upsample_strides: Sequence[float] = (0.5, 1.0, 2.0)
    fuse_channels: int = 256
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        assert len(feats) == len(self.out_channels)
        ups = []
        for i, (f, oc, s) in enumerate(
            zip(feats, self.out_channels, self.upsample_strides)
        ):
            if s > 1:
                k = int(s)
                y = nn.ConvTranspose(oc, (k, k), strides=(k, k), use_bias=False,
                                     dtype=self.dtype, name=f"deblock{i}_up")(f)
            else:
                k = int(round(1.0 / s))
                y = nn.Conv(oc, (k, k), strides=(k, k), use_bias=False,
                            dtype=self.dtype, name=f"deblock{i}_conv")(f)
            y = nn.GroupNorm(num_groups=32, dtype=self.dtype, name=f"deblock{i}_norm")(y)
            ups.append(nn.relu(y))
        out = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        out = nn.Conv(self.fuse_channels, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=False, dtype=self.dtype, name="last_conv")(out)
        out = nn.relu(nn.GroupNorm(num_groups=32, dtype=self.dtype, name="last_norm")(out))
        return (out,)
