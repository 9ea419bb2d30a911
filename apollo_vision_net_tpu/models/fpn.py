"""FPN neck (mmdet-compatible), NHWC.

Parity: mmdet FPN as configured in bev_tiny_det.py:61-68
(in_channels=[2048], out_channels=256, add_extra_convs='on_output',
relu_before_extra_convs=True, num_outs=1..4).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 1
    relu_before_extra_convs: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"lateral_{i}")(f)
            for i, f in enumerate(feats)
        ]
        # top-down pathway (nearest-neighbour upsample, mmdet default)
        for i in range(len(laterals) - 1, 0, -1):
            up = jax.image.resize(
                laterals[i],
                laterals[i - 1].shape[:-1] + (laterals[i].shape[-1],),
                method="nearest",
            )
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name=f"fpn_conv_{i}")(l)
            for i, l in enumerate(laterals)
        ]
        # extra outputs: stride-2 convs on the last output ('on_output')
        while len(outs) < self.num_outs:
            src = outs[-1]
            if self.relu_before_extra_convs and len(outs) > len(laterals):
                src = nn.relu(src)
            outs.append(
                nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name=f"extra_conv_{len(outs)}")(src)
            )
        return tuple(outs)
