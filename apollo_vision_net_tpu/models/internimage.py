"""InternImage backbone built on the DCNv3 op.

Parity: bevformer/backbones/internimage.py:336-701 — stem (2× stride-2 conv
+ LN + GELU), stages of InternImageLayer (LN→DCNv3→layer-scale residual,
LN→MLP(4×, GELU)→layer-scale residual, post-norm for -S and larger),
stride-2 conv downsample between stages. InternImage-S: channels 80, depths
(4, 4, 21, 4), groups (5, 10, 20, 40) — used by the `*_intern_s` configs.
The native CUDA DCNv3 op is replaced by ops/dcnv3.py (MSDA-based, exact).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from apollo_vision_net_tpu.ops.dcnv3 import dcnv3_core


class DCNv3Block(nn.Module):
    channels: int
    groups: int
    offset_scale: float = 1.0
    kernel: Tuple[int, int] = (3, 3)
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        B, H, W, C = x.shape
        G = self.groups
        Dg = C // G
        K = self.kernel[0] * self.kernel[1]
        v = nn.Dense(C, dtype=self.dtype, name="input_proj")(x)
        # offset/mask predicted from a depthwise conv of the input
        dw = nn.Conv(C, self.kernel, padding="SAME", feature_group_count=C,
                     dtype=self.dtype, name="dw_conv")(x)
        dw = nn.LayerNorm(name="dw_norm")(dw)
        dw = nn.gelu(dw)
        offset = nn.Dense(G * K * 2, kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          name="offset")(dw)
        mask = nn.Dense(G * K, kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros, name="mask")(dw)
        mask = jax.nn.softmax(
            mask.reshape(B, H, W, G, K).astype(jnp.float32), axis=-1)
        offset = offset.reshape(B, H, W, G, K, 2).astype(jnp.float32)
        offset = offset * self.offset_scale
        out = dcnv3_core(
            v.reshape(B, H, W, G, Dg).astype(jnp.float32), offset, mask,
            kernel=self.kernel,
        ).astype(x.dtype)
        return nn.Dense(C, dtype=self.dtype, name="output_proj")(out)


class InternImageLayer(nn.Module):
    channels: int
    groups: int
    mlp_ratio: float = 4.0
    post_norm: bool = True
    layer_scale: float = 1.0
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        g1 = self.param("gamma1", nn.initializers.constant(self.layer_scale),
                        (self.channels,))
        g2 = self.param("gamma2", nn.initializers.constant(self.layer_scale),
                        (self.channels,))
        dcn = DCNv3Block(self.channels, self.groups, dtype=self.dtype,
                         name="dcn")
        if self.post_norm:
            y = nn.LayerNorm(name="norm1")(dcn(x))
        else:
            y = dcn(nn.LayerNorm(name="norm1")(x))
        x = x + g1.astype(x.dtype) * y
        h = int(self.channels * self.mlp_ratio)
        def mlp(z):
            z = nn.Dense(h, dtype=self.dtype, name="mlp_fc1")(z)
            z = nn.gelu(z)
            return nn.Dense(self.channels, dtype=self.dtype,
                            name="mlp_fc2")(z)
        if self.post_norm:
            y = nn.LayerNorm(name="norm2")(mlp(x))
        else:
            y = mlp(nn.LayerNorm(name="norm2")(x))
        return x + g2.astype(x.dtype) * y


class InternImage(nn.Module):
    """InternImage-S by default; returns stage outputs at out_indices
    (stage i has stride 2^(i+2))."""

    channels: int = 80
    depths: Sequence[int] = (4, 4, 21, 4)
    groups: Sequence[int] = (5, 10, 20, 40)
    mlp_ratio: float = 4.0
    post_norm: bool = True
    out_indices: Sequence[int] = (1, 2, 3)
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        c = self.channels
        x = nn.Conv(c // 2, (3, 3), strides=(2, 2), padding="SAME",
                    dtype=self.dtype, name="stem1")(x)
        x = nn.gelu(nn.LayerNorm(name="stem_ln1")(x))
        x = nn.Conv(c, (3, 3), strides=(2, 2), padding="SAME",
                    dtype=self.dtype, name="stem2")(x)
        x = nn.LayerNorm(name="stem_ln2")(x)
        outs = []
        for i, (depth, groups) in enumerate(zip(self.depths, self.groups)):
            for b in range(depth):
                x = InternImageLayer(
                    channels=c * 2**i, groups=groups,
                    mlp_ratio=self.mlp_ratio, post_norm=self.post_norm,
                    dtype=self.dtype, name=f"stage{i}_block{b}",
                )(x)
            if i in self.out_indices:
                outs.append(x)
            if i < len(self.depths) - 1:
                x = nn.Conv(c * 2**(i + 1), (3, 3), strides=(2, 2),
                            padding="SAME", dtype=self.dtype,
                            name=f"down{i}")(x)
                x = nn.LayerNorm(name=f"down_ln{i}")(x)
        return tuple(outs)
