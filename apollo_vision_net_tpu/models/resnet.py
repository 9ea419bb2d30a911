"""ResNet backbone (flax.linen), mmdet-compatible structure.

Parity: mmdet ResNet as configured by the reference
(projects/configs/bevformer/bev_tiny_det.py:50-59 — depth 50, pytorch style,
out_indices, frozen_stages=1, BN frozen). TPU-first choices:
- NHWC layout throughout (XLA-preferred on TPU).
- `frozen_bn=True` reproduces ``norm_eval + requires_grad=False``: BN is a
  per-channel affine using stored running statistics; no batch stats are
  computed, so the module is state-free under jit. With `frozen_bn=False`
  BatchNorm computes batch statistics (use `axis_name` for cross-device
  sync when training from scratch).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class FrozenBatchNorm(nn.Module):
    """BN with fixed statistics: y = (x - mean) * scale / sqrt(var) + bias.

    Running stats and affine params are regular (trainable-looking) params;
    freeze them via the optimizer mask (parallel/optim.py) exactly like the
    reference freezes them via requires_grad=False.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = scale * jax.lax.rsqrt(var + 1e-5)
        # dtype-preserving: keeps the conv trunk in bf16 when enabled
        return x * inv.astype(x.dtype) + (bias - mean * inv).astype(x.dtype)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: object = jnp.float32
    with_dcn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(name="bn1")(out)
        out = nn.relu(out)
        # pytorch-style: stride on the 3x3
        if self.with_dcn:
            # DCNv2 (R101-DCN config tier): offsets/masks from a 3x3 conv
            # at the block's stride — mmdet applies DCN to EVERY block of a
            # DCN stage, including the stride-2 first block
            from apollo_vision_net_tpu.ops.dcnv3 import modulated_deform_conv

            s = self.stride
            om = nn.Conv(27, (3, 3), strides=(s, s),
                         padding=[(1, 1), (1, 1)],
                         kernel_init=nn.initializers.zeros,
                         name="conv2_offset")(out)
            offset = om[..., :18].reshape(om.shape[:-1] + (9, 2))
            mask = jax.nn.sigmoid(om[..., 18:])
            w = self.param(
                "conv2_dcn_weight",
                nn.initializers.variance_scaling(2.0, "fan_out",
                                                 "truncated_normal"),
                (9, out.shape[-1], self.planes),
            )
            out = modulated_deform_conv(
                out, offset.astype(jnp.float32),
                mask.astype(jnp.float32), w.astype(out.dtype), stride=s,
            ).astype(out.dtype)
        else:
            out = nn.Conv(self.planes, (3, 3),
                          strides=(self.stride, self.stride),
                          padding=[(1, 1), (1, 1)], use_bias=False,
                          dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv3")(out)
        out = FrozenBatchNorm(name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = FrozenBatchNorm(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Multi-stage ResNet returning features at `out_indices` (0-based over
    the 4 residual stages; stage i has stride 2**(i+2))."""

    depth: int = 50
    out_indices: Sequence[int] = (3,)
    base_width: int = 64
    dtype: object = jnp.float32
    # mmdet R101-DCN: dcn in stages 2,3 (strides 16/32), every block
    dcn_stages: Sequence[bool] = (False, False, False, False)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        blocks = _STAGE_BLOCKS[self.depth]
        x = x.astype(self.dtype)
        x = nn.Conv(self.base_width, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False, dtype=self.dtype,
                    name="stem_conv")(x)
        x = FrozenBatchNorm(name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        planes = self.base_width
        for stage, n_blocks in enumerate(blocks):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                x = Bottleneck(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0),
                    dtype=self.dtype,
                    with_dcn=self.dcn_stages[stage],
                    name=f"layer{stage + 1}_{b}",
                )(x)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
