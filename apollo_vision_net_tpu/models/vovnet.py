"""VoVNet backbone (OSA modules + eSE attention), NHWC.

Parity: models/backbones/vovnet.py:268-374 — VoVNet-99/57/39 style: stem of
3 convs, stages of OSA modules (5 sequential 3×3 convs whose outputs concat
with the input, fused by a 1×1 conv, effective-SE gate, identity where
shapes allow), stride-2 maxpool between stages. Used by DD3D-style
pretraining in the reference; config keys V-99 eSE.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from apollo_vision_net_tpu.models.resnet import FrozenBatchNorm

# V-99: stage channels / concat channels / per-stage OSA block counts
VOVNET99 = dict(
    stem=(64, 64, 128),
    stage_conv_ch=(128, 160, 192, 224),
    stage_out_ch=(256, 512, 768, 1024),
    layers_per_block=5,
    blocks=(1, 3, 9, 3),
)
VOVNET39 = dict(
    stem=(64, 64, 128),
    stage_conv_ch=(128, 160, 192, 224),
    stage_out_ch=(256, 512, 768, 1024),
    layers_per_block=5,
    blocks=(1, 1, 2, 2),
)


def _conv_norm_relu(x, ch, k, s, name, dtype):
    x = nn.Conv(ch, (k, k), strides=(s, s),
                padding=[(k // 2, k // 2)] * 2, use_bias=False,
                dtype=dtype, name=f"{name}_conv")(x)
    x = FrozenBatchNorm(name=f"{name}_bn")(x)
    return nn.relu(x)


class eSE(nn.Module):
    channels: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        gate = x.mean(axis=(1, 2), keepdims=True)
        gate = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                       name="fc")(gate)
        # hsigmoid
        gate = jnp.clip(gate + 3.0, 0.0, 6.0) / 6.0
        return x * gate


class OSABlock(nn.Module):
    conv_ch: int
    out_ch: int
    layers: int = 5
    identity: bool = False
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = [x]
        y = x
        for i in range(self.layers):
            y = _conv_norm_relu(y, self.conv_ch, 3, 1, f"osa{i}", self.dtype)
            feats.append(y)
        cat = jnp.concatenate(feats, axis=-1)
        out = _conv_norm_relu(cat, self.out_ch, 1, 1, "concat", self.dtype)
        out = eSE(self.out_ch, dtype=self.dtype, name="ese")(out)
        if self.identity and x.shape[-1] == self.out_ch:
            out = out + x
        return out


class VoVNet(nn.Module):
    arch: str = "V-99-eSE"
    out_indices: Sequence[int] = (1, 2, 3)  # stages (stride 8/16/32)
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        cfg = VOVNET99 if "99" in self.arch else VOVNET39
        x = x.astype(self.dtype)
        s = cfg["stem"]
        x = _conv_norm_relu(x, s[0], 3, 2, "stem1", self.dtype)
        x = _conv_norm_relu(x, s[1], 3, 1, "stem2", self.dtype)
        x = _conv_norm_relu(x, s[2], 3, 2, "stem3", self.dtype)
        outs = []
        for stage in range(4):
            if stage > 0:
                # reference: MaxPool2d(3, stride=2, ceil_mode=True) — windows
                # start at 0 and the tail window is partial, i.e. pad only
                # bottom/right (flax max_pool pads with -inf: exact)
                x = nn.max_pool(x, (3, 3), strides=(2, 2),
                                padding=[(0, 1), (0, 1)])
            for b in range(cfg["blocks"][stage]):
                x = OSABlock(
                    conv_ch=cfg["stage_conv_ch"][stage],
                    out_ch=cfg["stage_out_ch"][stage],
                    layers=cfg["layers_per_block"],
                    identity=(b > 0),
                    dtype=self.dtype,
                    name=f"stage{stage + 2}_osa{b}",
                )(x)
            if stage in self.out_indices:
                outs.append(x)
        return tuple(outs)
