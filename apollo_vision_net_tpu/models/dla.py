"""DLA backbone (Deep Layer Aggregation) — Apollo's production det+occ/map
backbone.

Parity: models/backbones/dla.py:331-428 (DLA-34: levels [1,1,1,2,2,1],
channels [16,32,64,128,256,512], BasicBlock, hierarchical tree aggregation
with identity root residuals at levels 3-5), NHWC + FrozenBatchNorm like
resnet.py. Returns the stride-8/16/32 stages for the neck
(SECONDFPNV2 consumes dla layers 3,4,5 — models/necks/second_fpnv2.py).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from apollo_vision_net_tpu.models.resnet import FrozenBatchNorm


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: object = jnp.float32
    # `x` arrives in 2x2 space-to-depth form (stride must be 2): conv1 runs
    # as an s2d stride-2 conv (ops/s2d.py) with the SAME parameter
    # name/shape, producing the plain stride-2 output directly — avoids the
    # full-resolution layout XLA thrashes on at the stem/level2 seam.
    s2d_in: bool = False

    @nn.compact
    def __call__(self, x, residual=None):
        if residual is None:
            residual = x
        if self.s2d_in:
            assert self.stride == 2, self.stride
            from apollo_vision_net_tpu.ops.s2d import S2DConv

            out = S2DConv(self.planes, 3, x.shape[-1] // 4, stride=2,
                          pad=1, dtype=self.dtype, name="conv1")(x)
        else:
            out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                          padding=[(1, 1), (1, 1)], use_bias=False,
                          dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(name="bn2")(out)
        return nn.relu(out + residual)


class Root(nn.Module):
    out_channels: int
    residual: bool
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, *children):
        x = jnp.concatenate(children, axis=-1)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = FrozenBatchNorm(name="bn")(x)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    levels: int
    out_channels: int
    stride: int = 1
    level_root: bool = False
    root_residual: bool = False
    dtype: object = jnp.float32
    # input arrives in 2x2 s2d form (requires levels == 1, stride == 2):
    # the 2x2/s2 maxpool becomes an exact parity-group max (the pool window
    # IS the s2d block) and tree1.conv1 runs as an s2d conv — same params,
    # same math, no full-resolution tensors for XLA to lay out.
    s2d_in: bool = False

    @nn.compact
    def __call__(self, x, residual=None, children=()):
        children = list(children)
        if self.s2d_in:
            assert self.levels == 1 and self.stride == 2, (
                self.levels, self.stride)
            B, H2, W2, C4 = x.shape
            bottom = x.reshape(B, H2, W2, 4, C4 // 4).max(axis=-2)
            in_ch = C4 // 4
        else:
            bottom = (
                nn.max_pool(x, (self.stride,) * 2,
                            strides=(self.stride,) * 2)
                if self.stride > 1 else x
            )
            in_ch = x.shape[-1]
        # project exists only when tree1 is a BasicBlock (reference dla.py
        # Tree.__init__: "If 'self.tree1' is a Tree ... the output of
        # project is not used" — no params are created there, and matching
        # that keeps the param tree importable from torch checkpoints)
        if self.levels == 1 and in_ch != self.out_channels:
            proj = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                           dtype=self.dtype, name="project_conv")(bottom)
            proj = FrozenBatchNorm(name="project_bn")(proj)
        else:
            proj = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = BasicBlock(self.out_channels, self.stride, dtype=self.dtype,
                            s2d_in=self.s2d_in, name="tree1")(
                x, residual=proj)
            x2 = BasicBlock(self.out_channels, 1, dtype=self.dtype, name="tree2")(x1)
            return Root(self.out_channels, self.root_residual, dtype=self.dtype, name="root")(
                x2, x1, *children)
        x1 = Tree(self.levels - 1, self.out_channels, self.stride,
                  root_residual=self.root_residual, dtype=self.dtype,
                  name="tree1")(x)
        return Tree(self.levels - 1, self.out_channels, 1,
                    root_residual=self.root_residual, dtype=self.dtype,
                    name="tree2")(
            x1, children=children + [x1])


class DLA(nn.Module):
    """DLA-34 by default; returns stages at out_indices (stage i stride 2^i,
    i in 0..5)."""

    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    out_indices: Sequence[int] = (3, 4, 5)
    root_residual: bool = False
    dtype: object = jnp.float32
    # Run the stem (base 7×7 s1 + level0 3×3 s1 + level1 3×3 s2) in 2×2
    # space-to-depth form — exact same math, same parameter tree, ~16×
    # better MXU utilization at 3–32 channels and no XLA layout-shuffle
    # copies (measured ~4 ms/frame of stem copies at 6×480×800). See
    # ops/s2d.py. Requires even H, W.
    stem_s2d: bool = True

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        ch = self.channels
        outs = []
        if self.stem_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            from apollo_vision_net_tpu.ops.s2d import (
                S2DConv,
                S2DEntryConv,
                apply_channelwise_s2d,
                depth_to_space,
                space_to_depth,
            )

            # entry: raw image straight into one stride-2 phase-stacked
            # conv (s2d_entry_conv) — no explicit image transpose
            y2 = S2DEntryConv(ch[0], 7, x.shape[-1], pad=3, dtype=self.dtype,
                              name="base_conv")(x)
            y2 = apply_channelwise_s2d(FrozenBatchNorm(name="base_bn"), y2)
            y2 = nn.relu(y2)
            y2 = S2DConv(ch[0], 3, ch[0], pad=1, dtype=self.dtype,
                         name="level0_conv")(y2)
            y2 = apply_channelwise_s2d(FrozenBatchNorm(name="level0_bn"), y2)
            y2 = nn.relu(y2)
            if 0 in self.out_indices:
                outs.append(depth_to_space(y2))
            y = S2DConv(ch[1], 3, ch[0], stride=2, pad=1, dtype=self.dtype,
                        name="level1_conv")(y2)
            y = nn.relu(FrozenBatchNorm(name="level1_bn")(y))
            if 1 in self.out_indices:
                outs.append(y)
            # hand level2 its input in s2d form: its 2x2/s2 maxpool becomes
            # a parity-group max and tree1.conv1 an s2d conv — kills the
            # layout copies XLA inserts around the full-res (H/2, W/2)
            # tensor at this seam (measured ~1 ms/frame at the flagship)
            y = space_to_depth(y)
        else:
            x = x.astype(self.dtype)
            x = nn.Conv(ch[0], (7, 7), padding=[(3, 3), (3, 3)],
                        use_bias=False, dtype=self.dtype, name="base_conv")(x)
            x = FrozenBatchNorm(name="base_bn")(x)
            x = nn.relu(x)

            # level0: conv block
            y = nn.Conv(ch[0], (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype,
                        name="level0_conv")(x)
            y = nn.relu(FrozenBatchNorm(name="level0_bn")(y))
            if 0 in self.out_indices:
                outs.append(y)
            # level1: strided conv block
            y = nn.Conv(ch[1], (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype, name="level1_conv")(y)
            y = nn.relu(FrozenBatchNorm(name="level1_bn")(y))
            if 1 in self.out_indices:
                outs.append(y)

        s2d_level2 = (self.stem_s2d and y.ndim == 4
                      and y.shape[-1] == 4 * ch[1] and self.levels[2] == 1)
        for i in range(2, 6):
            y = Tree(
                self.levels[i], ch[i], stride=2,
                level_root=(i > 2),
                root_residual=self.root_residual,
                dtype=self.dtype,
                s2d_in=(i == 2 and s2d_level2),
                name=f"level{i}",
            )(y)
            if i in self.out_indices:
                outs.append(y)
        return tuple(outs)
