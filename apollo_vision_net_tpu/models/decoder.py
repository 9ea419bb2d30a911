"""DETR-style detection decoder with iterative box refinement.

Parity: bevformer/modules/decoder.py:51-127 (DetectionTransformerDecoder)
with DetrTransformerDecoderLayer op order self_attn→norm→cross_attn→norm→
ffn→norm (bev_tiny_det.py:110-128); per-layer reference refinement
`new_ref = sigmoid(reg[..., (0,1,4)] + inverse_sigmoid(ref))`, refs detached
between layers.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from apollo_vision_net_tpu.models.attention import (
    FFN,
    CustomMSDeformableAttention,
    MultiheadAttention,
)
from apollo_vision_net_tpu.utils.box_coder import inverse_sigmoid

Shapes = Tuple[Tuple[int, int], ...]


class DetrDecoderLayer(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    num_points: int = 4
    feedforward_channels: int = 512
    dropout: float = 0.1
    msda_impl: str = "auto"
    dtype: object = jnp.float32
    # Group-DETR (reference bevformer/modules/group_attention.py:148-157):
    # during training the query set is `self_attn_groups` independent groups
    # folded into the batch so self-attention cannot mix groups.
    self_attn_groups: int = 1

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,          # (B, Q, C)
        memory: jnp.ndarray,         # (B, V, C) BEV features
        *,
        query_pos: jnp.ndarray,      # (B, Q, C)
        reference_points: jnp.ndarray,  # (B, Q, 2)
        spatial_shapes: Shapes,
        self_attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        query = query.astype(self.dtype)
        query_pos = query_pos.astype(self.dtype)
        memory = memory.astype(self.dtype)
        B, Q, C = query.shape
        G = self.self_attn_groups if (Q % self.self_attn_groups == 0) else 1
        mha = MultiheadAttention(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            dropout=self.dropout,
            dtype=self.dtype,
            name="self_attn",
        )
        if G > 1:
            qg = query.reshape(B * G, Q // G, C)
            pg = query_pos.reshape(B * G, Q // G, C)
            q = mha(qg, query_pos=pg, attn_mask=self_attn_mask,
                    deterministic=deterministic).reshape(B, Q, C)
        else:
            q = mha(query, query_pos=query_pos, attn_mask=self_attn_mask,
                    deterministic=deterministic)
        q = nn.LayerNorm(dtype=self.dtype, name="norm1")(q)
        q = CustomMSDeformableAttention(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            num_levels=1,
            num_points=self.num_points,
            dropout=self.dropout,
            msda_impl=self.msda_impl,
            dtype=self.dtype,
            name="cross_attn",
        )(q, memory, query_pos=query_pos, reference_points=reference_points,
          spatial_shapes=spatial_shapes, deterministic=deterministic)
        q = nn.LayerNorm(dtype=self.dtype, name="norm2")(q)
        q = FFN(
            embed_dims=self.embed_dims,
            feedforward_channels=self.feedforward_channels,
            dropout=self.dropout,
            dtype=self.dtype,
            name="ffn",
        )(q, deterministic=deterministic)
        q = nn.LayerNorm(dtype=self.dtype, name="norm3")(q)
        return q


class RegBranch(nn.Module):
    """Per-layer box/point regression MLP (unshared across layers — the
    scan stacks its params along the layer axis)."""

    embed_dims: int
    code_size: int

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = nn.Dense(self.embed_dims)(x)
            x = nn.relu(x)
        return nn.Dense(self.code_size)(x)


class _DecoderScanBody(nn.Module):
    """One decoder layer + its regression branch, shaped for nn.scan:
    carry=(query, ref), broadcast consts=(memory, query_pos)."""

    embed_dims: int
    num_heads: int
    num_points: int
    feedforward_channels: int
    dropout: float
    msda_impl: str
    self_attn_groups: int
    dtype: object
    code_size: int
    ref_mode: str               # 'det3d' (xyz from slots 0:2,4:5) | 'map2d'
    spatial_shapes: Shapes
    deterministic: bool

    @nn.compact
    def __call__(self, carry, consts):
        out, ref = carry
        memory, query_pos = consts
        out = DetrDecoderLayer(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            num_points=self.num_points,
            feedforward_channels=self.feedforward_channels,
            dropout=self.dropout,
            msda_impl=self.msda_impl,
            self_attn_groups=self.self_attn_groups,
            dtype=self.dtype,
            name="layer",
        )(
            out, memory,
            query_pos=query_pos,
            reference_points=ref[..., :2],
            spatial_shapes=self.spatial_shapes,
            deterministic=self.deterministic,
        )
        tmp = RegBranch(self.embed_dims, self.code_size, name="reg_branch")(
            out)
        if self.ref_mode == "det3d":
            new_xy = tmp[..., 0:2] + inverse_sigmoid(ref[..., 0:2])
            new_z = tmp[..., 4:5] + inverse_sigmoid(ref[..., 2:3])
            ref = jax.lax.stop_gradient(
                jax.nn.sigmoid(jnp.concatenate([new_xy, new_z], axis=-1))
            )
        else:  # map2d (MapTR decoder, maptr/modules/decoder.py:8-61)
            ref = jax.lax.stop_gradient(
                jax.nn.sigmoid(tmp[..., :2] + inverse_sigmoid(ref))
            )
        return (out, ref), (out, ref, tmp)


class DetectionTransformerDecoder(nn.Module):
    """Returns (states (Lyr, B, Q, C), refs (Lyr, B, Q, R), regs
    (Lyr, B, Q, code_size)) where refs[l] is the refined reference AFTER
    layer l (reference appends post-update) and regs[l] is layer l's
    regression-branch output on states[l] — the same values the reference
    recomputes post-hoc in the head's output loop.

    The layer stack runs as ONE nn.scan over stacked per-layer params
    (params unshared, matching the reference's unshared clones): 6 layers
    trace and compile as one body instead of six — the difference between
    the 200x200 base config fitting the remote compiler's request limit or
    not, and a ~L-fold cut in trunk compile time. The regression branches
    live inside the scan because iterative refinement consumes them
    between layers."""

    num_layers: int = 6
    embed_dims: int = 256
    num_heads: int = 8
    num_points: int = 4
    feedforward_channels: int = 512
    dropout: float = 0.1
    msda_impl: str = "auto"
    self_attn_groups: int = 1
    dtype: object = jnp.float32
    code_size: int = 10
    ref_mode: str = "det3d"

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,             # (B, Q, C)
        memory: jnp.ndarray,            # (B, V, C)
        *,
        query_pos: jnp.ndarray,
        reference_points: jnp.ndarray,  # (B, Q, R) sigmoid space
        spatial_shapes: Shapes,
        deterministic: bool = True,
    ):
        Body = nn.scan(
            _DecoderScanBody,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.num_layers,
            in_axes=nn.broadcast,
            out_axes=0,
        )
        query = query.astype(self.dtype)
        (_, _), (states, refs, regs) = Body(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            num_points=self.num_points,
            feedforward_channels=self.feedforward_channels,
            dropout=self.dropout,
            msda_impl=self.msda_impl,
            self_attn_groups=self.self_attn_groups,
            dtype=self.dtype,
            code_size=self.code_size,
            ref_mode=self.ref_mode,
            spatial_shapes=tuple(tuple(s) for s in spatial_shapes),
            deterministic=deterministic,
            name="layers",
        )((query, reference_points), (memory, query_pos))
        return states, refs, regs
