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


class DetectionTransformerDecoder(nn.Module):
    """Returns (states (Lyr, B, Q, C), refs (Lyr, B, Q, 3)) where refs[l] is
    the refined reference AFTER layer l (reference appends post-update)."""

    num_layers: int = 6
    embed_dims: int = 256
    num_heads: int = 8
    num_points: int = 4
    feedforward_channels: int = 512
    dropout: float = 0.1
    msda_impl: str = "auto"
    self_attn_groups: int = 1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,             # (B, Q, C)
        memory: jnp.ndarray,            # (B, V, C)
        *,
        query_pos: jnp.ndarray,
        reference_points: jnp.ndarray,  # (B, Q, 3) sigmoid space
        spatial_shapes: Shapes,
        reg_branch_fn: Optional[Callable[[int, jnp.ndarray], jnp.ndarray]],
        deterministic: bool = True,
    ):
        states = []
        refs = []
        ref = reference_points
        out = query
        for lid in range(self.num_layers):
            out = DetrDecoderLayer(
                embed_dims=self.embed_dims,
                num_heads=self.num_heads,
                num_points=self.num_points,
                feedforward_channels=self.feedforward_channels,
                dropout=self.dropout,
                msda_impl=self.msda_impl,
                self_attn_groups=self.self_attn_groups,
                dtype=self.dtype,
                name=f"layer{lid}",
            )(
                out, memory,
                query_pos=query_pos,
                reference_points=ref[..., :2],
                spatial_shapes=spatial_shapes,
                deterministic=deterministic,
            )
            if reg_branch_fn is not None:
                tmp = reg_branch_fn(lid, out)  # (B, Q, code_size)
                new_xy = tmp[..., 0:2] + inverse_sigmoid(ref[..., 0:2])
                new_z = tmp[..., 4:5] + inverse_sigmoid(ref[..., 2:3])
                ref = jax.lax.stop_gradient(
                    jax.nn.sigmoid(jnp.concatenate([new_xy, new_z], axis=-1))
                )
            states.append(out)
            refs.append(ref)
        return jnp.stack(states), jnp.stack(refs)
