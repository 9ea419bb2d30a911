"""BEVFormer encoder: temporal self-attention + spatial cross-attention.

Parity: bevformer/modules/encoder.py:25-518 (BEVFormerEncoder +
BEVFormerLayer, operation order self_attn→norm→cross_attn→norm→ffn→norm,
post-norm).

Temporal handling is expressed jit-uniformly: instead of the reference's
`prev_bev is None` Python branch (encoder.py:316-325), a traced `has_prev`
scalar in {0,1} blends the no-history behaviour (value = current query in
both queue slots, zero shift/rotation — exactly what the reference computes
for frame 0, since the dataset zeroes can_bus deltas for queue starts). The
reference's deliberate shift aliasing bug — `shift_ref_2d = ref_2d` without
clone, so the *current* stream's reference points also get shifted
(encoder.py:309-311) — is reproduced under `shift_current_refs=True`
(default, for paper parity) and fixable via config.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from apollo_vision_net_tpu.models.attention import (
    FFN,
    SpatialCrossAttention,
    TemporalSelfAttention,
)

Shapes = Tuple[Tuple[int, int], ...]


class BEVFormerLayer(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1  # image feature levels (SCA)
    num_points_sca: int = 8
    num_points_tsa: int = 4
    num_cams: int = 6
    feedforward_channels: int = 512
    ffn_dropout: float = 0.1
    attn_logits_clamp: Optional[float] = None
    msda_impl: str = "auto"
    bev_hw: Optional[Tuple[int, int]] = None
    dtype: object = jnp.float32

    @nn.compact
    def __call__(
        self,
        bev_query: jnp.ndarray,          # (B, Q, C)
        img_value: jnp.ndarray,          # (B, N_cam, V_img, C)
        *,
        bev_pos: jnp.ndarray,            # (B, Q, C)
        tsa_value: jnp.ndarray,          # (B, 2, Q, C)
        tsa_refs: jnp.ndarray,           # (B, 2, Q, 1, 2)
        bev_spatial_shapes: Shapes,
        img_spatial_shapes: Shapes,
        reference_points_cam: jnp.ndarray,
        bev_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        q = TemporalSelfAttention(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            num_levels=1,
            num_points=self.num_points_tsa,
            attn_logits_clamp=self.attn_logits_clamp,
            msda_impl=self.msda_impl,
            dtype=self.dtype,
            name="tsa",
        )(
            bev_query, tsa_value,
            query_pos=bev_pos,
            reference_points=tsa_refs,
            spatial_shapes=bev_spatial_shapes,
            deterministic=deterministic,
        )
        q = nn.LayerNorm(dtype=self.dtype, name="norm1")(q)
        q = SpatialCrossAttention(
            embed_dims=self.embed_dims,
            num_cams=self.num_cams,
            num_heads=self.num_heads,
            num_levels=self.num_levels,
            num_points=self.num_points_sca,
            msda_impl=self.msda_impl,
            bev_hw=self.bev_hw,
            dtype=self.dtype,
            name="sca",
        )(
            q, img_value,
            query_pos=None,  # reference SCA receives query_pos=None
            reference_points_cam=reference_points_cam,
            bev_mask=bev_mask,
            spatial_shapes=img_spatial_shapes,
            deterministic=deterministic,
        )
        q = nn.LayerNorm(dtype=self.dtype, name="norm2")(q)
        q = FFN(
            embed_dims=self.embed_dims,
            feedforward_channels=self.feedforward_channels,
            dropout=self.ffn_dropout,
            dtype=self.dtype,
            name="ffn",
        )(q, deterministic=deterministic)
        q = nn.LayerNorm(dtype=self.dtype, name="norm3")(q)
        return q


class _EncoderScanBody(nn.Module):
    """One encoder layer shaped for nn.scan: carry=q, broadcast
    consts=(q0, prev_bev, hp, img_value, bev_pos, tsa_refs, ref_cam,
    bev_mask). The TSA value queue [prev, cur] is rebuilt from the carry
    each layer (reference encoder.py:316-325 semantics)."""

    embed_dims: int
    num_heads: int
    num_levels: int
    num_points_sca: int
    num_points_tsa: int
    num_cams: int
    feedforward_channels: int
    ffn_dropout: float
    attn_logits_clamp: Optional[float]
    msda_impl: str
    bev_hw: Tuple[int, int]
    bev_spatial_shapes: Shapes
    img_spatial_shapes: Shapes
    dtype: object
    deterministic: bool

    @nn.compact
    def __call__(self, q, consts):
        (q0, prev_bev, hp, img_value, bev_pos, tsa_refs, ref_cam,
         bev_mask) = consts
        value_prev = hp * prev_bev + (1.0 - hp) * q
        value_cur = hp * q0 + (1.0 - hp) * q
        tsa_value = jnp.stack([value_prev, value_cur], axis=1)
        q = BEVFormerLayer(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            num_levels=self.num_levels,
            num_points_sca=self.num_points_sca,
            num_points_tsa=self.num_points_tsa,
            num_cams=self.num_cams,
            feedforward_channels=self.feedforward_channels,
            ffn_dropout=self.ffn_dropout,
            attn_logits_clamp=self.attn_logits_clamp,
            msda_impl=self.msda_impl,
            bev_hw=self.bev_hw,
            dtype=self.dtype,
            name="layer",
        )(
            q, img_value,
            bev_pos=bev_pos,
            tsa_value=tsa_value,
            tsa_refs=tsa_refs,
            bev_spatial_shapes=self.bev_spatial_shapes,
            img_spatial_shapes=self.img_spatial_shapes,
            reference_points_cam=ref_cam,
            bev_mask=bev_mask,
            deterministic=self.deterministic,
        )
        return q, None


class BEVFormerEncoder(nn.Module):
    num_layers: int = 3
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points_sca: int = 8
    num_points_tsa: int = 4
    num_cams: int = 6
    feedforward_channels: int = 512
    ffn_dropout: float = 0.1
    attn_logits_clamp: Optional[float] = None
    shift_current_refs: bool = True  # reproduce encoder.py:309-311 alias bug
    msda_impl: str = "auto"
    dtype: object = jnp.float32

    @nn.compact
    def __call__(
        self,
        bev_query: jnp.ndarray,            # (B, Q, C)
        img_value: jnp.ndarray,            # (B, N_cam, V_img, C)
        *,
        bev_pos: jnp.ndarray,              # (B, Q, C)
        prev_bev: jnp.ndarray,             # (B, Q, C) — aligned history
        has_prev: jnp.ndarray,             # (B,) float {0,1}
        shift: jnp.ndarray,                # (B, 2) normalized grid shift
        ref_2d: jnp.ndarray,               # (Q, 2) plane reference points
        bev_h: int,
        bev_w: int,
        img_spatial_shapes: Shapes,
        reference_points_cam: jnp.ndarray,  # (N_cam, B, Q, D_z, 2)
        bev_mask: jnp.ndarray,              # (N_cam, B, Q, D_z)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        bev_query = bev_query.astype(self.dtype)
        bev_pos = bev_pos.astype(self.dtype)
        prev_bev = prev_bev.astype(self.dtype)
        img_value = img_value.astype(self.dtype)
        B, Q, C = bev_query.shape
        hp = has_prev[:, None, None].astype(self.dtype)
        # frame-0 parity: value slots both = current query, shift = 0
        shift = shift * has_prev[:, None]

        # reference points stay f32: normalized grid coords quantize badly
        # in bf16 (~0.4 cell at 50x50)
        ref = jnp.broadcast_to(ref_2d.astype(jnp.float32)[None], (B, Q, 2))
        ref_shifted = ref + shift.astype(jnp.float32)[:, None, :]
        ref_prev = ref_shifted
        ref_cur = ref_shifted if self.shift_current_refs else ref
        tsa_refs = jnp.stack([ref_prev, ref_cur], axis=1)[:, :, :, None, :]

        # ONE nn.scan over stacked per-layer params (unshared, matching the
        # reference's layer clones): the trunk traces/compiles one layer
        # body instead of num_layers copies — see DetectionTransformerDecoder
        # for why this matters (remote-compile size limits, compile time).
        Body = nn.scan(
            _EncoderScanBody,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.num_layers,
            in_axes=nn.broadcast,
            out_axes=0,
        )
        q, _ = Body(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            num_levels=self.num_levels,
            num_points_sca=self.num_points_sca,
            num_points_tsa=self.num_points_tsa,
            num_cams=self.num_cams,
            feedforward_channels=self.feedforward_channels,
            ffn_dropout=self.ffn_dropout,
            attn_logits_clamp=self.attn_logits_clamp,
            msda_impl=self.msda_impl,
            bev_hw=(bev_h, bev_w),
            bev_spatial_shapes=((bev_h, bev_w),),
            img_spatial_shapes=img_spatial_shapes,
            dtype=self.dtype,
            deterministic=deterministic,
            name="layers",
        )(
            bev_query,
            (bev_query, prev_bev, hp, img_value, bev_pos, tsa_refs,
             reference_points_cam, bev_mask),
        )
        return q
