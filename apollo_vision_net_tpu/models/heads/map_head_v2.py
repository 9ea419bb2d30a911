"""MapTRv2 det+map head: decoupled decoder + one2one/one2many query sets +
auxiliary BEV/PV segmentation.

Parity (reference file:line):
- BEVFormerDetMapHeadApolloV2 (maptrv2/dense_heads/
  bevformer_det_map_head_apollo_v2.py:17-761): one2one (50 vec) + one2many
  (300 vec) query split with a block-diagonal self-attention mask so the
  sets cannot interact (:180-186), one2many GT = GT repeated k times with
  λ-weighted loss (:188-217), auxiliary BEV-seg and PV-seg BCE heads
  (:234-414, :622-634)
- MapTRv2DecoupledDetrTransformerDecoderLayer (maptrv2/modules/decoder.py:
  11-220): 8-op layer (self_attn, norm, self_attn, norm, cross_attn, norm,
  ffn, norm) — the first self-attn mixes the P points within each vector,
  the second mixes vectors at the same point index (view/permute folding).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from apollo_vision_net_tpu.models.attention import (
    FFN,
    CustomMSDeformableAttention,
    MultiheadAttention,
)
from apollo_vision_net_tpu.models.heads.det_head import BEVFormerHead, ClsBranch
from apollo_vision_net_tpu.models.decoder import RegBranch
from apollo_vision_net_tpu.utils.box_coder import inverse_sigmoid

Shapes = Tuple[Tuple[int, int], ...]


class DecoupledMapDecoderLayer(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    num_points: int = 4
    feedforward_channels: int = 512
    dropout: float = 0.1
    num_pts_per_vec: int = 20
    msda_impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,            # (B, num_vec*P, C)
        memory: jnp.ndarray,
        *,
        query_pos: jnp.ndarray,
        reference_points: jnp.ndarray,  # (B, Q, 2)
        spatial_shapes: Shapes,
        vec_attn_mask: Optional[jnp.ndarray],  # (num_vec, num_vec) bool keep
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, Q, C = query.shape
        P = self.num_pts_per_vec
        NV = Q // P
        # 1) intra-vector self-attn: fold vectors into batch
        q = query.reshape(B * NV, P, C)
        qp = query_pos.reshape(B * NV, P, C)
        q = MultiheadAttention(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            dropout=self.dropout, name="self_attn_pts",
        )(q, query_pos=qp, deterministic=deterministic).reshape(B, Q, C)
        q = nn.LayerNorm(name="norm1")(q)
        # 2) inter-vector self-attn at the same point index: fold points
        qv = q.reshape(B, NV, P, C).transpose(0, 2, 1, 3).reshape(
            B * P, NV, C)
        qpv = query_pos.reshape(B, NV, P, C).transpose(0, 2, 1, 3).reshape(
            B * P, NV, C)
        mask = None
        if vec_attn_mask is not None:
            mask = vec_attn_mask[None, None]  # (1, 1, NV, NV)
        qv = MultiheadAttention(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            dropout=self.dropout, name="self_attn_vec",
        )(qv, query_pos=qpv, attn_mask=mask, deterministic=deterministic)
        q = qv.reshape(B, P, NV, C).transpose(0, 2, 1, 3).reshape(B, Q, C)
        q = nn.LayerNorm(name="norm2")(q)
        # 3) deformable cross-attn over BEV memory
        q = CustomMSDeformableAttention(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            num_levels=1, num_points=self.num_points, dropout=self.dropout,
            msda_impl=self.msda_impl, name="cross_attn",
        )(q, memory, query_pos=query_pos, reference_points=reference_points,
          spatial_shapes=spatial_shapes, deterministic=deterministic)
        q = nn.LayerNorm(name="norm3")(q)
        q = FFN(embed_dims=self.embed_dims,
                feedforward_channels=self.feedforward_channels,
                dropout=self.dropout, name="ffn")(
            q, deterministic=deterministic)
        q = nn.LayerNorm(name="norm4")(q)
        return q


class BEVSegHead(nn.Module):
    """Aux segmentation decode head (BEV or PV): Conv3×3 (embed→embed,
    no bias) → ReLU → Conv1×1 (embed→seg_classes) — exactly the
    reference's map_seg_head / map_pv_seg_head stacks
    (bevformer_det_map_head_apollo_v2.py:81-97). classes=1 squeezes the
    channel axis (the reference's default seg_classes)."""

    classes: int = 1
    hidden: int = 0  # 0 -> input embed dims (reference behavior)

    @nn.compact
    def __call__(self, grid: jnp.ndarray) -> jnp.ndarray:  # (B, H, W, C)
        hidden = self.hidden or grid.shape[-1]
        x = nn.Conv(hidden, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False)(grid)
        x = nn.relu(x)
        x = nn.Conv(self.classes, (1, 1))(x)
        return x[..., 0] if self.classes == 1 else x


class BEVFormerDetMapHeadV2(BEVFormerHead):
    """det + MapTRv2 map head."""

    num_vec_one2one: int = 50
    num_vec_one2many: int = 300
    map_num_pts: int = 20
    map_num_classes: int = 3
    map_decoder_layers: int = 6
    with_aux_seg: bool = True

    @property
    def num_vec_total(self) -> int:
        return self.num_vec_one2one + self.num_vec_one2many

    def setup(self):
        super().setup()
        NV, P, C = self.num_vec_total, self.map_num_pts, self.embed_dims
        self.map_instance_embedding = self.param(
            "map_instance_embedding", nn.initializers.uniform(1.0),
            (NV, 2 * C))
        self.map_pts_embedding = self.param(
            "map_pts_embedding", nn.initializers.uniform(1.0), (P, 2 * C))
        self.map_reference_points_fc = nn.Dense(2)
        self.map_layers = [
            DecoupledMapDecoderLayer(
                embed_dims=C, feedforward_channels=self.feedforward_channels,
                num_pts_per_vec=P, msda_impl=self.msda_impl,
                name=f"map_layer{i}",
            )
            for i in range(self.map_decoder_layers)
        ]
        self.map_cls_branches = [
            ClsBranch(C, self.map_num_classes, name=f"map_cls_branch{i}")
            for i in range(self.map_decoder_layers)
        ]
        self.map_reg_branches = [
            RegBranch(C, 2, name=f"map_reg_branch{i}")
            for i in range(self.map_decoder_layers)
        ]
        if self.with_aux_seg:
            self.bev_seg_head = BEVSegHead()
            self.pv_seg_head = BEVSegHead()

    def _vec_attn_mask(self, num_vec: int) -> jnp.ndarray:
        """Block-diagonal keep-mask: o2o and o2m query sets cannot attend
        across (v2 head :180-186)."""
        o1 = self.num_vec_one2one
        idx = jnp.arange(num_vec)
        is_o1 = idx < o1
        return (is_o1[:, None] == is_o1[None, :])

    def _map_branch(self, bev_embed, deterministic):
        B = bev_embed.shape[0]
        C = self.embed_dims
        P = self.map_num_pts
        NV = self.num_vec_total if not deterministic else self.num_vec_one2one
        q_embed = (
            self.map_instance_embedding[:NV, None, :]
            + self.map_pts_embedding[None, :, :]
        ).reshape(NV * P, 2 * C)
        query_pos, query = q_embed[:, :C], q_embed[:, C:]
        query_pos = jnp.broadcast_to(query_pos[None], (B,) + query_pos.shape)
        query = jnp.broadcast_to(query[None], (B,) + query.shape)
        ref = jax.nn.sigmoid(self.map_reference_points_fc(query_pos))
        vec_mask = self._vec_attn_mask(NV) if NV > self.num_vec_one2one else None

        all_cls, all_pts = [], []
        out = query
        for lid in range(self.map_decoder_layers):
            out = self.map_layers[lid](
                out, bev_embed,
                query_pos=query_pos,
                reference_points=ref,
                spatial_shapes=((self.bev_h, self.bev_w),),
                vec_attn_mask=vec_mask,
                deterministic=deterministic,
            )
            tmp = self.map_reg_branches[lid](out)
            pts01 = jax.nn.sigmoid(tmp[..., :2] + inverse_sigmoid(ref))
            ref = jax.lax.stop_gradient(pts01)
            feat_vec = out.reshape(B, NV, P, C).mean(axis=2)
            all_cls.append(self.map_cls_branches[lid](feat_vec))
            all_pts.append(pts01.reshape(B, NV, P, 2))
        return jnp.stack(all_cls), jnp.stack(all_pts)

    def __call__(self, mlvl_feats, *, can_bus, lidar2img, prev_bev, has_prev,
                 only_bev=False, deterministic=True):
        if only_bev:
            return super().__call__(
                mlvl_feats, can_bus=can_bus, lidar2img=lidar2img,
                prev_bev=prev_bev, has_prev=has_prev, only_bev=True,
                deterministic=deterministic)
        outs = super().__call__(
            mlvl_feats, can_bus=can_bus, lidar2img=lidar2img,
            prev_bev=prev_bev, has_prev=has_prev,
            deterministic=deterministic)
        map_cls, map_pts = self._map_branch(outs["bev_embed"], deterministic)
        outs["map_all_cls_scores"] = map_cls
        outs["map_all_pts_preds"] = map_pts
        if self.with_aux_seg:
            B = outs["bev_embed"].shape[0]
            grid = outs["bev_embed"].reshape(
                B, self.bev_h, self.bev_w, self.embed_dims)
            outs["bev_seg_logits"] = self.bev_seg_head(grid)
            # PV seg on the finest image feature level
            f = mlvl_feats[0]
            b, n, h, w, c = f.shape
            outs["pv_seg_logits"] = self.pv_seg_head(
                f.reshape(b * n, h, w, c)).reshape(b, n, h, w)
        return outs
