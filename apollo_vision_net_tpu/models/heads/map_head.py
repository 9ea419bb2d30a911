"""det+map multi-task head: MapTR point-query decoder on the shared BEV.

Parity (reference file:line):
- BEVFormerDetMapHeadApollo: bevformer/dense_heads/
  bevformer_det_map_head_apollo.py:64-1179 — det trunk is the inherited
  BEVFormerHead; map branch uses num_vec×num_pts point-level queries built
  as instance_embedding + pts_embedding (:711-714), learned 2D reference
  points (:188-190), a MapTR decoder with per-layer reg refinement
  (:740-750), per-layer outputs pts01 = sigmoid(Δ + inverse_sigmoid(ref))
  (:788-801) and vector cls from mean-pooled point features (:796-797).
- MapTRDecoder: maptr/modules/decoder.py:8-61 (2D ref refinement).

The reference's three-tier decoder fallback (:699-939) is not ported: it
exists to survive mmcv registry misconfiguration, which typed configs make
impossible.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from apollo_vision_net_tpu.models.decoder import DetectionTransformerDecoder
from apollo_vision_net_tpu.models.heads.det_head import (
    BEVFormerHead,
    ClsBranch,
)
from apollo_vision_net_tpu.utils.box_coder import inverse_sigmoid

Shapes = Tuple[Tuple[int, int], ...]


# MapTRDecoder is the scanned DetectionTransformerDecoder in map2d mode
# (2D reference refinement, reg branches inside the layer scan). The 2-wide
# regression head replaces the former MapRegBranch.


class BEVFormerDetMapHead(BEVFormerHead):
    """det + vectorized-map head (MapTR v1 protocol)."""

    num_map_vec: int = 50
    map_num_pts: int = 20
    map_num_classes: int = 3
    map_decoder_layers: int = 6

    @property
    def map_num_query(self) -> int:
        return self.num_map_vec * self.map_num_pts

    def setup(self):
        super().setup()
        self.map_instance_embedding = self.param(
            "map_instance_embedding", nn.initializers.uniform(1.0),
            (self.num_map_vec, self.embed_dims * 2),
        )
        self.map_pts_embedding = self.param(
            "map_pts_embedding", nn.initializers.uniform(1.0),
            (self.map_num_pts, self.embed_dims * 2),
        )
        self.map_reference_points_fc = nn.Dense(
            2, kernel_init=nn.initializers.variance_scaling(
                1.0, "fan_avg", "uniform"),
        )
        self.map_decoder = DetectionTransformerDecoder(
            num_layers=self.map_decoder_layers,
            embed_dims=self.embed_dims,
            feedforward_channels=self.feedforward_channels,
            msda_impl=self.msda_impl,
            dtype=(jnp.bfloat16 if self.transformer_dtype == "bfloat16"
                   else jnp.float32),
            code_size=2,
            ref_mode="map2d",
            name="map_decoder",
        )
        self.map_cls_branches = [
            ClsBranch(self.embed_dims, self.map_num_classes,
                      name=f"map_cls_branch{i}")
            for i in range(self.map_decoder_layers)
        ]

    def _map_branch(self, bev_embed: jnp.ndarray, deterministic: bool):
        B = bev_embed.shape[0]
        C = self.embed_dims
        # point-level queries: instance ⊕ pts embedding (reference :711-714)
        q_embed = (
            self.map_instance_embedding[:, None, :]
            + self.map_pts_embedding[None, :, :]
        ).reshape(self.map_num_query, 2 * C)
        query_pos, query = q_embed[:, :C], q_embed[:, C:]
        query_pos = jnp.broadcast_to(query_pos[None], (B,) + query_pos.shape)
        query = jnp.broadcast_to(query[None], (B,) + query.shape)
        init_ref = jax.nn.sigmoid(self.map_reference_points_fc(query_pos))

        states, refs, regs = self.map_decoder(
            query, bev_embed,
            query_pos=query_pos,
            reference_points=init_ref,
            spatial_shapes=((self.bev_h, self.bev_w),),
            deterministic=deterministic,
        )

        all_cls, all_pts = [], []
        for lvl in range(self.map_decoder_layers):
            ref = init_ref if lvl == 0 else refs[lvl - 1]
            tmp = regs[lvl]
            pts01 = jax.nn.sigmoid(tmp[..., :2] + inverse_sigmoid(ref))
            pts01 = pts01.reshape(B, self.num_map_vec, self.map_num_pts, 2)
            feat_vec = states[lvl].reshape(
                B, self.num_map_vec, self.map_num_pts, C
            ).mean(axis=2)
            all_cls.append(self.map_cls_branches[lvl](feat_vec))
            all_pts.append(pts01)
        return jnp.stack(all_cls), jnp.stack(all_pts)

    def map_pts_to_meters(self, pts01: jnp.ndarray) -> jnp.ndarray:
        pc = self.pc_range
        x = pts01[..., 0:1] * (pc[3] - pc[0]) + pc[0]
        y = pts01[..., 1:2] * (pc[4] - pc[1]) + pc[1]
        return jnp.concatenate([x, y], axis=-1)

    def __call__(
        self,
        mlvl_feats: Sequence[jnp.ndarray],
        *,
        can_bus: jnp.ndarray,
        lidar2img: jnp.ndarray,
        prev_bev: jnp.ndarray,
        has_prev: jnp.ndarray,
        only_bev: bool = False,
        deterministic: bool = True,
    ):
        if only_bev:
            return super().__call__(
                mlvl_feats, can_bus=can_bus, lidar2img=lidar2img,
                prev_bev=prev_bev, has_prev=has_prev, only_bev=True,
                deterministic=deterministic,
            )
        outs = super().__call__(
            mlvl_feats, can_bus=can_bus, lidar2img=lidar2img,
            prev_bev=prev_bev, has_prev=has_prev,
            deterministic=deterministic,
        )
        map_cls, map_pts = self._map_branch(outs["bev_embed"], deterministic)
        outs["map_all_cls_scores"] = map_cls      # (L, B, num_vec, 3)
        outs["map_all_pts_preds"] = map_pts       # (L, B, num_vec, P, 2) 0..1
        return outs


def get_map_results(
    map_cls_logits: jnp.ndarray,  # (B, num_vec, 3) last layer
    map_pts01: jnp.ndarray,       # (B, num_vec, P, 2)
    pc_range: Sequence[float],
):
    """Reference get_map_results (:970-1005): vectors in meters, per-vector
    score/label via sigmoid().max(-1). Returns all vectors; score thresholding
    happens in the evaluator (static shapes)."""
    scores_all = jax.nn.sigmoid(map_cls_logits)
    scores = scores_all.max(axis=-1)
    labels = scores_all.argmax(axis=-1)
    x = map_pts01[..., 0:1] * (pc_range[3] - pc_range[0]) + pc_range[0]
    y = map_pts01[..., 1:2] * (pc_range[4] - pc_range[1]) + pc_range[1]
    vectors = jnp.concatenate([x, y], axis=-1)
    return {"vectors": vectors, "scores": scores, "labels": labels}
