"""BEVFormerHead — DETR-style 3D detection head (NMS-free).

Parity: bevformer/dense_heads/bevformer_head.py:27-545 — learned BEV query
and object query embedding tables (:114-118), per-decoder-layer cls/reg
branches (box refinement ⇒ unshared clones, :96-116), forward decoding of
per-layer boxes into pc_range meters via ref-point unsigmoid/resigmoid
(:187-215), focal-prior bias init on the cls logits (:119-125).

Losses live in losses/det_loss.py; decoding in utils/box_coder.py.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from apollo_vision_net_tpu.models.pos_encoding import LearnedPositionalEncoding
from apollo_vision_net_tpu.models.transformer import PerceptionTransformer
from apollo_vision_net_tpu.utils import geometry
from apollo_vision_net_tpu.utils.box_coder import inverse_sigmoid

FOCAL_BIAS_INIT = float(-np.log((1 - 0.01) / 0.01))  # bias_init_with_prob(0.01)


class ClsBranch(nn.Module):
    embed_dims: int
    num_classes: int

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            x = nn.Dense(self.embed_dims)(x)
            x = nn.LayerNorm()(x)
            x = nn.relu(x)
        return nn.Dense(
            self.num_classes,
            bias_init=nn.initializers.constant(FOCAL_BIAS_INIT),
        )(x)


# RegBranch lives in models/decoder.py now: iterative refinement consumes
# the per-layer regression outputs inside the decoder's layer scan, so the
# branches' (unshared, stacked) params belong to the decoder.
from apollo_vision_net_tpu.models.decoder import RegBranch  # noqa: F401 (re-export)


class BEVFormerHead(nn.Module):
    bev_h: int = 50
    bev_w: int = 50
    num_query: int = 900
    num_classes: int = 10
    embed_dims: int = 256
    code_size: int = 10
    pc_range: Sequence[float] = (-50.0, -50.0, -5.0, 50.0, 50.0, 3.0)
    num_points_in_pillar: int = 4
    img_shape: Tuple[int, int] = (480, 800)  # (H, W) features were built at
    num_cams: int = 6
    num_feature_levels: int = 1
    encoder_layers: int = 3
    decoder_layers: int = 6
    feedforward_channels: int = 512
    rotate_prev_bev: bool = True
    use_shift: bool = True
    use_can_bus: bool = True
    shift_current_refs: bool = True
    attn_logits_clamp: Optional[float] = None
    msda_impl: str = "auto"
    # transformer-trunk activation dtype ("float32" | "bfloat16"); follows
    # the conv trunk's compute_dtype by default (see parallel/train.py)
    transformer_dtype: str = "float32"
    # Group-DETR (occupancy_head_apollo.py:40-49): num_query is the TOTAL
    # (per-group × group_detr); at inference only the first group is used.
    group_detr: int = 1
    # Optional BEV-grid activation sharding over the mesh's `sp` axis, e.g.
    # ("dp", "sp", None) for (batch, query, channel). Requires callers to run
    # under jax.sharding.set_mesh(mesh). XLA propagates the layout through
    # the encoder and inserts the halo/all-gather collectives.
    bev_partition: "tuple | None" = None

    @property
    def real_hw(self) -> Tuple[float, float]:
        return (
            self.pc_range[4] - self.pc_range[1],
            self.pc_range[3] - self.pc_range[0],
        )

    def setup(self):
        self.bev_embedding = self.param(
            "bev_embedding", nn.initializers.normal(1.0),
            (self.bev_h * self.bev_w, self.embed_dims),
        )
        self.query_embedding = self.param(
            "query_embedding", nn.initializers.uniform(1.0),
            (self.num_query, self.embed_dims * 2),
        )
        self.positional_encoding = LearnedPositionalEncoding(
            num_feats=self.embed_dims // 2,
            row_num_embed=self.bev_h,
            col_num_embed=self.bev_w,
        )
        tdt = (jnp.bfloat16 if self.transformer_dtype == "bfloat16"
               else jnp.float32)
        self.transformer = PerceptionTransformer(
            dtype=tdt,
            code_size=self.code_size,
            embed_dims=self.embed_dims,
            num_feature_levels=self.num_feature_levels,
            num_cams=self.num_cams,
            encoder_layers=self.encoder_layers,
            num_points_in_pillar=self.num_points_in_pillar,
            decoder_layers=self.decoder_layers,
            feedforward_channels=self.feedforward_channels,
            rotate_prev_bev=self.rotate_prev_bev,
            use_shift=self.use_shift,
            use_can_bus=self.use_can_bus,
            shift_current_refs=self.shift_current_refs,
            attn_logits_clamp=self.attn_logits_clamp,
            msda_impl=self.msda_impl,
            decoder_self_attn_groups=self.group_detr,
        )
        self.cls_branches = [
            ClsBranch(self.embed_dims, self.num_classes, name=f"cls_branch{i}")
            for i in range(self.decoder_layers)
        ]

    def _geometry(self, lidar2img: jnp.ndarray):
        """Static pillar refs + per-sample camera projection."""
        ref_3d = jnp.asarray(geometry.bev_reference_points_3d(
            self.bev_h, self.bev_w,
            self.pc_range[5] - self.pc_range[2],
            self.num_points_in_pillar,
        ))
        ref_2d = jnp.asarray(
            geometry.bev_reference_points_2d(self.bev_h, self.bev_w)
        )
        ref_cam, bev_mask = jax.vmap(
            lambda l2i: geometry.point_sampling(
                ref_3d, self.pc_range, l2i, self.img_shape)
        )(lidar2img)  # (B, cam, Q, D, 2), (B, cam, Q, D)
        # reference layout: (num_cam, B, Q, D, ...)
        return ref_2d, ref_cam.transpose(1, 0, 2, 3, 4), bev_mask.transpose(1, 0, 2, 3)

    def __call__(
        self,
        mlvl_feats: Sequence[jnp.ndarray],  # [(B, N, H, W, C)]
        *,
        can_bus: jnp.ndarray,               # (B, 18)
        lidar2img: jnp.ndarray,             # (B, N, 4, 4)
        prev_bev: jnp.ndarray,              # (B, bev_h*bev_w, C)
        has_prev: jnp.ndarray,              # (B,)
        only_bev: bool = False,
        deterministic: bool = True,
    ):
        grid_length = (
            self.real_hw[0] / self.bev_h,
            self.real_hw[1] / self.bev_w,
        )
        bev_pos = self.positional_encoding(self.bev_h, self.bev_w)
        ref_2d, ref_cam, bev_mask = self._geometry(lidar2img)

        if only_bev:
            return self.transformer.get_bev_features(
                mlvl_feats, self.bev_embedding,
                bev_h=self.bev_h, bev_w=self.bev_w,
                grid_length=grid_length, bev_pos=bev_pos,
                prev_bev=prev_bev, has_prev=has_prev, can_bus=can_bus,
                ref_2d=ref_2d, reference_points_cam=ref_cam,
                bev_mask=bev_mask, deterministic=deterministic,
            )

        # Group-DETR: inference uses only the first query group
        query_embedding = self.query_embedding
        if self.group_detr > 1 and deterministic:
            query_embedding = query_embedding[: self.num_query // self.group_detr]

        if self.bev_partition is not None:
            from jax.sharding import PartitionSpec

            prev_bev = jax.lax.with_sharding_constraint(
                prev_bev, PartitionSpec(*self.bev_partition))
        bev_embed, hs, init_ref, inter_refs, inter_regs = self.transformer(
            mlvl_feats, self.bev_embedding, query_embedding,
            bev_h=self.bev_h, bev_w=self.bev_w, grid_length=grid_length,
            bev_pos=bev_pos, prev_bev=prev_bev, has_prev=has_prev,
            can_bus=can_bus, ref_2d=ref_2d,
            reference_points_cam=ref_cam, bev_mask=bev_mask,
            deterministic=deterministic,
        )

        pc = np.asarray(self.pc_range, np.float32)
        cls_scores, bbox_preds = [], []
        for lvl in range(hs.shape[0]):
            ref = init_ref if lvl == 0 else inter_refs[lvl - 1]
            ref = inverse_sigmoid(ref)
            cls = self.cls_branches[lvl](hs[lvl])
            # the decoder already ran layer lvl's reg branch on hs[lvl]
            # (the reference recomputes it post-hoc — identical values)
            tmp = inter_regs[lvl]
            xy = jax.nn.sigmoid(tmp[..., 0:2] + ref[..., 0:2])
            z = jax.nn.sigmoid(tmp[..., 4:5] + ref[..., 2:3])
            x = xy[..., 0:1] * (pc[3] - pc[0]) + pc[0]
            y = xy[..., 1:2] * (pc[4] - pc[1]) + pc[1]
            z = z * (pc[5] - pc[2]) + pc[2]
            box = jnp.concatenate(
                [x, y, tmp[..., 2:4], z, tmp[..., 5:]], axis=-1
            )
            cls_scores.append(cls)
            bbox_preds.append(box)

        if self.bev_partition is not None:
            from jax.sharding import PartitionSpec

            bev_embed = jax.lax.with_sharding_constraint(
                bev_embed, PartitionSpec(*self.bev_partition))
        return {
            "bev_embed": bev_embed,
            "all_cls_scores": jnp.stack(cls_scores),
            "all_bbox_preds": jnp.stack(bbox_preds),
        }
