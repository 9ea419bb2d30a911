"""PerceptionTransformer: BEV feature pipeline + det decoder front-end.

Parity: bevformer/modules/transformer.py:24-401 — can_bus ego-motion shift,
prev_bev rotation by ego yaw delta, can_bus MLP embedding added to BEV
queries, camera/level embeds on flattened image features, encoder call;
decoder path splits the object query embedding into (pos, content), derives
3D reference points from the positional half, and runs the refinement
decoder over BEV memory.

The reference's NaN sanitizer scaffolding (nan_to_num guards, _finite_stats)
is not ported to the hot path — bf16/f32 on TPU with fp32 softmax does not
need it. The debug-mode equivalent lives in utils/debug.py: finite-stats
probes (enable via debug.enable_probes / capture_probes) are planted at the
backbone/neck/encoder boundaries, and debug.assert_all_finite gives the
checkify hard-stop.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from apollo_vision_net_tpu.models.decoder import DetectionTransformerDecoder
from apollo_vision_net_tpu.models.encoder import BEVFormerEncoder
from apollo_vision_net_tpu.ops.grid_sample import rotate_2d
from apollo_vision_net_tpu.utils import debug
from apollo_vision_net_tpu.utils.geometry import bev_shift_from_can_bus

Shapes = Tuple[Tuple[int, int], ...]


class PerceptionTransformer(nn.Module):
    embed_dims: int = 256
    num_feature_levels: int = 4
    num_cams: int = 6
    # encoder
    encoder_layers: int = 3
    num_points_in_pillar: int = 4
    num_points_sca: int = 8
    num_points_tsa: int = 4
    feedforward_channels: int = 512
    # decoder
    decoder_layers: int = 6
    num_points_decoder: int = 4
    decoder_self_attn_groups: int = 1  # Group-DETR
    code_size: int = 10
    # behaviour flags (transformer.py:52-58)
    rotate_prev_bev: bool = True
    use_shift: bool = True
    use_can_bus: bool = True
    can_bus_norm: bool = True
    use_cams_embeds: bool = True
    shift_current_refs: bool = True
    attn_logits_clamp: Optional[float] = None
    dropout: float = 0.1
    msda_impl: str = "auto"
    # activation dtype of the transformer trunk (params stay f32; softmax,
    # reference points and box/refinement arithmetic are pinned f32)
    dtype: object = jnp.float32

    def setup(self):
        self.level_embeds = self.param(
            "level_embeds", nn.initializers.normal(1.0),
            (self.num_feature_levels, self.embed_dims),
        )
        if self.use_cams_embeds:
            self.cams_embeds = self.param(
                "cams_embeds", nn.initializers.normal(1.0),
                (self.num_cams, self.embed_dims),
            )
        if self.use_can_bus:
            xavier = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")
            self.can_bus_fc1 = nn.Dense(self.embed_dims // 2, kernel_init=xavier)
            self.can_bus_fc2 = nn.Dense(self.embed_dims, kernel_init=xavier)
            if self.can_bus_norm:
                self.can_bus_ln = nn.LayerNorm()
        self.encoder = BEVFormerEncoder(
            num_layers=self.encoder_layers,
            embed_dims=self.embed_dims,
            num_levels=self.num_feature_levels,
            num_points_sca=self.num_points_sca,
            num_points_tsa=self.num_points_tsa,
            num_cams=self.num_cams,
            feedforward_channels=self.feedforward_channels,
            attn_logits_clamp=self.attn_logits_clamp,
            shift_current_refs=self.shift_current_refs,
            msda_impl=self.msda_impl,
            dtype=self.dtype,
        )
        self.decoder = DetectionTransformerDecoder(
            num_layers=self.decoder_layers,
            embed_dims=self.embed_dims,
            num_points=self.num_points_decoder,
            feedforward_channels=self.feedforward_channels,
            dropout=self.dropout,
            msda_impl=self.msda_impl,
            self_attn_groups=self.decoder_self_attn_groups,
            dtype=self.dtype,
            code_size=self.code_size,
            ref_mode="det3d",
        )
        self.reference_points_fc = nn.Dense(
            3, kernel_init=nn.initializers.variance_scaling(
                1.0, "fan_avg", "uniform"),
        )

    def _flatten_img_feats(
        self, mlvl_feats: Sequence[jnp.ndarray]
    ) -> Tuple[jnp.ndarray, Shapes]:
        """(B, N, H, W, C) per level -> (B, N, sum(HW), C) + static shapes,
        with camera and level embeddings added (transformer.py:231-254)."""
        flat = []
        shapes = []
        for lvl, feat in enumerate(mlvl_feats):
            B, N, H, W, C = feat.shape
            f = feat.reshape(B, N, H * W, C)
            if self.use_cams_embeds:
                f = f + self.cams_embeds[None, :, None, :].astype(f.dtype)
            f = f + self.level_embeds[None, None, None, lvl].astype(f.dtype)
            flat.append(f)
            shapes.append((H, W))
        return jnp.concatenate(flat, axis=2), tuple(shapes)

    def get_bev_features(
        self,
        mlvl_feats: Sequence[jnp.ndarray],   # [(B, N, H, W, C)]
        bev_queries: jnp.ndarray,            # (Q, C)
        *,
        bev_h: int,
        bev_w: int,
        grid_length: Tuple[float, float],
        bev_pos: jnp.ndarray,                # (Q, C)
        prev_bev: jnp.ndarray,               # (B, Q, C)
        has_prev: jnp.ndarray,               # (B,)
        can_bus: jnp.ndarray,                # (B, 18)
        ref_2d: jnp.ndarray,                 # (Q, 2)
        reference_points_cam: jnp.ndarray,
        bev_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B = mlvl_feats[0].shape[0]
        Q, C = bev_queries.shape
        queries = jnp.broadcast_to(bev_queries[None], (B, Q, C))

        shift = jax.vmap(
            lambda cb: bev_shift_from_can_bus(
                cb, grid_length, bev_h, bev_w, self.use_shift)
        )(can_bus)  # (B, 2)

        if self.rotate_prev_bev:
            # can_bus[-1] = ego yaw delta in degrees (dataset contract,
            # detectors/bevformer.py:393-401); zeroed when has_prev=0.
            angles = can_bus[:, -1] * has_prev
            prev_grid = prev_bev.reshape(B, bev_h, bev_w, C)
            prev_grid = jax.vmap(rotate_2d)(prev_grid, angles)
            prev_bev = prev_grid.reshape(B, Q, C)

        if self.use_can_bus:
            cb = nn.relu(self.can_bus_fc1(can_bus))
            cb = nn.relu(self.can_bus_fc2(cb))
            if self.can_bus_norm:
                cb = self.can_bus_ln(cb)
            queries = queries + cb[:, None, :]

        img_value, img_shapes = self._flatten_img_feats(mlvl_feats)

        # debug_nan probe at the encoder boundary (reference
        # transformer.py:134-149); identity unless debug.enable_probes().
        # bev_embed leaves the trunk in f32: it is the temporal carry
        # (prev_bev) and the multi-head shared memory — the bf16 interior
        # never accumulates across frames.
        return debug.probe("encoder.bev_embed", self.encoder(
            queries, img_value,
            bev_pos=jnp.broadcast_to(bev_pos[None], (B, Q, C)),
            prev_bev=prev_bev,
            has_prev=has_prev,
            shift=shift,
            ref_2d=ref_2d,
            bev_h=bev_h,
            bev_w=bev_w,
            img_spatial_shapes=img_shapes,
            reference_points_cam=reference_points_cam,
            bev_mask=bev_mask,
            deterministic=deterministic,
        ).astype(jnp.float32))

    def __call__(
        self,
        mlvl_feats,
        bev_queries,
        object_query_embed,    # (num_query, 2C)
        *,
        bev_h: int,
        bev_w: int,
        grid_length,
        bev_pos,
        prev_bev,
        has_prev,
        can_bus,
        ref_2d,
        reference_points_cam,
        bev_mask,
        deterministic: bool = True,
    ):
        bev_embed = self.get_bev_features(
            mlvl_feats, bev_queries,
            bev_h=bev_h, bev_w=bev_w, grid_length=grid_length,
            bev_pos=bev_pos, prev_bev=prev_bev, has_prev=has_prev,
            can_bus=can_bus, ref_2d=ref_2d,
            reference_points_cam=reference_points_cam, bev_mask=bev_mask,
            deterministic=deterministic,
        )
        B = bev_embed.shape[0]
        C = self.embed_dims
        query_pos, query = (
            object_query_embed[:, :C], object_query_embed[:, C:]
        )
        query_pos = jnp.broadcast_to(query_pos[None], (B,) + query_pos.shape)
        query = jnp.broadcast_to(query[None], (B,) + query.shape)
        reference_points = jax.nn.sigmoid(self.reference_points_fc(query_pos))
        init_reference = reference_points

        inter_states, inter_references, inter_regs = self.decoder(
            query, bev_embed,
            query_pos=query_pos,
            reference_points=reference_points,
            spatial_shapes=((bev_h, bev_w),),
            deterministic=deterministic,
        )
        return (bev_embed, inter_states, init_reference, inter_references,
                inter_regs)
