"""Occupancy heads: det+occ multi-task (BEVFormerOccupancyHead family).

Parity (reference file:line):
- BEVFormerOccupancyHead (MLP lift: occ_proj Linear(C → occ_dims·z) per BEV
  token, occ_branches MLP per voxel): bevformer_occupancy_head.py:182-216
- BEVFormerOccupancyHeadApollo (Group-DETR det + CNN upsample 50→200 BEV
  then z·occ_dims channels): bevformer_occupancy_head_apollo.py:36-160
- occupancy supervised only at the last decoder layer (:610-613); group-wise
  Hungarian det loss handled in losses/det_loss.py via the group axis

TPU-first deviations (DEVIATIONS.md): the CNN upsample path uses GroupNorm
instead of BatchNorm2d (state-free under jit; batch-size independent).

Voxel layout contract: dense occupancy is flat (z, y, x) with x MINOR —
bev rows are world-y (utils/geometry.py ref points), so the head's
(z, bev_row, bev_col) output order equals the reference GT's
``vox = x + y*xdim + z*xdim*ydim`` (convert_lidar_pcd_to_occ.py:122).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from apollo_vision_net_tpu.models.encoder import BEVFormerLayer
from apollo_vision_net_tpu.models.heads.det_head import BEVFormerHead
from apollo_vision_net_tpu.utils import geometry


class OccMLPBranch(nn.Module):
    occ_dims: int
    out_dims: int
    num_fcs: int = 2

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_fcs):
            x = nn.Dense(self.occ_dims)(x)
            x = nn.LayerNorm()(x)
            x = nn.relu(x)
        return nn.Dense(self.out_dims)(x)


class FlowFuseMLP(nn.Module):
    """Reference flow_fc: (Linear → LN → ReLU) × num_fcs, occ_dims→occ_dims
    (bevformer_occupancy_head.py:222-227; no final projection)."""

    occ_dims: int
    num_fcs: int = 2

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_fcs):
            x = nn.Dense(self.occ_dims)(x)
            x = nn.LayerNorm()(x)
            x = nn.relu(x)
        return x


class CNNUpsample(nn.Module):
    """Apollo upsample_layer: ConvT(s2)→norm→ReLU→1×1(→z·d)→norm→ReLU→
    ConvT(s2)→norm→ReLU (occupancy_head_apollo.py:57-67), NHWC."""

    embed_dims: int
    out_channels: int  # occ_zdim * occ_dims
    # total spatial upsampling (reference is hardwired ×4 for 50→200;
    # other grids, e.g. SemanticKITTI 128→256, need ×2 or ×1)
    upsample_factor: int = 4

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        assert self.upsample_factor in (1, 2, 4), self.upsample_factor
        s1 = (2, 2) if self.upsample_factor >= 2 else (1, 1)
        s2 = (2, 2) if self.upsample_factor >= 4 else (1, 1)
        x = nn.ConvTranspose(self.embed_dims, (3, 3), strides=s1,
                             padding="SAME")(x)
        x = nn.GroupNorm(num_groups=32)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1))(x)
        x = nn.GroupNorm(num_groups=32)(x)
        x = nn.relu(x)
        x = nn.ConvTranspose(self.out_channels, (3, 3), strides=s2,
                             padding="SAME")(x)
        x = nn.GroupNorm(num_groups=32)(x)
        x = nn.relu(x)
        return x


class BEVFormerOccupancyHead(BEVFormerHead):
    """det+occ head. `occ_head_type`:
    - 'mlp': per-BEV-token pillar lift (base head), occ grid == bev grid
    - 'cnn': Apollo CNN upsample bev_h×bev_w → occ_xdim×occ_ydim
    """

    occupancy_classes: int = 16
    occ_xdim: int = 200
    occ_ydim: int = 200
    occ_zdim: int = 16
    occ_dims: int = 128
    num_occ_fcs: int = 2
    occ_head_type: str = "cnn"
    predict_flow: bool = False
    flow_dims: int = 2
    # optional second deformable (image cross-attention) pass at occupancy
    # resolution (reference occ_tsa, occupancy_head_apollo.py:68-144)
    occ_tsa: bool = False
    occ_tsa_layers: int = 1
    # learned fwd/bwd occupancy-flow warping across the temporal queue
    # (reference with_occupancy_flow + occupancy_aggregation,
    # bevformer_occupancy_head.py:218-227, :253-301)
    with_occupancy_flow: bool = False

    @property
    def voxel_num(self) -> int:
        return self.occ_zdim * self.occ_xdim * self.occ_ydim

    def setup(self):
        super().setup()
        if self.occ_head_type == "cnn":
            assert self.occ_xdim % self.bev_h == 0, (self.occ_xdim, self.bev_h)
            self.upsample_layer = CNNUpsample(
                embed_dims=self.embed_dims,
                out_channels=(
                    self.embed_dims if self.occ_tsa
                    else self.occ_zdim * self.occ_dims
                ),
                upsample_factor=self.occ_ydim // self.bev_h,
            )
            if self.occ_tsa:
                self.occ_tsa_blocks = [
                    BEVFormerLayer(
                        embed_dims=self.embed_dims,
                        num_levels=self.num_feature_levels,
                        num_cams=self.num_cams,
                        feedforward_channels=self.feedforward_channels,
                        msda_impl=self.msda_impl,
                        bev_hw=(self.occ_ydim, self.occ_xdim),
                        name=f"occ_tsa_layer{i}",
                    )
                    for i in range(self.occ_tsa_layers)
                ]
                self.occ_tsa_head = nn.Dense(
                    self.occ_zdim * self.occ_dims, name="occ_tsa_head")
        else:
            self.occ_proj = nn.Dense(self.occ_dims * self.occ_zdim)
        self.occ_branches = OccMLPBranch(
            self.occ_dims, self.occupancy_classes, self.num_occ_fcs
        )
        if self.predict_flow:
            self.flow_branches = OccMLPBranch(
                self.occ_dims, self.flow_dims, self.num_occ_fcs
            )
        if self.with_occupancy_flow:
            # Linear(d → 3) voxel flows + fuse MLP (reference :218-227)
            self.forward_flow = nn.Dense(3, name="forward_flow")
            self.backward_flow = nn.Dense(3, name="backward_flow")
            self.flow_fc = FlowFuseMLP(self.occ_dims, self.num_occ_fcs)

    def _occ_from_bev(self, bev_embed: jnp.ndarray, mlvl_feats=None,
                      lidar2img=None, deterministic=True) -> jnp.ndarray:
        """(B, bev_h*bev_w, C) -> (B, z*y*x, occ_dims), (z, y, x) order
        (bev rows = world-y, so upsampled rows = occ y)."""
        B = bev_embed.shape[0]
        if self.occ_head_type == "cnn":
            grid = bev_embed.reshape(B, self.bev_h, self.bev_w, self.embed_dims)
            up = self.upsample_layer(grid)  # (B, occ_y, occ_x, z*d | C)
            if self.occ_tsa:
                up = self._occ_tsa_pass(up, mlvl_feats, lidar2img,
                                        deterministic)
            # channels (z*d) are (d, z) in the reference's torch layout
            # (view(bs, occ_dims, occ_zdim, y, x)); we define them as (z, d)
            up = up.reshape(B, self.occ_ydim, self.occ_xdim,
                            self.occ_zdim, self.occ_dims)
            up = up.transpose(0, 3, 1, 2, 4)  # (B, z, y, x, d)
            return up.reshape(B, self.voxel_num, self.occ_dims)
        # MLP lift: occ grid must equal the BEV grid
        assert (self.occ_xdim, self.occ_ydim) == (self.bev_h, self.bev_w)
        p = self.occ_proj(bev_embed)  # (B, xy, z*d)
        p = p.reshape(B, self.occ_xdim * self.occ_ydim,
                      self.occ_zdim, self.occ_dims)
        p = p.transpose(0, 2, 1, 3)  # (B, z, xy, d)
        return p.reshape(B, self.voxel_num, self.occ_dims)

    def _occ_tsa_pass(self, up, mlvl_feats, lidar2img, deterministic):
        """Deformable refinement at occ resolution: upsampled BEV tokens
        attend to the image features once more (occupancy_head_apollo.py
        upsample_tsa_occ, :114-144; prev/shift are zeroed there)."""
        B, ox, oy, C = up.shape
        Q = ox * oy
        q = up.reshape(B, Q, C)
        ref_3d = jnp.asarray(geometry.bev_reference_points_3d(
            ox, oy, self.pc_range[5] - self.pc_range[2],
            self.num_points_in_pillar))
        ref_cam, bev_mask = jax.vmap(
            lambda l2i: geometry.point_sampling(
                ref_3d, self.pc_range, l2i, self.img_shape)
        )(lidar2img)
        ref_cam = ref_cam.transpose(1, 0, 2, 3, 4)
        bev_mask = bev_mask.transpose(1, 0, 2, 3)
        ref_2d = jnp.asarray(geometry.bev_reference_points_2d(ox, oy))
        img_value, img_shapes = [], []
        for feat in mlvl_feats:
            b, n, h, w, c = feat.shape
            img_value.append(feat.reshape(b, n, h * w, c))
            img_shapes.append((h, w))
        img_value = jnp.concatenate(img_value, axis=2)
        tsa_refs = jnp.stack(
            [jnp.broadcast_to(ref_2d[None], (B, Q, 2))] * 2, 1
        )[:, :, :, None, :]
        for blk in self.occ_tsa_blocks:
            q = blk(
                q, img_value,
                bev_pos=jnp.zeros_like(q),
                tsa_value=jnp.stack([q, q], axis=1),
                tsa_refs=tsa_refs,
                bev_spatial_shapes=((ox, oy),),
                img_spatial_shapes=tuple(img_shapes),
                reference_points_cam=ref_cam,
                bev_mask=bev_mask,
                deterministic=deterministic,
            )
        return self.occ_tsa_head(q).reshape(
            B, ox, oy, self.occ_zdim * self.occ_dims)

    def occupancy_aggregation(
        self,
        occ_feat: jnp.ndarray,     # (B*S, voxel_num, occ_dims)
        batch: int,
        seq_len: int,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Learned fwd/bwd occupancy-flow warping across the queue
        (reference occupancy_aggregation, bevformer_occupancy_head.py:
        253-301): each frame's voxel features predict a 3D flow field,
        the neighbour frame's volume is trilinearly warped along it,
        blended with a random weight (midpoint when deterministic — the
        reference keeps torch.rand even at eval), and fused by flow_fc.
        The backward pass reads the original volumes and the forward pass
        reads the backward-updated ones, exactly as the reference's two
        loops do — so each pass is batched over the seq axis here instead
        of a python loop."""
        from apollo_vision_net_tpu.ops.grid_sample import grid_sample_3d

        B, S = batch, seq_len
        zz, yy, xx = self.occ_zdim, self.occ_ydim, self.occ_xdim
        d = occ_feat.shape[-1]
        vol = occ_feat.reshape(B, S, zz, yy, xx, d)  # flat (z, y, x)

        # voxel-center reference positions in [0, 1] (encoder
        # get_reference_points convention); grid last dim = (x→W minor
        # axis, y→H middle axis, z→D) per grid_sample_3d, so the vol's
        # (z, y, x) axes pair with coords (x, y, z) reversed
        ref = jnp.stack(jnp.meshgrid(
            (jnp.arange(zz) + 0.5) / zz,
            (jnp.arange(yy) + 0.5) / yy,
            (jnp.arange(xx) + 0.5) / xx,
            indexing="ij",
        ), axis=-1)[..., ::-1]  # (z, y, x, 3) as (x, y, z) coords

        def mix_weight(name):
            if deterministic:
                return jnp.float32(0.5)
            return jax.random.uniform(self.make_rng(name), ())

        def warp(src, flows):
            grid = (ref[None, None] + flows) * 2.0 - 1.0
            # optimization_barrier: without it the TPU fusion emitter fuses
            # the warp gather with surrounding reduce-windows and trips
            # `window_bounds == strides` check-fails at batch >= 2
            # (libtpu Jan-2026, reproduced via tools/train.py on
            # bev_smoke_det_occ_flow); the barrier keeps the gather alone.
            src, grid = jax.lax.optimization_barrier((src, grid))
            return jax.vmap(jax.vmap(grid_sample_3d))(src, grid)

        # backward: frame i pulls from frame i-1 (i >= 1)
        w = mix_weight("flow_mix")
        warped = warp(vol[:, :-1], self.backward_flow(vol[:, 1:]))
        mixed = self.flow_fc(vol[:, 1:] * (1.0 - w) + warped * w)
        vol = jnp.concatenate([vol[:, :1], mixed], axis=1)
        # forward: frame i pulls from (backward-updated) frame i+1
        w = mix_weight("flow_mix")
        warped = warp(vol[:, 1:], self.forward_flow(vol[:, :-1]))
        mixed = self.flow_fc(vol[:, :-1] * (1.0 - w) + warped * w)
        vol = jnp.concatenate([mixed, vol[:, -1:]], axis=1)
        return vol.reshape(B * S, self.voxel_num, d)

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
        prev_bevs: "jnp.ndarray | None" = None,  # (B, S-1, Q, C) history
    ):
        if only_bev:
            return super().__call__(
                mlvl_feats, can_bus=can_bus, lidar2img=lidar2img,
                prev_bev=prev_bev, has_prev=has_prev, only_bev=True,
                deterministic=deterministic,
            )
        outs = super().__call__(
            mlvl_feats, can_bus=can_bus, lidar2img=lidar2img,
            prev_bev=prev_bev, has_prev=has_prev, only_bev=False,
            deterministic=deterministic,
        )
        bev = outs["bev_embed"]
        seq_len = 1
        if prev_bevs is not None:
            assert not self.occ_tsa, (
                "occ_tsa and keep_bev_history are mutually exclusive "
                "(the refinement pass attends to current-frame images)")
            # multi-frame occ supervision (reference keep_bev_history /
            # obtain_all_history_bev, detectors/bevformer.py:278-296):
            # every queue frame's BEV is lifted and supervised
            B, S1 = prev_bevs.shape[:2]
            seq_len = S1 + 1
            seq = jnp.concatenate([prev_bevs, bev[:, None]], axis=1)
            bev = seq.reshape(B * seq_len, *bev.shape[1:])
        occ_feat = self._occ_from_bev(bev, mlvl_feats, lidar2img,
                                      deterministic)
        if self.with_occupancy_flow and seq_len > 1:
            occ_feat = self.occupancy_aggregation(
                occ_feat, bev.shape[0] // seq_len, seq_len,
                deterministic=deterministic)
        outs["occupancy_preds"] = self.occ_branches(occ_feat)
        outs["flow_preds"] = (
            self.flow_branches(occ_feat) if self.predict_flow else None
        )
        return outs


def occupancy_prediction(
    occupancy_preds: jnp.ndarray,   # (B, voxel_num, classes)
    occ_loss_type: str = "focal_loss",
    occ_threshold: float = 0.25,
) -> jnp.ndarray:
    """Per-voxel class decision (reference get_occupancy_prediction,
    occupancy_head.py:1037-1073). Static-shape: returns a dense (B,
    voxel_num) class grid where `classes` (or classes-1 for CE) means empty;
    the sparse [index, class] packing happens host-side."""
    C = occupancy_preds.shape[-1]
    if occ_loss_type == "focal_loss":
        p = jax.nn.sigmoid(occupancy_preds)
        thresh = jnp.full(p.shape[:-1] + (1,), occ_threshold, p.dtype)
        return jnp.argmax(jnp.concatenate([p, thresh], axis=-1), axis=-1)
    return jnp.argmax(occupancy_preds, axis=-1)
