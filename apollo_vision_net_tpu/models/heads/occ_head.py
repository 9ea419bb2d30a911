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

Voxel layout contract: dense occupancy is ordered (z, x, y) flattened —
matching the reference's ``view(bs, occ_zdim, occ_xdim, occ_ydim)`` of the
sparse-scattered GT (occupancy_head_apollo.py:459-463).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from apollo_vision_net_tpu.models.heads.det_head import BEVFormerHead


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


class CNNUpsample(nn.Module):
    """Apollo upsample_layer: ConvT(s2)→norm→ReLU→1×1(→z·d)→norm→ReLU→
    ConvT(s2)→norm→ReLU (occupancy_head_apollo.py:57-67), NHWC."""

    embed_dims: int
    out_channels: int  # occ_zdim * occ_dims

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        x = nn.ConvTranspose(self.embed_dims, (3, 3), strides=(2, 2),
                             padding="SAME")(x)
        x = nn.GroupNorm(num_groups=32)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1))(x)
        x = nn.GroupNorm(num_groups=32)(x)
        x = nn.relu(x)
        x = nn.ConvTranspose(self.out_channels, (3, 3), strides=(2, 2),
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

    @property
    def voxel_num(self) -> int:
        return self.occ_zdim * self.occ_xdim * self.occ_ydim

    def setup(self):
        super().setup()
        if self.occ_head_type == "cnn":
            self.upsample_layer = CNNUpsample(
                embed_dims=self.embed_dims,
                out_channels=self.occ_zdim * self.occ_dims,
            )
        else:
            self.occ_proj = nn.Dense(self.occ_dims * self.occ_zdim)
        self.occ_branches = OccMLPBranch(
            self.occ_dims, self.occupancy_classes, self.num_occ_fcs
        )
        if self.predict_flow:
            self.flow_branches = OccMLPBranch(
                self.occ_dims, self.flow_dims, self.num_occ_fcs
            )

    def _occ_from_bev(self, bev_embed: jnp.ndarray) -> jnp.ndarray:
        """(B, bev_h*bev_w, C) -> (B, z*x*y, occ_dims), (z, x, y) order."""
        B = bev_embed.shape[0]
        if self.occ_head_type == "cnn":
            grid = bev_embed.reshape(B, self.bev_h, self.bev_w, self.embed_dims)
            up = self.upsample_layer(grid)  # (B, occ_x, occ_y, z*d)
            # channels (z*d) are (d, z) in the reference's torch layout
            # (view(bs, occ_dims, occ_zdim, x, y)); we define them as (z, d)
            up = up.reshape(B, self.occ_xdim, self.occ_ydim,
                            self.occ_zdim, self.occ_dims)
            up = up.transpose(0, 3, 1, 2, 4)  # (B, z, x, y, d)
            return up.reshape(B, self.voxel_num, self.occ_dims)
        # MLP lift: occ grid must equal the BEV grid
        assert (self.occ_xdim, self.occ_ydim) == (self.bev_h, self.bev_w)
        p = self.occ_proj(bev_embed)  # (B, xy, z*d)
        p = p.reshape(B, self.occ_xdim * self.occ_ydim,
                      self.occ_zdim, self.occ_dims)
        p = p.transpose(0, 2, 1, 3)  # (B, z, xy, d)
        return p.reshape(B, self.voxel_num, self.occ_dims)

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
        if prev_bevs is not None:
            # multi-frame occ supervision (reference keep_bev_history /
            # obtain_all_history_bev, detectors/bevformer.py:278-296):
            # every queue frame's BEV is lifted and supervised
            B, S1 = prev_bevs.shape[:2]
            seq = jnp.concatenate([prev_bevs, bev[:, None]], axis=1)
            bev = seq.reshape(B * (S1 + 1), *bev.shape[1:])
        occ_feat = self._occ_from_bev(bev)
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
