"""VoxelFormer family: 3D voxel-query encoder, transformer and det+occ head.

Parity (reference file:line):
- voxel reference points (centers + jittered in-voxel points):
  bevformer/modules/voxel_encoder.py:47-146
- VoxelTemporalSelfAttention (3D trilinear deformable over the voxel grid,
  2-slot queue): modules/voxel_temporal_self_attention.py:24-330
- VoxelFormerEncoder/Layer (TSA→norm→SCA→norm→ffn→norm over z·h·w voxel
  tokens; shift alias bug shared with the BEV encoder):
  modules/voxel_encoder.py:25-468
- VoxelLearnedPositionalEncoding (row/col/z embeddings):
  modules/voxel_positional_embedding.py:11-60
- VoxelPerceptionTransformer with `decoder_on_bev`: voxel2bev MLP collapses
  z for the det decoder (modules/voxel_transformer.py:24-349)
- VoxelFormerOccupancyHead (det+occ over voxel tokens):
  dense_heads/voxelformer_occupancy_head.py:33-1303
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from apollo_vision_net_tpu.models.attention import (
    FFN,
    SpatialCrossAttention,
    _xavier_uniform,
    grid_offset_bias,
)
from apollo_vision_net_tpu.models.decoder import DetectionTransformerDecoder
from apollo_vision_net_tpu.models.heads.det_head import (
    BEVFormerHead,
    ClsBranch,
)
from apollo_vision_net_tpu.models.heads.occ_head import OccMLPBranch
from apollo_vision_net_tpu.ops.grid_sample import rotate_2d
from apollo_vision_net_tpu.ops.msda3d import ms_deform_attn_3d
from apollo_vision_net_tpu.utils import geometry
from apollo_vision_net_tpu.utils.box_coder import inverse_sigmoid
from apollo_vision_net_tpu.utils.geometry import bev_shift_from_can_bus


def voxel_reference_points_3d(
    bev_z: int, bev_h: int, bev_w: int, num_points_in_voxel: int = 1
) -> np.ndarray:
    """(num_points_in_voxel, z·h·w, 3) normalized (x, y, z) sample points
    per voxel (voxel_encoder.py:60-91)."""
    zs = (np.arange(bev_z) + 0.5) / bev_z
    ys = (np.arange(bev_h) + 0.5) / bev_h
    xs = (np.arange(bev_w) + 0.5) / bev_w
    zz, yy, xx = np.meshgrid(zs, ys, xs, indexing="ij")
    centers = np.stack([xx, yy, zz], -1).reshape(1, -1, 3)
    if num_points_in_voxel <= 1:
        return centers.astype(np.float32)
    n = num_points_in_voxel
    dz, dy, dx = 0.5 / bev_z, 0.5 / bev_h, 0.5 / bev_w
    off = np.stack([
        np.linspace(-dx, dx, n + 2)[1:-1],
        np.linspace(-dy, dy, n + 2)[1:-1],
        np.linspace(-dz, dz, n + 2)[1:-1],
    ], -1).reshape(n, 1, 3)
    return (centers + off).astype(np.float32)


class VoxelTemporalSelfAttention(nn.Module):
    """3D trilinear deformable self-attention over the 2-slot voxel queue."""

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,          # (B, Q, C) with Q = z·h·w
        value: jnp.ndarray,          # (B, 2, Q, C)
        *,
        query_pos: Optional[jnp.ndarray],
        reference_points: jnp.ndarray,  # (B, 2, Q, L, 3)
        spatial_shape: Tuple[int, int, int],  # (z, h, w)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, Q, C = query.shape
        H, L, P, NQ = self.num_heads, self.num_levels, self.num_points, 2
        identity = query
        if query_pos is not None:
            query = query + query_pos
        q_in = jnp.concatenate([value[:, 0], query], axis=-1)

        v = nn.Dense(C, kernel_init=_xavier_uniform(), name="value_proj")(
            value.reshape(B * NQ, Q, C))
        v = v.reshape(B * NQ, Q, H, C // H)

        grid2d = grid_offset_bias(H, L * NQ, P).reshape(H, L * NQ, P, 2)
        bias3d = np.concatenate(
            [grid2d, np.zeros((H, L * NQ, P, 1), np.float32)], -1
        ).reshape(-1)
        offsets = nn.Dense(
            NQ * H * L * P * 3,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *_: jnp.asarray(bias3d),
            name="sampling_offsets",
        )(q_in).reshape(B, Q, H, NQ, L, P, 3)
        attn = nn.Dense(
            NQ * H * L * P,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(q_in).reshape(B, Q, H, NQ, L * P)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1)
        attn = attn.reshape(B, Q, H, NQ, L, P)

        offsets = offsets.transpose(0, 3, 1, 2, 4, 5, 6).reshape(
            B * NQ, Q, H, L, P, 3)
        attn = attn.transpose(0, 3, 1, 2, 4, 5).reshape(B * NQ, Q, H, L, P)
        d, h, w = spatial_shape
        normalizer = np.array([[w, h, d]], np.float32)  # (L, 3) (x,y,z)
        ref = reference_points.reshape(B * NQ, Q, L, 3)
        locations = (
            ref[:, :, None, :, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )
        out = ms_deform_attn_3d(v, (spatial_shape,), locations, attn)
        out = out.reshape(B, NQ, Q, C).mean(axis=1)
        out = nn.Dense(C, kernel_init=_xavier_uniform(), name="output_proj")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out + identity


class VoxelFormerLayer(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points_sca: int = 8
    num_points_tsa: int = 4
    num_cams: int = 6
    feedforward_channels: int = 512
    msda_impl: str = "auto"

    @nn.compact
    def __call__(self, q, img_value, *, query_pos, tsa_value, tsa_refs,
                 spatial_shape, img_spatial_shapes, reference_points_cam,
                 bev_mask, deterministic=True):
        q = VoxelTemporalSelfAttention(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            num_points=self.num_points_tsa, name="tsa",
        )(q, tsa_value, query_pos=query_pos, reference_points=tsa_refs,
          spatial_shape=spatial_shape, deterministic=deterministic)
        q = nn.LayerNorm(name="norm1")(q)
        q = SpatialCrossAttention(
            embed_dims=self.embed_dims, num_cams=self.num_cams,
            num_heads=self.num_heads, num_levels=self.num_levels,
            num_points=self.num_points_sca, msda_impl=self.msda_impl,
            name="sca",
        )(q, img_value, query_pos=None,
          reference_points_cam=reference_points_cam, bev_mask=bev_mask,
          spatial_shapes=img_spatial_shapes, deterministic=deterministic)
        q = nn.LayerNorm(name="norm2")(q)
        q = FFN(embed_dims=self.embed_dims,
                feedforward_channels=self.feedforward_channels,
                name="ffn")(q, deterministic=deterministic)
        q = nn.LayerNorm(name="norm3")(q)
        return q


class VoxelLearnedPositionalEncoding(nn.Module):
    """Row/col/z learned embedding (voxel_positional_embedding.py:11-60)."""

    num_feats: Tuple[int, int, int]  # summing to embed_dims
    z_num: int
    row_num: int
    col_num: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        fz, fr, fc = self.num_feats
        z = self.param("z_embed", nn.initializers.uniform(1.0),
                       (self.z_num, fz))
        r = self.param("row_embed", nn.initializers.uniform(1.0),
                       (self.row_num, fr))
        c = self.param("col_embed", nn.initializers.uniform(1.0),
                       (self.col_num, fc))
        Z, H, W = self.z_num, self.row_num, self.col_num
        pos = jnp.concatenate([
            jnp.broadcast_to(c[None, None, :, :], (Z, H, W, fc)),
            jnp.broadcast_to(r[None, :, None, :], (Z, H, W, fr)),
            jnp.broadcast_to(z[:, None, None, :], (Z, H, W, fz)),
        ], -1)
        return pos.reshape(Z * H * W, fz + fr + fc)


class VoxelFormerOccupancyHead(BEVFormerHead):
    """det+occ over voxel queries (bev_z × bev_h × bev_w).

    The det decoder runs on a BEV memory obtained by collapsing z with the
    voxel2bev MLP (voxel_transformer.py `decoder_on_bev`). Occupancy is an
    MLP over (optionally trilinearly-upsampled) voxel embeddings.
    """

    bev_z: int = 4
    num_points_in_voxel: int = 1
    occupancy_classes: int = 16
    occ_xdim: int = 200
    occ_ydim: int = 200
    occ_zdim: int = 16
    occ_dims: int = 64
    num_occ_fcs: int = 2

    @property
    def voxel_num(self) -> int:
        return self.occ_zdim * self.occ_xdim * self.occ_ydim

    def setup(self):
        # intentionally does NOT call super().setup(): the voxel trunk
        # replaces the BEV encoder/transformer wholesale
        self.voxel_pos = VoxelLearnedPositionalEncoding(
            num_feats=(
                self.embed_dims - 2 * (self.embed_dims // 3),
                self.embed_dims // 3,
                self.embed_dims // 3,
            ),
            z_num=self.bev_z, row_num=self.bev_h, col_num=self.bev_w,
        )
        self.voxel_embedding = self.param(
            "voxel_embedding", nn.initializers.normal(1.0),
            (self.bev_z * self.bev_h * self.bev_w, self.embed_dims),
        )
        self.query_embedding = self.param(
            "query_embedding", nn.initializers.uniform(1.0),
            (self.num_query, self.embed_dims * 2),
        )
        self.layers = [
            VoxelFormerLayer(
                embed_dims=self.embed_dims,
                num_levels=self.num_feature_levels,
                num_cams=self.num_cams,
                feedforward_channels=self.feedforward_channels,
                msda_impl=self.msda_impl,
                name=f"encoder_layer{i}",
            )
            for i in range(self.encoder_layers)
        ]
        self.voxel2bev = nn.Dense(self.embed_dims, name="voxel2bev")
        self.decoder = DetectionTransformerDecoder(
            num_layers=self.decoder_layers,
            embed_dims=self.embed_dims,
            feedforward_channels=self.feedforward_channels,
            msda_impl=self.msda_impl,
            code_size=self.code_size,
        )
        self.reference_points_fc = nn.Dense(3)
        self.cls_branches = [
            ClsBranch(self.embed_dims, self.num_classes, name=f"cls_branch{i}")
            for i in range(self.decoder_layers)
        ]

        self.occ_branches = OccMLPBranch(
            self.occ_dims, self.occupancy_classes, self.num_occ_fcs)
        self.occ_proj = nn.Dense(self.occ_dims, name="occ_proj")
        if self.use_can_bus:
            self.can_bus_fc1 = nn.Dense(self.embed_dims // 2)
            self.can_bus_fc2 = nn.Dense(self.embed_dims)
            self.can_bus_ln = nn.LayerNorm()

    def _encode(self, mlvl_feats, can_bus, lidar2img, prev_bev, has_prev,
                deterministic):
        B = mlvl_feats[0].shape[0]
        Z, Hh, Ww, C = self.bev_z, self.bev_h, self.bev_w, self.embed_dims
        Q = Z * Hh * Ww
        queries = jnp.broadcast_to(self.voxel_embedding[None], (B, Q, C))
        pos = jnp.broadcast_to(self.voxel_pos()[None], (B, Q, C))

        shift = jax.vmap(
            lambda cb: bev_shift_from_can_bus(
                cb, (self.real_hw[0] / Hh, self.real_hw[1] / Ww), Hh, Ww,
                self.use_shift)
        )(can_bus) * has_prev[:, None]

        if self.rotate_prev_bev:
            angles = can_bus[:, -1] * has_prev
            grid = prev_bev.reshape(B, Z, Hh, Ww, C)
            grid = jax.vmap(lambda g, a: jax.vmap(
                lambda zslice: rotate_2d(zslice, a))(g))(grid, angles)
            prev_bev = grid.reshape(B, Q, C)

        if self.use_can_bus:
            cb = nn.relu(self.can_bus_fc1(can_bus))
            cb = self.can_bus_ln(nn.relu(self.can_bus_fc2(cb)))
            queries = queries + cb[:, None, :]

        ref_3d = jnp.asarray(voxel_reference_points_3d(
            Z, Hh, Ww, self.num_points_in_voxel))
        ref_cam, bev_mask = jax.vmap(
            lambda l2i: geometry.point_sampling(
                ref_3d, self.pc_range, l2i, self.img_shape)
        )(lidar2img)
        ref_cam = ref_cam.transpose(1, 0, 2, 3, 4)
        bev_mask = bev_mask.transpose(1, 0, 2, 3)

        # TSA 3D plane refs (+shift on x/y, alias bug shared)
        vox3d = jnp.asarray(
            voxel_reference_points_3d(Z, Hh, Ww, 1))[0]  # (Q, 3)
        ref = jnp.broadcast_to(vox3d[None], (B, Q, 3))
        shift3d = jnp.concatenate(
            [shift, jnp.zeros((B, 1), shift.dtype)], -1)
        ref_shifted = ref + shift3d[:, None, :]
        ref_cur = ref_shifted if self.shift_current_refs else ref
        tsa_refs = jnp.stack([ref_shifted, ref_cur], 1)[:, :, :, None, :]

        img_value, img_shapes = [], []
        for lvl, feat in enumerate(mlvl_feats):
            b, n, h, w, c = feat.shape
            img_value.append(feat.reshape(b, n, h * w, c))
            img_shapes.append((h, w))
        img_value = jnp.concatenate(img_value, axis=2)

        hp = has_prev[:, None, None]
        q0 = queries
        q = queries
        for layer in self.layers:
            value_prev = hp * prev_bev + (1 - hp) * q
            value_cur = hp * q0 + (1 - hp) * q
            q = layer(
                q, img_value,
                query_pos=pos,
                tsa_value=jnp.stack([value_prev, value_cur], 1),
                tsa_refs=tsa_refs,
                spatial_shape=(Z, Hh, Ww),
                img_spatial_shapes=tuple(img_shapes),
                reference_points_cam=ref_cam,
                bev_mask=bev_mask,
                deterministic=deterministic,
            )
        return q

    def __call__(self, mlvl_feats, *, can_bus, lidar2img, prev_bev, has_prev,
                 only_bev=False, deterministic=True):
        voxel_embed = self._encode(
            mlvl_feats, can_bus, lidar2img, prev_bev, has_prev, deterministic)
        if only_bev:
            return voxel_embed
        B = voxel_embed.shape[0]
        Z, Hh, Ww, C = self.bev_z, self.bev_h, self.bev_w, self.embed_dims

        # det decoder on z-collapsed BEV memory (decoder_on_bev)
        vox = voxel_embed.reshape(B, Z, Hh * Ww, C)
        bev_memory = self.voxel2bev(
            vox.transpose(0, 2, 1, 3).reshape(B, Hh * Ww, Z * C)
        )
        query_pos, query = (
            self.query_embedding[:, :C], self.query_embedding[:, C:]
        )
        query_pos = jnp.broadcast_to(query_pos[None], (B,) + query_pos.shape)
        query = jnp.broadcast_to(query[None], (B,) + query.shape)
        init_ref = jax.nn.sigmoid(self.reference_points_fc(query_pos))
        hs, inter_refs, inter_regs = self.decoder(
            query, bev_memory, query_pos=query_pos,
            reference_points=init_ref, spatial_shapes=((Hh, Ww),),
            deterministic=deterministic,
        )

        pc = np.asarray(self.pc_range, np.float32)
        cls_scores, bbox_preds = [], []
        for lvl in range(hs.shape[0]):
            r = init_ref if lvl == 0 else inter_refs[lvl - 1]
            r = inverse_sigmoid(r)
            cls = self.cls_branches[lvl](hs[lvl])
            tmp = inter_regs[lvl]
            xy = jax.nn.sigmoid(tmp[..., 0:2] + r[..., 0:2])
            z = jax.nn.sigmoid(tmp[..., 4:5] + r[..., 2:3])
            x = xy[..., 0:1] * (pc[3] - pc[0]) + pc[0]
            y = xy[..., 1:2] * (pc[4] - pc[1]) + pc[1]
            z = z * (pc[5] - pc[2]) + pc[2]
            bbox_preds.append(jnp.concatenate(
                [x, y, tmp[..., 2:4], z, tmp[..., 5:]], -1))
            cls_scores.append(cls)

        # occupancy: trilinear upsample voxel embeddings to the occ grid
        # (voxel rows are world-y, so the flat output is (z, y, x) — the
        # reference GT layout)
        occ_feat = self.occ_proj(voxel_embed)  # (B, Q, occ_dims)
        grid = occ_feat.reshape(B, Z, Hh, Ww, self.occ_dims)
        if (Z, Hh, Ww) != (self.occ_zdim, self.occ_ydim, self.occ_xdim):
            grid = jax.image.resize(
                grid,
                (B, self.occ_zdim, self.occ_ydim, self.occ_xdim,
                 self.occ_dims),
                method="trilinear",
            )
        occ = self.occ_branches(grid.reshape(B, self.voxel_num, self.occ_dims))
        return {
            "bev_embed": voxel_embed,
            "all_cls_scores": jnp.stack(cls_scores),
            "all_bbox_preds": jnp.stack(bbox_preds),
            "occupancy_preds": occ,
            "flow_preds": None,
        }
