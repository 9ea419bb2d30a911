"""HybridFormer (OccNet cascade): BEV encoder → voxel encoders with growing
z and shrinking channels.

Parity (reference file:line):
- HybridPerceptionTransformer (modules/hybrid_transformer.py:25-454):
  encoder stages with embed_dims [256,128,64,32,16] and z [1,2,4,8,16]
  (hybrid_tiny_occ.py:52-121); per-stage positional encodings; stage
  transitions are MLPs on the z·C=256 pillar vector followed by a
  (z_{i+1}, C_{i+1}) reshape (:147-159, :329-336); per-stage temporal
  prev state list; det decoder on BEV via voxel2bev.
- HybridFormerOccupancyHead (dense_heads/hybrid_occupancy_head.py:33-1312):
  det+occ on the final (z=16, C=16) voxel volume.

The temporal carry is the concatenation of all stage outputs (each stage
rotates/uses its own slice) — matching the reference's per-stage prev_bev
list (:283-310).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from apollo_vision_net_tpu.models.encoder import BEVFormerLayer
from apollo_vision_net_tpu.models.decoder import DetectionTransformerDecoder
from apollo_vision_net_tpu.models.heads.det_head import (
    BEVFormerHead,
    ClsBranch,
)
from apollo_vision_net_tpu.models.heads.occ_head import OccMLPBranch
from apollo_vision_net_tpu.models.pos_encoding import LearnedPositionalEncoding
from apollo_vision_net_tpu.models.voxel import (
    VoxelFormerLayer,
    VoxelLearnedPositionalEncoding,
    voxel_reference_points_3d,
)
from apollo_vision_net_tpu.ops.grid_sample import rotate_2d
from apollo_vision_net_tpu.utils import geometry
from apollo_vision_net_tpu.utils.box_coder import inverse_sigmoid
from apollo_vision_net_tpu.utils.geometry import bev_shift_from_can_bus


class HybridFormerOccupancyHead(BEVFormerHead):
    """Cascade BEV→voxel det+occ head."""

    encoder_embed_dims: Sequence[int] = (256, 128, 64, 32, 16)
    feature_map_z: Sequence[int] = (1, 2, 4, 8, 16)
    stage_layers: int = 1  # encoder layers per stage
    num_points_in_voxel: int = 1
    occupancy_classes: int = 16
    occ_xdim: int = 200
    occ_ydim: int = 200
    occ_zdim: int = 16
    occ_dims: int = 16
    num_occ_fcs: int = 2

    @property
    def voxel_num(self) -> int:
        return self.occ_zdim * self.occ_xdim * self.occ_ydim

    @property
    def carry_width(self) -> int:
        """Total token count of the temporal carry (all stages stacked on
        the token axis at their own dims padded to embed slots)."""
        return sum(z * self.bev_h * self.bev_w
                   for z in self.feature_map_z)

    def setup(self):
        n_stages = len(self.encoder_embed_dims)
        self.bev_embedding = self.param(
            "bev_embedding", nn.initializers.normal(1.0),
            (self.bev_h * self.bev_w, self.encoder_embed_dims[0]),
        )
        self.query_embedding = self.param(
            "query_embedding", nn.initializers.uniform(1.0),
            (self.num_query, self.embed_dims * 2),
        )
        self.positional_encoding = LearnedPositionalEncoding(
            num_feats=self.encoder_embed_dims[0] // 2,
            row_num_embed=self.bev_h, col_num_embed=self.bev_w,
        )
        self.stage_pos = [
            VoxelLearnedPositionalEncoding(
                num_feats=(
                    self.encoder_embed_dims[i]
                    - 2 * (self.encoder_embed_dims[i] // 3),
                    self.encoder_embed_dims[i] // 3,
                    self.encoder_embed_dims[i] // 3,
                ),
                z_num=self.feature_map_z[i],
                row_num=self.bev_h, col_num=self.bev_w,
                name=f"pos_stage{i}",
            )
            for i in range(1, n_stages)
        ]
        self.bev_layers = [
            BEVFormerLayer(
                embed_dims=self.encoder_embed_dims[0],
                num_levels=self.num_feature_levels,
                num_cams=self.num_cams,
                feedforward_channels=self.encoder_embed_dims[0] * 2,
                msda_impl=self.msda_impl,
                name=f"bev_layer{i}",
            )
            for i in range(self.stage_layers)
        ]
        self.voxel_layers = [
            [
                VoxelFormerLayer(
                    embed_dims=self.encoder_embed_dims[s],
                    num_levels=self.num_feature_levels,
                    num_cams=self.num_cams,
                    feedforward_channels=self.encoder_embed_dims[s] * 2,
                    msda_impl=self.msda_impl,
                    name=f"voxel_stage{s}_layer{i}",
                )
                for i in range(self.stage_layers)
            ]
            for s in range(1, n_stages)
        ]
        # stage transitions: MLP on the pillar vector (z_i*C_i -> z_j*C_j)
        self.transitions = [
            nn.Dense(
                self.feature_map_z[i + 1] * self.encoder_embed_dims[i + 1],
                name=f"transition{i}",
            )
            for i in range(n_stages - 1)
        ]
        # per-level image-value projections to each stage's dims
        self.value_projs = [
            nn.Dense(self.encoder_embed_dims[i], name=f"value_proj_stage{i}")
            for i in range(n_stages)
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
        if self.use_can_bus:
            self.can_bus_fc1 = nn.Dense(self.encoder_embed_dims[0] // 2)
            self.can_bus_fc2 = nn.Dense(self.encoder_embed_dims[0])
            self.can_bus_ln = nn.LayerNorm()

    def _stage_prev(self, prev_carry, stage, B):
        """Slice stage `stage`'s tokens out of the concatenated carry."""
        Hh, Ww = self.bev_h, self.bev_w
        starts = np.concatenate(
            [[0], np.cumsum([z * Hh * Ww for z in self.feature_map_z])])
        sl = prev_carry[:, int(starts[stage]):int(starts[stage + 1])]
        return sl[..., : self.encoder_embed_dims[stage]]

    def __call__(self, mlvl_feats, *, can_bus, lidar2img, prev_bev, has_prev,
                 only_bev=False, deterministic=True):
        """prev_bev: (B, carry_width, max(C)) concatenated stage carry."""
        B = mlvl_feats[0].shape[0]
        Hh, Ww = self.bev_h, self.bev_w
        n_stages = len(self.encoder_embed_dims)
        Cmax = self.encoder_embed_dims[0]

        shift = jax.vmap(
            lambda cb: bev_shift_from_can_bus(
                cb, (self.real_hw[0] / Hh, self.real_hw[1] / Ww), Hh, Ww,
                self.use_shift)
        )(can_bus) * has_prev[:, None]
        angles = can_bus[:, -1] * has_prev

        img_value_full, img_shapes = [], []
        for feat in mlvl_feats:
            b, n, h, w, c = feat.shape
            img_value_full.append(feat.reshape(b, n, h * w, c))
            img_shapes.append((h, w))
        img_value_full = jnp.concatenate(img_value_full, axis=2)
        img_shapes = tuple(img_shapes)

        hp = has_prev[:, None, None]
        q = jnp.broadcast_to(
            self.bev_embedding[None], (B, Hh * Ww, Cmax))
        if self.use_can_bus:
            cb = nn.relu(self.can_bus_fc1(can_bus))
            cb = self.can_bus_ln(nn.relu(self.can_bus_fc2(cb)))
            q = q + cb[:, None, :]

        carry_out = []
        for stage in range(n_stages):
            Z = self.feature_map_z[stage]
            C = self.encoder_embed_dims[stage]
            Q = Z * Hh * Ww
            value = self.value_projs[stage](img_value_full)
            prev = self._stage_prev(prev_bev, stage, B)
            # rotate each z-slice of the stage carry by the yaw delta
            grid = prev.reshape(B, Z, Hh, Ww, C)
            grid = jax.vmap(lambda g, a: jax.vmap(
                lambda zs: rotate_2d(zs, a))(g))(grid, angles)
            prev = grid.reshape(B, Q, C)

            ref_3d = jnp.asarray(voxel_reference_points_3d(
                Z, Hh, Ww, self.num_points_in_voxel))
            ref_cam, bev_mask = jax.vmap(
                lambda l2i: geometry.point_sampling(
                    ref_3d, self.pc_range, l2i, self.img_shape)
            )(lidar2img)
            ref_cam = ref_cam.transpose(1, 0, 2, 3, 4)
            bev_mask = bev_mask.transpose(1, 0, 2, 3)

            q0 = q
            if stage == 0:
                pos = self.positional_encoding(Hh, Ww)
                pos = jnp.broadcast_to(pos[None], (B, Q, C))
                ref2d = jnp.asarray(
                    geometry.bev_reference_points_2d(Hh, Ww))
                for layer in self.bev_layers:
                    value_prev = hp * prev + (1 - hp) * q
                    value_cur = hp * q0 + (1 - hp) * q
                    q = layer(
                        q, value,
                        bev_pos=pos,
                        tsa_value=jnp.stack([value_prev, value_cur], 1),
                        tsa_refs=jnp.stack(
                            [jnp.broadcast_to(ref2d[None], (B, Q, 2))
                             + shift[:, None, :]] * 2, 1)[:, :, :, None, :],
                        bev_spatial_shapes=((Hh, Ww),),
                        img_spatial_shapes=img_shapes,
                        reference_points_cam=ref_cam,
                        bev_mask=bev_mask,
                        deterministic=deterministic,
                    )
            else:
                pos = self.stage_pos[stage - 1]()
                pos = jnp.broadcast_to(pos[None], (B, Q, C))
                vox3d = jnp.asarray(
                    voxel_reference_points_3d(Z, Hh, Ww, 1))[0]
                ref = jnp.broadcast_to(vox3d[None], (B, Q, 3))
                shift3d = jnp.concatenate(
                    [shift, jnp.zeros((B, 1), shift.dtype)], -1)
                refs = jnp.stack([ref + shift3d[:, None, :]] * 2, 1)
                for layer in self.voxel_layers[stage - 1]:
                    value_prev = hp * prev + (1 - hp) * q
                    value_cur = hp * q0 + (1 - hp) * q
                    q = layer(
                        q, value,
                        query_pos=pos,
                        tsa_value=jnp.stack([value_prev, value_cur], 1),
                        tsa_refs=refs[:, :, :, None, :],
                        spatial_shape=(Z, Hh, Ww),
                        img_spatial_shapes=img_shapes,
                        reference_points_cam=ref_cam,
                        bev_mask=bev_mask,
                        deterministic=deterministic,
                    )
            pad = Cmax - C
            carry_out.append(
                jnp.pad(q, [(0, 0), (0, 0), (0, pad)]) if pad else q)
            if stage < n_stages - 1:
                # pillar MLP transition: (hw, z_i*C_i) -> (hw, z_j*C_j)
                Zn = self.feature_map_z[stage + 1]
                Cn = self.encoder_embed_dims[stage + 1]
                pillar = q.reshape(B, Z, Hh * Ww, C).transpose(
                    0, 2, 1, 3).reshape(B, Hh * Ww, Z * C)
                pillar = self.transitions[stage](pillar)
                q = pillar.reshape(B, Hh * Ww, Zn, Cn).transpose(
                    0, 2, 1, 3).reshape(B, Zn * Hh * Ww, Cn)

        new_carry = jnp.concatenate(carry_out, axis=1)
        if only_bev:
            return new_carry

        final = carry_out[-1][..., : self.encoder_embed_dims[-1]]
        Zf = self.feature_map_z[-1]
        Cf = self.encoder_embed_dims[-1]

        # det decoder on z-collapsed BEV memory
        vox = final.reshape(B, Zf, Hh * Ww, Cf)
        bev_memory = self.voxel2bev(
            vox.transpose(0, 2, 1, 3).reshape(B, Hh * Ww, Zf * Cf))
        C = self.embed_dims
        query_pos, query = (
            self.query_embedding[:, :C], self.query_embedding[:, C:])
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
            r = inverse_sigmoid(init_ref if lvl == 0 else inter_refs[lvl - 1])
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

        # voxel rows are world-y: flat output (z, y, x), the reference
        # GT layout
        grid = final.reshape(B, Zf, Hh, Ww, Cf)
        if (Zf, Hh, Ww) != (self.occ_zdim, self.occ_ydim, self.occ_xdim):
            grid = jax.image.resize(
                grid,
                (B, self.occ_zdim, self.occ_ydim, self.occ_xdim, Cf),
                method="trilinear",
            )
        occ = self.occ_branches(
            grid.reshape(B, self.voxel_num, Cf))
        return {
            "bev_embed": new_carry,
            "all_cls_scores": jnp.stack(cls_scores),
            "all_bbox_preds": jnp.stack(bbox_preds),
            "occupancy_preds": occ,
            "flow_preds": None,
        }
