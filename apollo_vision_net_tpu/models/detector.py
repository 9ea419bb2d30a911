"""BEVFormer detector — multi-task orchestrator.

Parity: bevformer/detectors/bevformer.py:19-466 — grid-mask augmentation,
backbone+neck feature extraction (:80-160), temporal history BEV via
no-grad replay of the queue (:260-276), train forward on the final frame
(:298-373), stateful streaming inference (:375-409; the scene-reset /
can_bus delta bookkeeping lives in data/temporal.py since it is host-side
state, not model math).

TPU-first: the queue replay is an unrolled loop over T-1 frames under
``stop_gradient`` (the reference's eval-mode ``obtain_history_bev``); every
frame's has_prev flag comes from the dataset (`prev_bev_exists`), making the
whole train step one jittable graph with static shapes.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from apollo_vision_net_tpu.models.dla import DLA
from apollo_vision_net_tpu.models.fpn import FPN
from apollo_vision_net_tpu.models.heads.det_head import BEVFormerHead
from apollo_vision_net_tpu.models.resnet import ResNet
from apollo_vision_net_tpu.models.second_fpn import SECONDFPNV2
from apollo_vision_net_tpu.utils import debug
from apollo_vision_net_tpu.utils.grid_mask import grid_mask


class BEVFormer(nn.Module):
    head: BEVFormerHead
    backbone_type: str = "resnet"  # 'resnet' | 'dla'
    backbone_depth: int = 50
    backbone_out_indices: Sequence[int] = (3,)
    backbone_dcn_stages: Sequence[bool] = (False, False, False, False)
    neck_type: str = "fpn"  # 'fpn' | 'secondfpn'
    neck_num_outs: int = 1
    embed_dims: int = 256
    use_grid_mask: bool = True
    video_test_mode: bool = True
    # multi-frame occ supervision: keep each history frame's BEV and let the
    # occ head supervise every queue frame (reference keep_bev_history)
    keep_bev_history: bool = False
    # compute dtype for the conv trunk (backbone+neck). The transformer
    # stack stays f32: its hot path is the gather/VPU-bound MSDA kernels,
    # and the reference's fp16 instability lived exactly there (bf16 is the
    # TPU replacement for the reference's fp16+clamp machinery).
    compute_dtype: str = "float32"

    def setup(self):
        dtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        if self.backbone_type == "resnet":
            self.img_backbone = ResNet(
                depth=self.backbone_depth,
                out_indices=self.backbone_out_indices,
                dcn_stages=self.backbone_dcn_stages,
                dtype=dtype,
            )
        elif self.backbone_type == "dla":
            self.img_backbone = DLA(
                out_indices=self.backbone_out_indices, dtype=dtype)
        elif self.backbone_type == "internimage":
            from apollo_vision_net_tpu.models.internimage import InternImage

            # InternImage-S (reference *_intern_s configs: channels 80,
            # depths [4,4,21,4], groups [5,10,20,40])
            self.img_backbone = InternImage(
                out_indices=self.backbone_out_indices, dtype=dtype)
        elif self.backbone_type == "vovnet":
            from apollo_vision_net_tpu.models.vovnet import VoVNet

            self.img_backbone = VoVNet(
                out_indices=self.backbone_out_indices, dtype=dtype)
        else:
            raise ValueError(self.backbone_type)
        if self.neck_type == "fpn":
            self.img_neck = FPN(
                out_channels=self.embed_dims, num_outs=self.neck_num_outs,
                dtype=dtype,
            )
        elif self.neck_type == "secondfpn":
            self.img_neck = SECONDFPNV2(
                fuse_channels=self.embed_dims, dtype=dtype)
        else:
            raise ValueError(self.neck_type)

    @property
    def prev_tokens(self) -> int:
        """Token count of the temporal carry — head-family dependent
        (voxel: z·h·w; hybrid: all stage volumes concatenated)."""
        h = self.head
        if hasattr(h, "carry_width"):
            return h.carry_width
        if hasattr(h, "bev_z"):
            return h.bev_z * h.bev_h * h.bev_w
        return h.bev_h * h.bev_w

    def extract_img_feat(
        self, img: jnp.ndarray, *, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, ...]:
        """(B, N, H, W, 3) -> [(B, N, h, w, C)] per level."""
        B, N, H, W, C = img.shape
        x = img.reshape(B * N, H, W, C)
        if self.use_grid_mask and not deterministic:
            x = grid_mask(self.make_rng("grid_mask"), x)
        # debug_nan probes at the backbone/neck boundary (reference
        # detectors/bevformer.py:111-151); identity unless debug.enable_probes
        bfeats = tuple(
            debug.probe(f"backbone.{i}", f)
            for i, f in enumerate(self.img_backbone(x))
        )
        feats = tuple(
            debug.probe(f"neck.{i}", f)
            for i, f in enumerate(self.img_neck(bfeats))
        )
        # the transformer stack runs in f32 (see compute_dtype note)
        return tuple(
            f.reshape((B, N) + f.shape[1:]).astype(jnp.float32) for f in feats
        )

    def obtain_history_bev(
        self,
        imgs_queue: jnp.ndarray,      # (B, T-1, N, H, W, 3)
        can_bus_queue: jnp.ndarray,   # (B, T-1, 18)
        lidar2img_queue: jnp.ndarray, # (B, T-1, N, 4, 4)
        has_prev_queue: jnp.ndarray,  # (B, T-1)
    ) -> jnp.ndarray:
        """No-grad replay of the T-1 history frames (reference :260-276)."""
        B, Tm1 = imgs_queue.shape[:2]
        Q = self.prev_tokens
        prev_bev = jnp.zeros((B, Q, self.embed_dims), jnp.float32)
        history = []
        for t in range(Tm1):
            feats = self.extract_img_feat(imgs_queue[:, t], deterministic=True)
            # per-frame prev_bev_exists flag (handles mid-queue scene change,
            # reference obtain_history_bev's per-frame None reset)
            has_prev = has_prev_queue[:, t]
            prev_bev = self.head(
                feats,
                can_bus=can_bus_queue[:, t],
                lidar2img=lidar2img_queue[:, t],
                prev_bev=prev_bev,
                has_prev=has_prev,
                only_bev=True,
                deterministic=True,
            )
            history.append(prev_bev)
        prev_bev = jax.lax.stop_gradient(prev_bev)
        if self.keep_bev_history:
            return prev_bev, jax.lax.stop_gradient(jnp.stack(history, axis=1))
        return prev_bev, None

    def __call__(
        self,
        img: jnp.ndarray,        # (B, T, N, H, W, 3) normalized images
        can_bus: jnp.ndarray,    # (B, T, 18)
        lidar2img: jnp.ndarray,  # (B, T, N, 4, 4)
        has_prev: jnp.ndarray,   # (B, T) float {0,1}: prev_bev usable
        *,
        deterministic: bool = True,
    ):
        """Training/eval forward over a temporal queue; the last frame is
        the supervised one (reference forward_train :298-373)."""
        T = img.shape[1]
        prev_bevs = None
        if T > 1:
            prev_bev, prev_bevs = self.obtain_history_bev(
                img[:, :-1], can_bus[:, :-1], lidar2img[:, :-1],
                has_prev[:, :-1],
            )
            cur_has_prev = has_prev[:, -1]
        else:
            B = img.shape[0]
            Q = self.prev_tokens
            prev_bev = jnp.zeros((B, Q, self.embed_dims), jnp.float32)
            cur_has_prev = has_prev[:, 0]
        feats = self.extract_img_feat(img[:, -1], deterministic=deterministic)
        kwargs = {}
        if self.keep_bev_history and prev_bevs is not None:
            kwargs["prev_bevs"] = prev_bevs
        return self.head(
            feats,
            can_bus=can_bus[:, -1],
            lidar2img=lidar2img[:, -1],
            prev_bev=prev_bev,
            has_prev=cur_has_prev,
            deterministic=deterministic,
            **kwargs,
        )

    def forward_test_frame(
        self,
        img: jnp.ndarray,        # (B, N, H, W, 3) one frame
        can_bus: jnp.ndarray,    # (B, 18) — deltas already applied by host
        lidar2img: jnp.ndarray,  # (B, N, 4, 4)
        prev_bev: jnp.ndarray,   # (B, Q, C) carried state
        has_prev: jnp.ndarray,   # (B,)
    ):
        """Streaming inference step: returns (outs, new_prev_bev)."""
        feats = self.extract_img_feat(img, deterministic=True)
        outs = self.head(
            feats, can_bus=can_bus, lidar2img=lidar2img,
            prev_bev=prev_bev, has_prev=has_prev, deterministic=True,
        )
        return outs, outs["bev_embed"]
