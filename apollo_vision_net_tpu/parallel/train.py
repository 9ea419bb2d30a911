"""Jitted training/eval steps over a device mesh.

Replaces the reference's mmcv Runner + DDP train loop
(bevformer/apis/mmdet_train.py:28-198) with a single pjit-compiled train
step: data-parallel batch sharding over the ``dp`` mesh axis, gradients
reduced by XLA (no explicit NCCL), loss normalizers global by construction.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from apollo_vision_net_tpu.configs.base import ExperimentConfig
from apollo_vision_net_tpu.losses.det_loss import DetGT, det_loss
from apollo_vision_net_tpu.losses.map_loss import MapGT, map_loss
from apollo_vision_net_tpu.losses.multitask import det_occ_loss
from apollo_vision_net_tpu.models.detector import BEVFormer
from apollo_vision_net_tpu.models.heads.det_head import BEVFormerHead
from apollo_vision_net_tpu.models.heads.map_head import BEVFormerDetMapHead
from apollo_vision_net_tpu.models.heads.occ_head import BEVFormerOccupancyHead
from apollo_vision_net_tpu.parallel.optim import make_optimizer


class TrainState(train_state.TrainState):
    pass


def build_head(cfg: ExperimentConfig):
    m = cfg.model
    common = dict(
        bev_h=m.bev_h,
        bev_w=m.bev_w,
        num_query=m.num_query,
        num_classes=m.num_classes,
        embed_dims=m.embed_dims,
        code_size=m.code_size,
        pc_range=m.pc_range,
        num_points_in_pillar=m.num_points_in_pillar,
        img_shape=m.img_shape,
        num_cams=m.num_cams,
        num_feature_levels=m.num_feature_levels,
        encoder_layers=m.encoder_layers,
        decoder_layers=m.decoder_layers,
        feedforward_channels=m.feedforward_channels,
        rotate_prev_bev=m.rotate_prev_bev,
        use_shift=m.use_shift,
        use_can_bus=m.use_can_bus,
        shift_current_refs=m.shift_current_refs,
        attn_logits_clamp=m.attn_logits_clamp,
        msda_impl=m.msda_impl,
        group_detr=m.group_detr,
        bev_partition=m.bev_partition,
        # transformer activations follow the conv trunk's compute dtype
        # unless the config pins them (m.transformer_dtype)
        transformer_dtype=m.transformer_dtype or cfg.compute_dtype,
    )
    occ_kw = dict(
        occupancy_classes=m.occupancy_classes,
        occ_xdim=m.occ_xdim, occ_ydim=m.occ_ydim, occ_zdim=m.occ_zdim,
        occ_dims=m.occ_dims,
    )
    if m.head_family == "voxel":
        from apollo_vision_net_tpu.models.voxel import VoxelFormerOccupancyHead

        return VoxelFormerOccupancyHead(
            bev_z=m.bev_z, num_points_in_voxel=m.num_points_in_voxel,
            **occ_kw, **common,
        )
    if m.head_family == "hybrid":
        from apollo_vision_net_tpu.models.hybrid import (
            HybridFormerOccupancyHead,
        )

        return HybridFormerOccupancyHead(
            encoder_embed_dims=m.hybrid_encoder_embed_dims,
            feature_map_z=m.hybrid_feature_map_z,
            **occ_kw, **common,
        )
    if m.with_occupancy:
        return BEVFormerOccupancyHead(
            occ_head_type=m.occ_head_type, occ_tsa=m.occ_tsa,
            predict_flow=m.predict_flow,
            with_occupancy_flow=m.with_occupancy_flow, **occ_kw, **common,
        )
    if m.with_map and m.map_version == 2:
        from apollo_vision_net_tpu.models.heads.map_head_v2 import (
            BEVFormerDetMapHeadV2,
        )

        return BEVFormerDetMapHeadV2(
            num_vec_one2one=m.num_map_vec,
            num_vec_one2many=m.num_vec_one2many,
            map_num_pts=m.map_num_pts, map_num_classes=m.map_num_classes,
            map_decoder_layers=m.map_decoder_layers,
            with_aux_seg=m.with_aux_seg, **common,
        )
    if m.with_map:
        return BEVFormerDetMapHead(
            num_map_vec=m.num_map_vec, map_num_pts=m.map_num_pts,
            map_num_classes=m.map_num_classes,
            map_decoder_layers=m.map_decoder_layers, **common,
        )
    return BEVFormerHead(**common)


def build_model(cfg: ExperimentConfig) -> BEVFormer:
    m = cfg.model
    return BEVFormer(
        head=build_head(cfg),
        backbone_type=m.backbone_type,
        backbone_depth=m.backbone_depth,
        backbone_out_indices=m.backbone_out_indices,
        backbone_dcn_stages=m.backbone_dcn_stages,
        neck_type=m.neck_type,
        neck_num_outs=m.num_feature_levels,
        embed_dims=m.embed_dims,
        use_grid_mask=m.use_grid_mask,
        video_test_mode=m.video_test_mode,
        keep_bev_history=m.keep_bev_history or m.with_occupancy_flow,
        compute_dtype=cfg.compute_dtype,
    )


def init_state(
    cfg: ExperimentConfig, rng: jax.Array, sample_batch: Dict[str, Any]
) -> TrainState:
    model = build_model(cfg)
    # jit the init: unjitted tracing dispatches every op individually, which
    # is pathologically slow over a remote-TPU tunnel
    init_fn = jax.jit(functools.partial(model.init, deterministic=True))
    params = init_fn(
        {"params": rng},
        sample_batch["img"][:1],
        sample_batch["can_bus"][:1],
        sample_batch["lidar2img"][:1],
        sample_batch["has_prev"][:1],
    )["params"]
    o = cfg.optim
    tx = make_optimizer(
        lr=o.lr,
        weight_decay=o.weight_decay,
        backbone_lr_mult=o.backbone_lr_mult,
        grad_clip_norm=o.grad_clip_norm,
        warmup_iters=o.warmup_iters,
        warmup_ratio=o.warmup_ratio,
        min_lr_ratio=o.min_lr_ratio,
        total_steps=o.total_steps,
    )
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def loss_fn(
    params, apply_fn, batch: Dict[str, Any], rng: jax.Array,
    cfg: ExperimentConfig,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    m = cfg.model
    d_rng, g_rng, f_rng = jax.random.split(rng, 3)
    outs = apply_fn(
        {"params": params},
        batch["img"], batch["can_bus"], batch["lidar2img"], batch["has_prev"],
        deterministic=False,
        rngs={"dropout": d_rng, "grid_mask": g_rng, "flow_mix": f_rng},
    )
    gt = DetGT(batch["gt_boxes"], batch["gt_labels"], batch["gt_mask"])
    if m.with_occupancy:
        losses = det_occ_loss(
            outs, gt, batch["gt_occupancy"],
            occupancy_classes=m.occupancy_classes,
            group_detr=m.group_detr,
            num_classes=m.num_classes,
            occ_loss_type=m.occ_loss_type,
            occ_grid_hw=(m.occ_ydim, m.occ_xdim),
            occ_zdim=m.occ_zdim,
            flow_preds=outs.get("flow_preds"),
            gt_flow=batch.get("gt_flow"),
        )
    else:
        losses = det_loss(
            outs["all_cls_scores"], outs["all_bbox_preds"], gt,
            num_classes=m.num_classes,
        )
    if m.with_map:
        mgt = MapGT(batch["map_shift_pts"], batch["map_labels"],
                    batch["map_mask"], batch["map_order_mask"])
        # the reference normalizes map points by the same pc_range as
        # detection (bev_tiny_det_map_apollo.py:51,233)
        if m.map_version == 2:
            from apollo_vision_net_tpu.losses.map_loss import map_loss_v2

            map_losses = map_loss_v2(
                outs["map_all_cls_scores"], outs["map_all_pts_preds"], mgt,
                pc_range=m.pc_range,
                num_vec_one2one=m.num_map_vec,
                k_one2many=m.map_k_one2many,
                lambda_one2many=m.map_lambda_one2many,
                num_classes=m.map_num_classes,
                bev_seg_logits=outs.get("bev_seg_logits"),
                gt_bev_seg=batch.get("gt_bev_seg"),
                pv_seg_logits=outs.get("pv_seg_logits"),
                gt_pv_seg=batch.get("gt_pv_seg"),
            )
        else:
            map_losses = map_loss(
                outs["map_all_cls_scores"], outs["map_all_pts_preds"], mgt,
                pc_range=m.pc_range,
                num_classes=m.map_num_classes,
            )
        total = losses.pop("loss_total") + map_losses.pop("loss_map_total")
        losses.update(map_losses)
        losses["loss_total"] = total
    return losses["loss_total"], losses


def train_step(
    state: TrainState, batch: Dict[str, Any], rng: jax.Array,
    *, cfg: ExperimentConfig,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    rng = jax.random.fold_in(rng, state.step)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (_, losses), grads = grad_fn(
        state.params, state.apply_fn, batch, rng, cfg
    )
    state = state.apply_gradients(grads=grads)
    return state, losses


def make_jitted_train_step(mesh: Mesh, cfg: ExperimentConfig):
    """pjit the train step: batch over dp, state replicated, state donated."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))
    return jax.jit(
        functools.partial(train_step, cfg=cfg),
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def eval_step(state: TrainState, batch: Dict[str, Any]):
    """Deterministic forward on the last frame of each queue."""
    return state.apply_fn(
        {"params": state.params},
        batch["img"], batch["can_bus"], batch["lidar2img"], batch["has_prev"],
        deterministic=True,
    )
