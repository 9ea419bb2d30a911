"""Multi-task loss assembly: group-DETR det + occupancy (+flow).

Parity: BEVFormerOccupancyHeadApollo.loss (occupancy_head_apollo.py:506-653)
— per-group Hungarian det loss averaged over groups, occupancy supervised
only at the last decoder layer with focal/CustomFocal/CE + lovász +
sem_scal/geo_scal affinity, flow L1 on object voxels.

Group folding: the reference loops groups and divides each group's det loss
by group_detr (:625-647). Folding groups into the batch axis gives the
identical value (each group has the same num_pos, so the shared normalizer
sums to G·num_pos), with one Hungarian batch instead of G sequential ones.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from apollo_vision_net_tpu.losses.det_loss import DetGT, det_loss
from apollo_vision_net_tpu.losses import occ_loss as ol


def det_occ_loss(
    outs: Dict[str, jnp.ndarray],
    gt: DetGT,
    gt_occupancy: jnp.ndarray,           # (B, voxel_num) int; 255 = ignore
    *,
    occupancy_classes: int = 16,
    group_detr: int = 1,
    num_classes: int = 10,
    occ_loss_type: str = "CustomFocalLoss",
    occ_grid_hw: Optional[tuple] = None,  # (occ_x, occ_y) for radial weight
    occ_zdim: int = 16,
    balance_cls_weight: bool = True,
    lovasz_weight: float = 1.0,
    sem_scal_weight: float = 1.0,
    geo_scal_weight: float = 1.0,
    focal_loss_weight: float = 100.0,
    gt_flow: Optional[jnp.ndarray] = None,   # (B, voxel_num, 2)
    flow_preds: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    all_cls = outs["all_cls_scores"]
    all_box = outs["all_bbox_preds"]

    # det: per-group Hungarian via the group-aware det_loss (the batch axis
    # stays intact — it is dp-sharded under pjit)
    losses = det_loss(all_cls, all_box, gt, num_classes=num_classes,
                      num_groups=group_detr)
    total = losses.pop("loss_total")

    # --- occupancy (last decoder layer only)
    occ_preds = outs["occupancy_preds"]  # (B, vox, C_occ)
    Bv, vox, C_occ = occ_preds.shape
    logits = occ_preds.reshape(-1, C_occ).astype(jnp.float32)
    labels = gt_occupancy.reshape(-1)
    valid = labels != 255

    class_w = (
        jnp.asarray(ol.balanced_class_weights(C_occ))
        if balance_cls_weight else jnp.full((C_occ,), 1.0 / 17.0)
    )

    if occ_loss_type == "focal_loss":
        num_pos = (labels < occupancy_classes).sum().astype(jnp.float32)
        loss_occ = ol.occupancy_focal_loss(
            logits, labels, valid, avg_mode="factor", avg_factor=num_pos,
            loss_weight=focal_loss_weight,
        )
    elif occ_loss_type == "CustomFocalLoss":
        if occ_grid_hw is not None:
            rw = ol.radial_bev_weight(*occ_grid_hw)  # (y, x) BEV rows/cols
            # voxel order is (z, y, x), x minor — the reference layout
            spatial = jnp.asarray(
                np.tile(rw.reshape(-1), occ_zdim)
            )
            spatial = jnp.tile(spatial, Bv)
        else:
            spatial = None
        loss_occ = ol.occupancy_focal_loss(
            logits, labels, valid,
            class_weights=class_w, spatial_weight=spatial,
            loss_weight=focal_loss_weight,
        )
    elif occ_loss_type == "ce_loss":
        # CE needs every supervised label to be a real channel; empty voxels
        # (label == C) only exist in the predict_free_voxel=False setup
        loss_occ = ol.ce_ssc_loss(
            logits, labels, valid & (labels < C_occ), class_w
        )
    else:
        raise ValueError(occ_loss_type)

    probs = jax.nn.softmax(logits, axis=-1)
    loss_lovasz = lovasz_weight * ol.lovasz_softmax(probs, labels, valid)
    loss_sem = sem_scal_weight * ol.sem_scal_loss(probs, labels, valid)
    loss_geo = geo_scal_weight * ol.geo_scal_loss(
        probs, labels, valid, empty_idx=occupancy_classes - 1
    )

    losses["loss_occupancy"] = jnp.nan_to_num(loss_occ)
    losses["lovasz_softmax"] = jnp.nan_to_num(loss_lovasz)
    losses["loss_sem_scal"] = jnp.nan_to_num(loss_sem)
    losses["loss_geo_scal"] = jnp.nan_to_num(loss_geo)
    total = total + losses["loss_occupancy"] + losses["lovasz_softmax"] + \
        losses["loss_sem_scal"] + losses["loss_geo_scal"]

    if flow_preds is not None and gt_flow is not None:
        object_mask = (labels < 10) & valid
        loss_flow = ol.flow_l1_loss(
            flow_preds.reshape(-1, flow_preds.shape[-1]),
            gt_flow.reshape(-1, gt_flow.shape[-1]),
            object_mask,
        )
        losses["loss_flow"] = jnp.nan_to_num(loss_flow)
        total = total + losses["loss_flow"]

    losses["loss_total"] = total
    return losses
