"""MapTR losses: ordered-point-set Hungarian matching + cls/pts/dir losses.

Parity (reference file:line):
- MapTRAssigner: Hungarian cost = FocalLossCost + min-over-orders
  OrderedPtsL1Cost (maptr/assigners/maptr_assigner.py:52-134,
  maptr/losses/map_loss.py:214-223)
- MapTRLossHead.loss_single: per-decoder-layer focal cls (sync avg factor),
  PtsL1Loss on matched ordered points, PtsDirCosLoss on segment directions
  in meters, L1-bbox and GIoU terms configured to weight 0
  (maptr/dense_heads/maptr_loss_head.py:327-505;
  cfg bev_tiny_det_map_apollo.py:222-246: pts w=5.0, dir w=0.005)

Static shapes: GT padded to (B, MAX_VEC) vectors × ORDERS shift
permutations with validity masks; padded vectors get a constant cost row.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from apollo_vision_net_tpu.losses.det_loss import focal_cls_cost, sigmoid_focal_loss
from apollo_vision_net_tpu.ops.hungarian import linear_sum_assignment


class MapGT(NamedTuple):
    """Padded map GT. shift_pts holds every admissible point ordering
    (LiDARInstanceLines shift protocols, nuscenes_det_occ_map_dataset.py:
    128-280): 2 direction flips for polylines, cyclic rolls for polygons."""
    shift_pts: jnp.ndarray   # (B, V, O, P, 2) meters
    labels: jnp.ndarray      # (B, V) int
    mask: jnp.ndarray        # (B, V) bool — real vectors
    order_mask: jnp.ndarray  # (B, V, O) bool — valid orderings


def normalize_pts(pts: jnp.ndarray, pc_range: Sequence[float]) -> jnp.ndarray:
    pc = np.asarray(pc_range, np.float32)
    x = (pts[..., 0:1] - pc[0]) / (pc[3] - pc[0])
    y = (pts[..., 1:2] - pc[1]) / (pc[4] - pc[1])
    return jnp.concatenate([x, y], axis=-1)


def _pts_cost(pts_pred01, gt_pts01, cost_type: str):
    """Per-(pred, gt, order) point-set distances (map_loss.py variants:
    OrderedPtsL1Cost :214, OrderedPtsSmoothL1Cost :188,
    MyChamferDistanceCost :227)."""
    Q, P, _ = pts_pred01.shape
    V, O = gt_pts01.shape[:2]
    if cost_type == "chamfer":
        # (Q, V, O, P, P) pairwise point distances
        d = jnp.linalg.norm(
            pts_pred01[:, None, None, :, None, :]
            - gt_pts01[None, :, :, None, :, :], axis=-1)
        return d.min(-1).mean(-1) + d.min(-2).mean(-1)
    diff = jnp.abs(
        pts_pred01.reshape(Q, 1, 1, P * 2)
        - gt_pts01.reshape(1, V, O, P * 2)
    )
    if cost_type == "smooth_l1":
        diff = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
    return diff.sum(-1)


def _match_single(
    cls_logits: jnp.ndarray,   # (Q, C)
    pts_pred01: jnp.ndarray,   # (Q, P, 2) normalized
    gt_pts01: jnp.ndarray,     # (V, O, P, 2) normalized
    gt_labels: jnp.ndarray,    # (V,)
    gt_mask: jnp.ndarray,      # (V,)
    order_mask: jnp.ndarray,   # (V, O)
    cls_cost_weight: float,
    pts_cost_weight: float,
    pts_cost_type: str = "l1",
):
    Q, P, _ = pts_pred01.shape
    V, O = gt_pts01.shape[:2]
    cls_cost = focal_cls_cost(cls_logits, gt_labels, weight=cls_cost_weight)
    d = _pts_cost(pts_pred01, gt_pts01, pts_cost_type)  # (Q, V, O)
    d = jnp.where(order_mask[None], d, 1e9)
    pts_cost = d.min(axis=-1) * pts_cost_weight       # (Q, V)
    order_idx = d.argmin(axis=-1)                      # (Q, V)
    cost = (cls_cost + pts_cost).T                     # (V, Q)
    cost = jnp.where(gt_mask[:, None], cost, 1e6)
    assigned_q = linear_sum_assignment(cost)           # (V,)
    chosen_order = order_idx[assigned_q, jnp.arange(V)]  # (V,)
    return assigned_q, chosen_order


def map_loss(
    map_all_cls: jnp.ndarray,   # (L, B, num_vec, C)
    map_all_pts: jnp.ndarray,   # (L, B, num_vec, P, 2) normalized [0,1]
    gt: MapGT,
    *,
    pc_range: Sequence[float],
    num_classes: int = 3,
    cls_loss_weight: float = 2.0,
    pts_loss_weight: float = 5.0,
    dir_loss_weight: float = 0.005,
    cls_cost_weight: float = 2.0,
    pts_cost_weight: float = 5.0,
    pts_cost_type: str = "l1",  # 'l1' | 'smooth_l1' | 'chamfer'
    dir_interval: int = 1,
) -> Dict[str, jnp.ndarray]:
    L, B, Q, C = map_all_cls.shape
    P = map_all_pts.shape[-2]
    gt_pts01 = normalize_pts(gt.shift_pts, pc_range)   # (B, V, O, P, 2)
    V = gt_pts01.shape[1]
    num_pos = jnp.maximum(gt.mask.sum().astype(jnp.float32), 1.0)

    losses: Dict[str, jnp.ndarray] = {}
    total = 0.0
    for lyr in range(L):
        cls_l = map_all_cls[lyr].astype(jnp.float32)
        pts_l = map_all_pts[lyr].astype(jnp.float32)
        assigned_q, chosen_order = jax.vmap(
            lambda c, p, g, gl, gm, om: _match_single(
                c, p, g, gl, gm, om, cls_cost_weight, pts_cost_weight,
                pts_cost_type)
        )(cls_l, pts_l, gt_pts01, gt.labels, gt.mask, gt.order_mask)

        def scatter(aq, order, gl, gm, g01, graw):
            labels = jnp.full((Q,), num_classes, jnp.int32)
            labels = labels.at[aq].set(
                jnp.where(gm, gl, num_classes).astype(jnp.int32))
            sel01 = jnp.take_along_axis(
                g01, order[:, None, None, None], axis=1
            )[:, 0]  # (V, P, 2)
            sel_raw = jnp.take_along_axis(
                graw, order[:, None, None, None], axis=1
            )[:, 0]
            t01 = jnp.zeros((Q, P, 2), jnp.float32).at[aq].set(
                jnp.where(gm[:, None, None], sel01, 0.0))
            traw = jnp.zeros((Q, P, 2), jnp.float32).at[aq].set(
                jnp.where(gm[:, None, None], sel_raw, 0.0))
            w = jnp.zeros((Q,), jnp.float32).at[aq].set(gm.astype(jnp.float32))
            return labels, t01, traw, w

        labels, tgt01, tgt_m, w = jax.vmap(scatter)(
            assigned_q, chosen_order, gt.labels, gt.mask, gt_pts01,
            gt.shift_pts,
        )

        cls_avg = jnp.maximum(num_pos, 1.0)
        loss_cls = sigmoid_focal_loss(
            cls_l.reshape(-1, C), labels.reshape(-1),
            jnp.ones((B * Q,), jnp.float32),
        ) / cls_avg * cls_loss_weight

        loss_pts = (
            jnp.abs(pts_l - tgt01) * w[..., None, None]
        ).sum() / num_pos * pts_loss_weight

        # direction cosine loss in meters (loss computed on denormalized
        # pred dirs vs raw GT dirs, maptr_loss_head.py:415-426)
        pc = np.asarray(pc_range, np.float32)
        scale = jnp.asarray([pc[3] - pc[0], pc[4] - pc[1]])
        off = jnp.asarray([pc[0], pc[1]])
        pred_m = pts_l * scale + off
        pred_dir = pred_m[:, :, dir_interval:] - pred_m[:, :, :-dir_interval]
        tgt_dir = tgt_m[:, :, dir_interval:] - tgt_m[:, :, :-dir_interval]
        cos = (
            (pred_dir * tgt_dir).sum(-1)
            / jnp.maximum(
                jnp.linalg.norm(pred_dir, axis=-1)
                * jnp.linalg.norm(tgt_dir, axis=-1), 1e-6)
        )
        # torch cosine_embedding_loss(target=1) summed over segments
        loss_dir = (
            ((1.0 - cos) * w[..., None]).sum(-1).sum()
            / num_pos * dir_loss_weight
        )

        suffix = "" if lyr == L - 1 else f".d{lyr}"
        losses[f"loss_map_cls{suffix}"] = jnp.nan_to_num(loss_cls)
        losses[f"loss_map_pts{suffix}"] = jnp.nan_to_num(loss_pts)
        losses[f"loss_map_dir{suffix}"] = jnp.nan_to_num(loss_dir)
        total = total + losses[f"loss_map_cls{suffix}"] + \
            losses[f"loss_map_pts{suffix}"] + losses[f"loss_map_dir{suffix}"]
    losses["loss_map_total"] = total
    return losses


def map_loss_v2(
    map_all_cls: jnp.ndarray,   # (L, B, NV_o2o + NV_o2m, C)
    map_all_pts: jnp.ndarray,   # (L, B, NV, P, 2)
    gt: MapGT,
    *,
    pc_range: Sequence[float],
    num_vec_one2one: int,
    k_one2many: int = 6,
    lambda_one2many: float = 1.0,
    num_classes: int = 3,
    bev_seg_logits: Optional[jnp.ndarray] = None,   # (B, H, W)
    gt_bev_seg: Optional[jnp.ndarray] = None,       # (B, H, W) {0,1}
    pv_seg_logits: Optional[jnp.ndarray] = None,    # (B, N, h, w)
    gt_pv_seg: Optional[jnp.ndarray] = None,
    bev_seg_weight: float = 1.0,
    pv_seg_weight: float = 2.0,
    seg_pos_weight: float = 2.0,
) -> Dict[str, jnp.ndarray]:
    """MapTRv2 loss: one2one branch + λ-weighted one2many branch with GT
    repeated k times, plus auxiliary rasterized-segmentation BCE terms
    (v2 head :188-217, :622-761)."""
    o1 = num_vec_one2one
    losses = map_loss(
        map_all_cls[:, :, :o1], map_all_pts[:, :, :o1], gt,
        pc_range=pc_range, num_classes=num_classes,
    )
    total = losses.pop("loss_map_total")

    gt_many = MapGT(
        shift_pts=jnp.tile(gt.shift_pts, (1, k_one2many, 1, 1, 1)),
        labels=jnp.tile(gt.labels, (1, k_one2many)),
        mask=jnp.tile(gt.mask, (1, k_one2many)),
        order_mask=jnp.tile(gt.order_mask, (1, k_one2many, 1)),
    )
    many = map_loss(
        map_all_cls[:, :, o1:], map_all_pts[:, :, o1:], gt_many,
        pc_range=pc_range, num_classes=num_classes,
    )
    many_total = many.pop("loss_map_total")
    for k, v in many.items():
        losses[k + "_one2many"] = v * lambda_one2many
    total = total + lambda_one2many * many_total

    def bce(logits, target):
        # BCEWithLogitsLoss(pos_weight=seg_pos_weight) — reference v2 head
        # :88-98: positives weighted up (rasterized masks are sparse)
        t = target.astype(jnp.float32)
        softplus_neg = jnp.log1p(jnp.exp(-jnp.abs(logits))) + jnp.maximum(
            -logits, 0)   # softplus(-x), stable
        softplus_pos = jnp.log1p(jnp.exp(-jnp.abs(logits))) + jnp.maximum(
            logits, 0)    # softplus(x)
        return jnp.mean(
            seg_pos_weight * t * softplus_neg + (1.0 - t) * softplus_pos)

    if bev_seg_logits is not None and gt_bev_seg is not None:
        losses["loss_map_bev_seg"] = bev_seg_weight * bce(
            bev_seg_logits.astype(jnp.float32), gt_bev_seg)
        total = total + losses["loss_map_bev_seg"]
    if pv_seg_logits is not None and gt_pv_seg is not None:
        if gt_pv_seg.shape != pv_seg_logits.shape:
            # rasterized GT may be at a different stride; nearest-resize
            gt_pv_seg = jax.image.resize(
                gt_pv_seg.astype(jnp.float32), pv_seg_logits.shape,
                method="nearest")
        losses["loss_map_pv_seg"] = pv_seg_weight * bce(
            pv_seg_logits.astype(jnp.float32), gt_pv_seg)
        total = total + losses["loss_map_pv_seg"]

    losses["loss_map_total"] = total
    return losses
