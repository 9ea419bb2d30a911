"""Detection loss: Hungarian assignment + focal cls + weighted L1 bbox.

Parity (reference file:line):
- HungarianAssigner3D with FocalLossCost(w=2) + BBox3DL1Cost(w=0.25) over
  the first 8 normalized box dims: core/bbox/assigners/
  hungarian_assigner_3d.py:17-135, core/bbox/match_costs/match_cost.py:7-34
- per-decoder-layer loss with sync'd cls_avg_factor and num_pos:
  bevformer/dense_heads/bevformer_head.py:344-429
- code_weights default [1.0]*8 + [0.2, 0.2] (velocity down-weighted)

Static shapes: GT is padded to (B, MAX_GT) with a validity mask. Padded GT
rows get a constant cost row, which provably cannot change the real rows'
optimal assignment (tests/test_hungarian.py). Cross-device loss
normalization parity (`reduce_mean` in the reference, :382-397) is implicit:
under pjit the batch dimension is global, so sums over it already aggregate
across devices.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from apollo_vision_net_tpu.ops.hungarian import linear_sum_assignment
from apollo_vision_net_tpu.utils.box_coder import normalize_bbox

DEFAULT_CODE_WEIGHTS = (1.0,) * 8 + (0.2, 0.2)


class DetGT(NamedTuple):
    """Padded detection ground truth for one batch."""
    boxes: jnp.ndarray   # (B, G, 9) meters/rad (cx,cy,cz,w,l,h,rot,vx,vy)
    labels: jnp.ndarray  # (B, G) int32 in [0, num_classes)
    mask: jnp.ndarray    # (B, G) bool


def sigmoid_focal_loss(
    logits: jnp.ndarray,   # (M, C)
    labels: jnp.ndarray,   # (M,) int, label == C means background
    weights: jnp.ndarray,  # (M,)
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """mmdet py_sigmoid_focal_loss, summed (caller divides by avg_factor)."""
    C = logits.shape[-1]
    target = jax.nn.one_hot(labels, C, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    pt = (1.0 - p) * target + p * (1.0 - target)
    focal_w = (alpha * target + (1.0 - alpha) * (1.0 - target)) * pt**gamma
    bce = jnp.maximum(logits, 0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    loss = bce * focal_w
    return (loss * weights[..., None]).sum()


def focal_cls_cost(
    logits: jnp.ndarray,    # (Q, C)
    gt_labels: jnp.ndarray,  # (G,)
    alpha: float = 0.25,
    gamma: float = 2.0,
    eps: float = 1e-12,
    weight: float = 2.0,
) -> jnp.ndarray:
    """mmdet FocalLossCost -> (Q, G)."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    neg = -jnp.log(1.0 - p + eps) * (1.0 - alpha) * p**gamma
    pos = -jnp.log(p + eps) * alpha * (1.0 - p) ** gamma
    cost = pos - neg  # (Q, C)
    return cost[:, jnp.clip(gt_labels, 0, logits.shape[-1] - 1)] * weight


def _match_single(
    cls_logits: jnp.ndarray,  # (Q, C)
    bbox_pred: jnp.ndarray,   # (Q, 10) normalized regression output
    gt_norm: jnp.ndarray,     # (G, 10) normalized GT
    gt_labels: jnp.ndarray,   # (G,)
    gt_mask: jnp.ndarray,     # (G,)
    cls_weight: float,
    reg_weight: float,
) -> jnp.ndarray:
    cls_cost = focal_cls_cost(cls_logits, gt_labels, weight=cls_weight)
    reg_cost = jnp.abs(
        bbox_pred[:, None, :8] - gt_norm[None, :, :8]
    ).sum(-1) * reg_weight
    cost = (cls_cost + reg_cost).T  # (G, Q)
    cost = jnp.where(gt_mask[:, None], cost, 1e6)
    return linear_sum_assignment(cost)  # (G,) query index per GT


def det_loss(
    all_cls_scores: jnp.ndarray,  # (Lyr, B, Q, C); Q = num_groups·q
    all_bbox_preds: jnp.ndarray,  # (Lyr, B, Q, 10) in meters for xyz
    gt: DetGT,
    *,
    num_classes: int = 10,
    num_groups: int = 1,
    cls_loss_weight: float = 2.0,
    bbox_loss_weight: float = 0.25,
    cls_cost_weight: float = 2.0,
    reg_cost_weight: float = 0.25,
    code_weights: Sequence[float] = DEFAULT_CODE_WEIGHTS,
) -> Dict[str, jnp.ndarray]:
    """Full multi-layer detection loss (reference `loss`, :430-519).

    Group-DETR: with num_groups>1 the query axis holds G contiguous groups;
    each group is matched against the full GT independently (inner vmap) and
    the shared normalizer scales by G — numerically identical to the
    reference's per-group loop averaged by group_detr
    (occupancy_head_apollo.py:625-647). The group axis is deliberately NOT
    folded into the batch axis: batch is dp-sharded under pjit, and a
    sharded-dim reshape would force an all-to-all.
    """
    n_layers, B, Q, C = all_cls_scores.shape
    G = num_groups
    q = Q // G
    code_w = jnp.asarray(code_weights, jnp.float32)
    gt_norm = normalize_bbox(gt.boxes)  # (B, V, 10)
    # padded rows could contain log(0); sanitize (they are masked everywhere)
    gt_norm = jnp.where(
        gt.mask[..., None], jnp.nan_to_num(gt_norm, posinf=0.0, neginf=0.0), 0.0
    )
    num_pos = jnp.maximum(gt.mask.sum().astype(jnp.float32), 1.0) * G

    def match_groups(cls_b, box_b, gn, gl, gm):
        # cls_b (G, q, C): every group matched against the same GT
        return jax.vmap(
            lambda c, b: _match_single(c, b, gn, gl, gm, cls_cost_weight,
                                       reg_cost_weight)
        )(cls_b, box_b)  # (G, V)

    losses = {}
    total = 0.0
    for lyr in range(n_layers):
        cls_l = all_cls_scores[lyr].reshape(B, G, q, C)
        box_l = all_bbox_preds[lyr].reshape(B, G, q, -1)
        assigned_q = jax.vmap(match_groups)(
            cls_l, box_l, gt_norm, gt.labels, gt.mask
        )  # (B, G, V)

        def scatter_targets(aq, gl, gm, gn):
            labels = jnp.full((q,), num_classes, jnp.int32)
            labels = labels.at[aq].set(
                jnp.where(gm, gl, num_classes).astype(jnp.int32)
            )
            btgt = jnp.zeros((q, gn.shape[-1]), jnp.float32).at[aq].set(
                jnp.where(gm[:, None], gn, 0.0)
            )
            bw = jnp.zeros((q,), jnp.float32).at[aq].set(gm.astype(jnp.float32))
            return labels, btgt, bw

        labels, bbox_targets, bbox_w = jax.vmap(
            lambda aqs, gl, gm, gn: jax.vmap(
                lambda aq: scatter_targets(aq, gl, gm, gn))(aqs)
        )(assigned_q, gt.labels, gt.mask, gt_norm)  # (B, G, q[, ...])

        cls_avg = jnp.maximum(num_pos, 1.0)  # bg_cls_weight = 0
        loss_cls = (
            sigmoid_focal_loss(
                cls_l.reshape(-1, C).astype(jnp.float32),
                labels.reshape(-1),
                jnp.ones((B * Q,), jnp.float32),
            )
            / cls_avg * cls_loss_weight
        )
        diff = jnp.abs(box_l.astype(jnp.float32) - bbox_targets)
        loss_bbox = (
            (diff * code_w * bbox_w[..., None]).sum()
            / num_pos * bbox_loss_weight
        )
        loss_cls = jnp.nan_to_num(loss_cls)
        loss_bbox = jnp.nan_to_num(loss_bbox)
        suffix = "" if lyr == n_layers - 1 else f".d{lyr}"
        losses[f"loss_cls{suffix}"] = loss_cls
        losses[f"loss_bbox{suffix}"] = loss_bbox
        total = total + loss_cls + loss_bbox
    losses["loss_total"] = total
    return losses
