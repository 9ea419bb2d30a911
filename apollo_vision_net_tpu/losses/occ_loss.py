"""Occupancy losses: focal / distance-weighted focal / CE, lovász-softmax,
geometric & semantic affinity (scal) losses, flow L1.

Parity (reference file:line):
- CustomFocalLoss (radial distance weight over the BEV grid, per-class
  weights, ignore 255): models/occ_loss_utils/focal_loss.py:163-271
- lovasz_softmax ('present' classes): occ_loss_utils/lovasz_softmax.py:157-230
- geo_scal_loss / sem_scal_loss / CE_ssc_loss:
  occ_loss_utils/nusc_param.py:164-247, semkitti.py:78-182
- class-balanced weights 1/log(freq): bevformer_occupancy_head_apollo.py:109-112

All functions are mask-based (no boolean filtering) so shapes stay static:
lovász handles the ignore mask by zeroing (error, fg) of invalid voxels —
provably exact, since zero-error entries sort to the tail and contribute
nothing to the Jaccard gradient dot product.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# reference occ_loss_utils/nusc_param.py:35-51 — 16 semantic classes + free
NUSC_CLASS_FREQUENCIES = np.array([
    32503112, 12135169, 5631079, 4744578, 2264798, 222351, 305051,
    3215271, 528651, 2826015, 302204240, 8065114, 96118458, 145138993,
    279441154, 313481556, 16794374410,
], np.float64)

NUSC_CLASS_NAMES = [
    "car", "truck", "trailer", "bus", "construction_vehicle", "bicycle",
    "motorcycle", "pedestrian", "traffic_cone", "barrier",
    "driveable_surface", "other_flat", "sidewalk", "terrain", "manmade",
    "vegetation", "free",
]


def balanced_class_weights(num_classes: int) -> np.ndarray:
    """1 / log(freq + eps), truncated to num_classes entries."""
    return (1.0 / np.log(NUSC_CLASS_FREQUENCIES[:num_classes] + 0.001)).astype(
        np.float32
    )


def radial_bev_weight(h: int, w: int) -> np.ndarray:
    """CustomFocalLoss's center-distance weight in [1, 2] (focal_loss.py
    :197-203)."""
    ys = np.arange(h) - h / 2.0
    xs = np.arange(w) - w / 2.0
    c = np.sqrt(ys[:, None] ** 2 + xs[None, :] ** 2)
    return (c / c.max() + 1.0).astype(np.float32)


def _binary_focal(logits, target_onehot, alpha, gamma):
    p = jax.nn.sigmoid(logits)
    pt = (1.0 - p) * target_onehot + p * (1.0 - target_onehot)
    w = (alpha * target_onehot + (1 - alpha) * (1 - target_onehot)) * pt**gamma
    bce = jnp.maximum(logits, 0) - logits * target_onehot + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return bce * w


def occupancy_focal_loss(
    logits: jnp.ndarray,      # (M, C)
    labels: jnp.ndarray,      # (M,) int; label == C means "free"/background
    valid: jnp.ndarray,       # (M,) bool (ignore mask)
    *,
    class_weights: Optional[jnp.ndarray] = None,  # (C,)
    spatial_weight: Optional[jnp.ndarray] = None,  # (M,) radial BEV weight
    alpha: float = 0.25,
    gamma: float = 2.0,
    loss_weight: float = 1.0,
    avg_mode: str = "visible_mean",  # CustomFocalLoss: .sum(-1).mean()
    avg_factor: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    C = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, C, dtype=logits.dtype)
    loss = _binary_focal(logits.astype(jnp.float32), onehot, alpha, gamma)
    w = jnp.ones((logits.shape[0], 1), jnp.float32)
    if class_weights is not None:
        w = w * class_weights[None, :]
    if spatial_weight is not None:
        w = w * spatial_weight[:, None]
    loss = (loss * w).sum(-1) * valid.astype(jnp.float32)
    if avg_mode == "visible_mean":
        return loss_weight * loss.sum() / jnp.maximum(valid.sum(), 1.0)
    return loss_weight * loss.sum() / jnp.maximum(avg_factor, 1.0)


def ce_ssc_loss(
    logits: jnp.ndarray,   # (M, C)
    labels: jnp.ndarray,   # (M,)
    valid: jnp.ndarray,    # (M,)
    class_weights: jnp.ndarray,  # (C,)
) -> jnp.ndarray:
    """Weighted CE with ignore — torch CrossEntropyLoss(weight, ignore,
    reduction='mean') semantics: sum(w_y * nll) / sum(w_y over valid)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lbl = jnp.clip(labels, 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, lbl[:, None], axis=1)[:, 0]
    wy = class_weights[lbl] * valid.astype(jnp.float32)
    return (nll * wy).sum() / jnp.maximum(wy.sum(), 1e-6)


def _lovasz_grad(fg_sorted: jnp.ndarray) -> jnp.ndarray:
    gts = fg_sorted.sum()
    intersection = gts - jnp.cumsum(fg_sorted, 0)
    union = gts + jnp.cumsum(1.0 - fg_sorted, 0)
    jaccard = 1.0 - intersection / union
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def lovasz_softmax(
    probs: jnp.ndarray,   # (M, C) softmax probabilities
    labels: jnp.ndarray,  # (M,)
    valid: jnp.ndarray,   # (M,)
) -> jnp.ndarray:
    """'present'-classes lovász-softmax; invalid voxels contribute exactly
    zero (see module docstring)."""
    M, C = probs.shape
    validf = valid.astype(jnp.float32)

    def class_loss(c):
        fg = (labels == c).astype(jnp.float32) * validf
        errors = jnp.abs(fg - probs[:, c]) * validf
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        loss_c = jnp.dot(errors_sorted, _lovasz_grad(fg_sorted))
        present = fg.sum() > 0
        return loss_c, present

    losses, present = jax.vmap(class_loss)(jnp.arange(C))
    presentf = present.astype(jnp.float32)
    return (losses * presentf).sum() / jnp.maximum(presentf.sum(), 1.0)


def _bce_on_prob(p):
    """F.binary_cross_entropy(p, 1) = -log(p), clamped like torch."""
    return -jnp.log(jnp.clip(p, 1e-12, 1.0))


def geo_scal_loss(
    probs: jnp.ndarray,   # (M, C) softmax probabilities
    labels: jnp.ndarray,  # (M,)
    valid: jnp.ndarray,   # (M,)
    empty_idx: int,
    eps: float = 1e-5,
) -> jnp.ndarray:
    validf = valid.astype(jnp.float32)
    empty_probs = probs[:, empty_idx]
    nonempty_probs = 1.0 - empty_probs
    nonempty_target = ((labels != empty_idx) & valid).astype(jnp.float32)
    empty_target = ((labels == empty_idx) & valid).astype(jnp.float32)
    inter = (nonempty_target * nonempty_probs * validf).sum()
    precision = inter / ((nonempty_probs * validf).sum() + eps)
    recall = inter / (nonempty_target.sum() + eps)
    spec = (empty_target * empty_probs).sum() / (empty_target.sum() + eps)
    return _bce_on_prob(precision) + _bce_on_prob(recall) + _bce_on_prob(spec)


def sem_scal_loss(
    probs: jnp.ndarray,   # (M, C)
    labels: jnp.ndarray,  # (M,)
    valid: jnp.ndarray,   # (M,)
    skip_last: bool = True,  # reference loops range(0, C-1): skips free class
) -> jnp.ndarray:
    M, C = probs.shape
    validf = valid.astype(jnp.float32)
    n = C - 1 if skip_last else C

    def class_loss(c):
        p = probs[:, c] * validf
        tgt = ((labels == c) & valid).astype(jnp.float32)
        n_tgt = tgt.sum()
        nom = (p * tgt).sum()
        p_sum = p.sum()
        precision = nom / jnp.maximum(p_sum, 1e-12)
        recall = nom / jnp.maximum(n_tgt, 1e-12)
        neg = ((1.0 - probs[:, c]) * (1.0 - tgt) * validf).sum()
        n_neg = (validf * (1.0 - tgt)).sum()
        specificity = neg / jnp.maximum(n_neg, 1e-12)
        loss_c = (
            jnp.where(p_sum > 0, _bce_on_prob(precision), 0.0)
            + _bce_on_prob(recall)
            + jnp.where(n_neg > 0, _bce_on_prob(specificity), 0.0)
        )
        present = n_tgt > 0
        return loss_c, present

    losses, present = jax.vmap(class_loss)(jnp.arange(n))
    presentf = present.astype(jnp.float32)
    return (losses * presentf).sum() / jnp.maximum(presentf.sum(), 1.0)


def flow_l1_loss(
    flow_preds: jnp.ndarray,   # (M, 2)
    gt_flow: jnp.ndarray,      # (M, 2)
    object_mask: jnp.ndarray,  # (M,) bool: gt label < 10 (foreground)
) -> jnp.ndarray:
    m = object_mask.astype(jnp.float32)[:, None]
    num = jnp.maximum(object_mask.sum().astype(jnp.float32), 1.0)
    return (jnp.abs(flow_preds - gt_flow) * m).sum() / num
