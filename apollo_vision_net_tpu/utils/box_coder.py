"""3D box codec + NMS-free decoding (static shapes).

Parity: core/bbox/util.py:4-53 (normalize/denormalize between 9-dim
(cx,cy,cz,w,l,h,rot,vx,vy) and 10-dim (cx,cy,logw,logl,cz,logh,sin,cos,vx,vy))
and core/bbox/coders/nms_free_coder.py:10-122 (top-k over flattened sigmoid
scores, decode, post_center_range filter). The reference filters with boolean
indexing; here the filter is a validity mask so shapes stay static under jit.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np


def normalize_bbox(bboxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 9) meters/rad boxes -> (..., 10) regression targets."""
    cx, cy, cz = bboxes[..., 0:1], bboxes[..., 1:2], bboxes[..., 2:3]
    w = jnp.log(bboxes[..., 3:4])
    l = jnp.log(bboxes[..., 4:5])
    h = jnp.log(bboxes[..., 5:6])
    rot = bboxes[..., 6:7]
    if bboxes.shape[-1] > 7:
        vx, vy = bboxes[..., 7:8], bboxes[..., 8:9]
        return jnp.concatenate(
            [cx, cy, w, l, cz, h, jnp.sin(rot), jnp.cos(rot), vx, vy], axis=-1
        )
    return jnp.concatenate(
        [cx, cy, w, l, cz, h, jnp.sin(rot), jnp.cos(rot)], axis=-1
    )


def denormalize_bbox(nb: jnp.ndarray) -> jnp.ndarray:
    """(..., 10) regression outputs -> (..., 9) meters/rad boxes."""
    rot = jnp.arctan2(nb[..., 6:7], nb[..., 7:8])
    cx, cy, cz = nb[..., 0:1], nb[..., 1:2], nb[..., 4:5]
    w = jnp.exp(nb[..., 2:3])
    l = jnp.exp(nb[..., 3:4])
    h = jnp.exp(nb[..., 5:6])
    if nb.shape[-1] > 8:
        vx, vy = nb[..., 8:9], nb[..., 9:10]
        return jnp.concatenate([cx, cy, cz, w, l, h, rot, vx, vy], axis=-1)
    return jnp.concatenate([cx, cy, cz, w, l, h, rot], axis=-1)


class Detections(NamedTuple):
    """Static-shape detection output. `valid` masks real boxes."""
    boxes: jnp.ndarray   # (max_num, 9)
    scores: jnp.ndarray  # (max_num,)
    labels: jnp.ndarray  # (max_num,) int32
    valid: jnp.ndarray   # (max_num,) bool


def nms_free_decode(
    cls_logits: jnp.ndarray,
    bbox_preds: jnp.ndarray,
    post_center_range: Sequence[float],
    max_num: int = 100,
    score_threshold: float | None = None,
    num_classes: int = 10,
) -> Detections:
    """Decode one sample's last-layer head outputs.

    Args:
      cls_logits: (num_query, num_classes) pre-sigmoid.
      bbox_preds: (num_query, 10) normalized box regression.
    """
    scores_all = jnp.reshape(jax_sigmoid(cls_logits), (-1,))
    scores, idx = top_k(scores_all, min(max_num, scores_all.shape[0]))
    labels = (idx % num_classes).astype(jnp.int32)
    box_idx = idx // num_classes
    boxes = denormalize_bbox(bbox_preds[box_idx])
    rng = np.asarray(post_center_range, np.float32)
    valid = jnp.all(boxes[..., :3] >= rng[:3], axis=-1) & jnp.all(
        boxes[..., :3] <= rng[3:], axis=-1
    )
    if score_threshold is not None:
        valid = valid & (scores > score_threshold)
    return Detections(boxes=boxes, scores=scores, labels=labels, valid=valid)


def jax_sigmoid(x):
    import jax

    return jax.nn.sigmoid(x)


def top_k(x, k):
    import jax

    return jax.lax.top_k(x, k)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Matches mmdet's inverse_sigmoid clamping."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)
