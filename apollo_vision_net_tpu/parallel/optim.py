"""Optimizer: AdamW with paramwise rules, grad clip, warmup+cosine schedule.

Parity: the reference trains with AdamW lr=2e-4, weight_decay=0.01,
``img_backbone`` lr_mult 0.1, grad_clip max_norm=35 (L2), linear warmup 500
iters at ratio 1/3 then CosineAnnealing to min_lr_ratio=1e-3
(bev_tiny_det.py:236-258). The reference's AdamW2 (models/opt/adamw.py:11)
only fixes a torch-1.8 weight-decay bug; optax.adamw is already correct.

Frozen parameters: the reference freezes stage-1 + all BN
(frozen_stages=1, BN requires_grad=False). Here FrozenBatchNorm stats and
the configured frozen prefixes get a zero-update mask.
"""
from __future__ import annotations

from typing import Sequence

import jax
import optax

FROZEN_SUBSTRINGS = ("FrozenBatchNorm", "stem_", "layer1_")  # frozen_stages=1
BN_PARAM_NAMES = ("mean", "var", "scale", "bias")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def _is_frozen(path_s: str) -> bool:
    # all BN params (any *_bn/bnN module) + stem + stage 1, backbone only
    if "img_backbone" in path_s:
        if "/bn" in path_s or "_bn" in path_s or "downsample_bn" in path_s:
            return True
        if "stem_" in path_s or "layer1_" in path_s:
            return True
    return False


def _is_backbone(path_s: str) -> bool:
    return "img_backbone" in path_s


def make_schedule(
    lr: float, warmup_iters: int, warmup_ratio: float,
    min_lr_ratio: float, total_steps: int,
):
    warmup = optax.linear_schedule(
        init_value=lr * warmup_ratio, end_value=lr,
        transition_steps=max(warmup_iters, 1),
    )
    cosine = optax.cosine_decay_schedule(
        init_value=lr,
        decay_steps=max(total_steps - warmup_iters, 1),
        alpha=min_lr_ratio,
    )
    return optax.join_schedules([warmup, cosine], [warmup_iters])


def make_optimizer(
    lr: float = 2e-4,
    weight_decay: float = 0.01,
    backbone_lr_mult: float = 0.1,
    grad_clip_norm: float = 35.0,
    warmup_iters: int = 500,
    warmup_ratio: float = 1.0 / 3.0,
    min_lr_ratio: float = 1e-3,
    total_steps: int = 100_000,
) -> optax.GradientTransformation:
    schedule = make_schedule(lr, warmup_iters, warmup_ratio, min_lr_ratio,
                             total_steps)

    def label_fn(params):
        def leaf_label(path, _):
            s = _path_str(path)
            if _is_frozen(s):
                return "frozen"
            return "backbone" if _is_backbone(s) else "main"

        return jax.tree_util.tree_map_with_path(leaf_label, params)

    def adamw(mult: float):
        return optax.adamw(
            learning_rate=lambda step: schedule(step) * mult,
            weight_decay=weight_decay,
        )

    # clip is GLOBAL over all params (reference optimizer_config), then
    # per-group lr/freeze rules
    return optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.multi_transform(
            {
                "main": adamw(1.0),
                "backbone": adamw(backbone_lr_mult),
                "frozen": optax.set_to_zero(),
            },
            label_fn,
        ),
    )
