"""Training loop: the TPU-native replacement for the mmcv Runner stack.

Replaces (reference file:line): custom_train_detector's runner/hook wiring
(bevformer/apis/mmdet_train.py:28-198), EpochBasedRunner, TextLoggerHook /
DetMapTextLoggerHook (bevformer/hooks/det_map_text_logger_hook.py:10-160 —
det/map losses grouped on separate lines, ~0 losses hidden).
"""
from __future__ import annotations

import logging
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from apollo_vision_net_tpu.configs.base import ExperimentConfig
from apollo_vision_net_tpu.parallel import train as train_lib
from apollo_vision_net_tpu.parallel.mesh import make_mesh, shard_batch_pytree
from apollo_vision_net_tpu.runtime.checkpoint import CheckpointManager

log = logging.getLogger("avnet")


def format_losses(losses: Dict[str, float], hide_zero: bool = True) -> str:
    """DetMapTextLoggerHook-style grouping: det losses, then map, then occ;
    near-zero (disabled) terms hidden."""
    groups = {"det": [], "map": [], "occ": [], "other": []}
    for k in sorted(losses):
        v = float(losses[k])
        if hide_zero and abs(v) < 1e-8 and k != "loss_total":
            continue
        g = ("map" if "map" in k else
             "occ" if any(t in k for t in ("occ", "lovasz", "scal", "flow"))
             else "det" if "loss" in k else "other")
        groups[g].append(f"{k}={v:.4f}")
    lines = [" ".join(groups[g]) for g in ("det", "map", "occ", "other")
             if groups[g]]
    return "\n  ".join(lines)


def train(
    cfg: ExperimentConfig,
    data_iter: Iterable[Dict[str, np.ndarray]],
    *,
    num_steps: int,
    work_dir: str = "work_dirs/default",
    log_interval: int = 50,
    checkpoint_interval: int = 1000,
    eval_fn: Optional[Callable] = None,
    eval_interval: int = 0,
    resume: bool = False,
    seed: int = 0,
):
    from apollo_vision_net_tpu.runtime.metrics_log import MetricsLogger

    mesh = make_mesh()
    data_iter = iter(data_iter)
    first = next(data_iter)
    state = train_lib.init_state(cfg, jax.random.PRNGKey(seed), first)
    if getattr(cfg, "pretrained_path", ""):
        # reference: pretrained=dict(img=...) + mmcv load_checkpoint before
        # the runner starts (tools/train.py); here the torch state dict is
        # name-mapped onto the flax backbone/neck subtrees
        from apollo_vision_net_tpu.utils.torch_import import (
            apply_pretrained,
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(cfg.pretrained_path)
        new_params = apply_pretrained(
            dict(state.params), sd, cfg.model.backbone_type,
            log=lambda *a: log.info(" ".join(str(x) for x in a)))
        state = state.replace(
            params=jax.tree.map(jnp.asarray, new_params))
        log.info("loaded pretrained backbone weights from %s",
                 cfg.pretrained_path)
    ckpt = CheckpointManager(work_dir, best_metric="NDS" if eval_fn else None)
    mlog = MetricsLogger(work_dir)
    start_step = 0
    if resume and ckpt.latest_step() is not None:
        state, meta = ckpt.restore(state)
        start_step = int(state.step)
        log.info("resumed from step %d", start_step)

    step_fn = train_lib.make_jitted_train_step(mesh, cfg)
    rng = jax.random.PRNGKey(seed + 1)

    batch = first
    t0 = time.time()
    for step in range(start_step, num_steps):
        sharded = shard_batch_pytree(mesh, batch)
        state, losses = step_fn(state, sharded, rng)
        try:
            batch = next(data_iter)
        except StopIteration:
            data_iter = None
        if (step + 1) % log_interval == 0 or step == start_step:
            losses = {k: float(v) for k, v in losses.items()}
            dt = (time.time() - t0) / max(step - start_step + 1, 1)
            log.info("step %d/%d (%.2fs/it)\n  %s", step + 1, num_steps, dt,
                     format_losses(losses))
            mlog.log("train", step + 1, losses, sec_per_it=round(dt, 4))
        metrics = None
        if eval_fn and eval_interval and (step + 1) % eval_interval == 0:
            metrics = eval_fn(state)
            log.info("eval @%d: %s", step + 1, metrics)
            mlog.log("eval", step + 1,
                     {k: v for k, v in metrics.items()
                      if isinstance(v, (int, float))})
        if (step + 1) % checkpoint_interval == 0 or step + 1 == num_steps:
            ckpt.save(step + 1, state, cfg, metrics)
        if data_iter is None:
            break
    ckpt.close()
    mlog.close()
    return state
