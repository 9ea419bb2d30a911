"""Checkpointing via orbax: params/opt-state/step + config metadata +
best-metric tracking.

Parity: the reference's mmcv checkpoint_config (interval=1, max_keep_ckpts,
resume_from/load_from, metadata with versions+config text+classes —
SURVEY.md §5 checkpoint/resume) and the eval hook's
``save_best='pts_bbox_NuScenes/NDS'``.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from apollo_vision_net_tpu import __version__
from apollo_vision_net_tpu.configs.base import ExperimentConfig


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 10,
                 best_metric: Optional[str] = "NDS"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.best_metric = best_metric
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=(lambda m: m.get(self.best_metric, -1.0))
                if best_metric else None,
                best_mode="max",
            ),
        )

    def save(self, step: int, state, cfg: ExperimentConfig,
             metrics: Optional[Dict[str, float]] = None):
        meta = {
            "framework_version": __version__,
            "config": dataclasses.asdict(cfg),
            "step": step,
        }
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(
                    {"params": state.params, "opt_state": state.opt_state,
                     "step": state.step}
                ),
                meta=ocp.args.JsonSave(meta),
            ),
            metrics=metrics or {},
        )
        self._mgr.wait_until_finished()

    def restore(self, state, step: Optional[int] = None):
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        target = {"params": state.params, "opt_state": state.opt_state,
                  "step": state.step}
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(target),
                meta=ocp.args.JsonRestore(),
            ),
        )
        s = restored["state"]
        return state.replace(
            params=s["params"], opt_state=s["opt_state"], step=s["step"]
        ), restored["meta"]

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()
