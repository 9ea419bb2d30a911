#!/usr/bin/env python
"""Parameter-count + FLOPs report for a config.

Reference analog: tools/analysis_tools/get_params.py (sums checkpoint
tensor sizes); here the numbers come from the live model: per-submodule
parameter counts from the initialized pytree, and forward FLOPs from
XLA's own cost analysis of the compiled streaming step.

Usage: JAX_PLATFORMS=cpu python tools/get_params.py [config]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default="bev_tiny_det_map_apollo")
    p.add_argument("--depth", type=int, default=2,
                   help="module-tree depth for the breakdown")
    args = p.parse_args()

    from apollo_vision_net_tpu import configs as cfglib
    from apollo_vision_net_tpu.data.synthetic import make_batch
    from apollo_vision_net_tpu.models.detector import BEVFormer
    from apollo_vision_net_tpu.parallel.train import build_model, init_state

    cfg = getattr(cfglib, args.config)()
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=1, seed=0))
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    model = build_model(cfg)

    # per-submodule parameter counts
    groups = {}
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    total = 0
    for path, leaf in flat:
        keys = [getattr(k, "key", str(k)) for k in path]
        g = "/".join(keys[:args.depth])
        n = int(np.prod(leaf.shape))
        groups[g] = groups.get(g, 0) + n
        total += n
    print(f"config: {cfg.name}")
    print(f"total params: {total:,} ({total / 1e6:.2f} M)")
    for g, n in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"  {n:12,}  {n / total * 100:5.1f}%  {g}")

    # forward FLOPs from XLA cost analysis of the streaming step
    Q = model.prev_tokens
    lowered = jax.jit(
        lambda p, img, cb, l2i, prev, hp: model.apply(
            {"params": p}, img, cb, l2i, prev, hp,
            method=BEVFormer.forward_test_frame)
    ).lower(state.params, batch["img"][:, -1], batch["can_bus"][:, -1],
            batch["lidar2img"][:, -1],
            jnp.zeros((1, Q, cfg.model.embed_dims), jnp.float32),
            jnp.ones((1,), jnp.float32))
    try:
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = cost.get("flops", float("nan"))
        print(f"forward FLOPs (XLA cost analysis, 1 frame): {flops:.3e}"
              f"  ({flops / 1e9:.1f} GFLOP)")
    except Exception as e:  # cost analysis is backend-dependent
        print(f"FLOPs unavailable on this backend: {e}")


if __name__ == "__main__":
    main()
