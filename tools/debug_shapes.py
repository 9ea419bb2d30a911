#!/usr/bin/env python
"""Shape tracer: print every intermediate tensor shape of one forward
(reference tools/debug_shapes_v1mini.py analog) using jax.eval_shape — no
device time needed."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default="bev_smoke_det")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from apollo_vision_net_tpu import configs
    from apollo_vision_net_tpu.data.synthetic import make_batch
    from apollo_vision_net_tpu.parallel.train import build_model

    cfg = getattr(configs, args.config)()
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, 1, seed=0))
    model = build_model(cfg)

    print(f"== {cfg.name} ==")
    for k, v in batch.items():
        print(f"input {k:16s} {tuple(v.shape)} {v.dtype}")

    variables = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            batch["img"], batch["can_bus"], batch["lidar2img"],
            batch["has_prev"], deterministic=True,
        )
    )
    n_params = sum(
        int(jnp.prod(jnp.asarray(x.shape)))
        for x in jax.tree.leaves(variables["params"])
    )
    print(f"params: {n_params / 1e6:.2f} M")

    outs = jax.eval_shape(
        lambda v: model.apply(
            v, batch["img"], batch["can_bus"], batch["lidar2img"],
            batch["has_prev"], deterministic=True,
        ),
        variables,
    )
    for k, v in outs.items():
        if v is not None:
            print(f"output {k:22s} {tuple(v.shape)} {v.dtype}")


if __name__ == "__main__":
    main()
