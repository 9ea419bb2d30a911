"""Base-scale (200x200 BEV) sharded-train-step compile check.

The sp mesh axis exists FOR grids this size (`bev_partition` shards the
40k-query BEV grid); the smoke-scale dryrun exercises the mechanism but
not the production shapes. This AOT-compiles the FULL bev_base_det_map
train step (R101-DCN, 4 levels, det+map heads) under a dp4xsp2 mesh on
the 8-device CPU mesh — through the SPMD partitioner, so sharding
mismatches, collective layouts, and partitioned-shape errors all surface
— without paying a full-scale CPU execution.

Reference scale anchors: projects/configs/bevformer/bev_base_occ.py trunk
+ maptrv2/dense_heads/bevformer_det_map_head_apollo_v2.py heads.

~4-5 min on one CPU core (compile only); excluded from the quick tier.
"""
import dataclasses

import jax
import jax.numpy as jnp
import pytest


@pytest.mark.timeout(1800)
def test_base_det_map_sp_train_step_compiles():
    from apollo_vision_net_tpu import configs as cfglib
    from apollo_vision_net_tpu.data.synthetic import make_batch
    from apollo_vision_net_tpu.parallel import train as train_lib
    from apollo_vision_net_tpu.parallel.mesh import (
        make_mesh, shard_batch_pytree,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")

    cfg = cfglib.bev_base_det_map()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, bev_partition=("dp", "sp", None)))
    mesh = make_mesh(dp=4, sp=2, devices=jax.devices()[:8])
    with jax.sharding.set_mesh(mesh):
        batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=4))
        state_abs = jax.eval_shape(
            lambda: train_lib.init_state(cfg, jax.random.PRNGKey(0), batch))
        batch_abs = jax.eval_shape(lambda: shard_batch_pytree(mesh, batch))
        step = train_lib.make_jitted_train_step(mesh, cfg)
        compiled = step.lower(
            state_abs, batch_abs,
            jax.ShapeDtypeStruct((2,), jnp.uint32)).compile()

    # sanity: the partitioned step really is the full fwd+bwd+optimizer
    flops = compiled.cost_analysis().get("flops", 0.0)
    assert flops > 1e12, flops
    # outputs keep the (state, losses) contract
    state_info, losses_info = compiled.out_info
    assert "loss_total" in losses_info
