"""sp-sharded vs unsharded equivalence: the SAME train step compiled under
a dp4×sp2 mesh (BEV query grid sharded over `sp` via bev_partition) must
produce the same losses as the pure-dp8 mesh — XLA's inserted collectives
(halo exchanges / all-gathers around the sharded encoder) are a layout
choice, not a semantics change (VERDICT round-2 weak #3)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from apollo_vision_net_tpu.configs import bev_smoke_det
from apollo_vision_net_tpu.data.synthetic import make_batch
from apollo_vision_net_tpu.parallel import train as train_lib
from apollo_vision_net_tpu.parallel.mesh import make_mesh, shard_batch_pytree


def _run_one_step(cfg, mesh, batch):
    with jax.sharding.set_mesh(mesh):
        state = train_lib.init_state(cfg, jax.random.PRNGKey(0), batch)
        step = train_lib.make_jitted_train_step(mesh, cfg)
        sbatch = shard_batch_pytree(mesh, batch)
        state, losses = step(state, sbatch, jax.random.PRNGKey(1))
        return {k: float(v) for k, v in losses.items()}


def test_sp_sharded_losses_match_unsharded():
    cfg = bev_smoke_det()
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=8, seed=3))

    losses_dp = _run_one_step(cfg, make_mesh(dp=8, sp=1), batch)

    cfg_sp = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, bev_partition=("dp", "sp", None)))
    losses_sp = _run_one_step(cfg_sp, make_mesh(dp=4, sp=2), batch)

    assert set(losses_dp) == set(losses_sp)
    for k in losses_dp:
        np.testing.assert_allclose(
            losses_sp[k], losses_dp[k], rtol=2e-4, atol=1e-5,
            err_msg=f"loss {k} diverges between sp-sharded and unsharded")
