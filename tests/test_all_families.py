"""Every model family trains one pjit step on the 8-device CPU mesh."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from apollo_vision_net_tpu import configs
from apollo_vision_net_tpu.data.synthetic import make_batch
from apollo_vision_net_tpu.parallel import train as train_lib
from apollo_vision_net_tpu.parallel.mesh import make_mesh, shard_batch_pytree


@pytest.mark.parametrize("name", [
    "smoke_voxel_occ", "smoke_hybrid_occ", "smoke_det_mapv2",
])
def test_family_train_step(name):
    cfg = getattr(configs, name)()
    mesh = make_mesh()
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=8, seed=0))
    state = train_lib.init_state(cfg, jax.random.PRNGKey(0), batch)
    step = train_lib.make_jitted_train_step(mesh, cfg)
    batch = shard_batch_pytree(mesh, batch)
    state, losses = step(state, batch, jax.random.PRNGKey(1))
    for k, v in losses.items():
        assert np.isfinite(float(v)), (name, k, v)
    assert float(losses["loss_total"]) > 0
