"""Train step: runs under pjit on the 8-device CPU mesh, loss decreases on
an overfit batch, frozen params stay frozen."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from apollo_vision_net_tpu.configs import bev_smoke_det
from apollo_vision_net_tpu.data.synthetic import make_batch
from apollo_vision_net_tpu.parallel import train as train_lib
from apollo_vision_net_tpu.parallel.mesh import make_mesh, shard_batch_pytree


@pytest.fixture(scope="module")
def setup():
    cfg = bev_smoke_det()
    mesh = make_mesh()  # 8 virtual CPU devices, dp=8, sp=1
    batch = make_batch(cfg, batch_size=8, seed=0)
    batch = jax.tree.map(jnp.asarray, batch)

    # the jitted step donates the state, so each test gets a fresh one
    def make_state():
        return train_lib.init_state(cfg, jax.random.PRNGKey(0), batch)

    return cfg, mesh, batch, make_state


def test_train_step_decreases_loss(setup):
    cfg, mesh, batch, make_state = setup
    state = make_state()
    step = train_lib.make_jitted_train_step(mesh, cfg)
    batch = shard_batch_pytree(mesh, batch)
    rng = jax.random.PRNGKey(42)
    losses = []
    for _ in range(4):
        state, loss_dict = step(state, batch, rng)
        losses.append(float(loss_dict["loss_total"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses


def test_frozen_params_do_not_update(setup):
    cfg, mesh, batch, make_state = setup
    state = make_state()
    step = train_lib.make_jitted_train_step(mesh, cfg)
    batch = shard_batch_pytree(mesh, batch)
    p0 = jax.tree.map(np.asarray, state.params)
    state2, _ = step(state, batch, jax.random.PRNGKey(1))
    p1 = state2.params

    stem = p0["img_backbone"]["stem_conv"]["kernel"]
    stem_after = np.asarray(p1["img_backbone"]["stem_conv"]["kernel"])
    np.testing.assert_array_equal(stem, stem_after)

    bn = p0["img_backbone"]["stem_bn"]["scale"]
    bn_after = np.asarray(p1["img_backbone"]["stem_bn"]["scale"])
    np.testing.assert_array_equal(bn, bn_after)

    head_w = p0["head"]["cls_branch0"]["Dense_0"]["kernel"]
    head_after = np.asarray(p1["head"]["cls_branch0"]["Dense_0"]["kernel"])
    assert np.abs(head_w - head_after).max() > 0
