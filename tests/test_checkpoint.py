"""Orbax checkpoint save/restore roundtrip + best-metric retention."""
import numpy as np
import jax
import jax.numpy as jnp

from apollo_vision_net_tpu.configs import bev_smoke_det
from apollo_vision_net_tpu.data.synthetic import make_batch
from apollo_vision_net_tpu.parallel.train import init_state
from apollo_vision_net_tpu.runtime.checkpoint import CheckpointManager


def test_checkpoint_roundtrip(tmp_path):
    cfg = bev_smoke_det()
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, 1, seed=0))
    state = init_state(cfg, jax.random.PRNGKey(0), batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), best_metric=None)
    mgr.save(5, state, cfg, metrics={"NDS": 0.1})
    assert mgr.latest_step() == 5

    # perturb, then restore
    zeroed = state.replace(
        params=jax.tree.map(jnp.zeros_like, state.params))
    restored, meta = mgr.restore(zeroed)
    mgr.close()

    w0 = state.params["head"]["cls_branch0"]["Dense_0"]["kernel"]
    w1 = restored.params["head"]["cls_branch0"]["Dense_0"]["kernel"]
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))
    assert meta["config"]["name"] == cfg.name
    assert meta["framework_version"]


def test_best_metric_retention(tmp_path):
    cfg = bev_smoke_det()
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, 1, seed=0))
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=1,
                            best_metric="NDS")
    mgr.save(1, state, cfg, metrics={"NDS": 0.5})
    mgr.save(2, state, cfg, metrics={"NDS": 0.2})  # worse
    # best (step 1) must survive max_to_keep=1
    restored, meta = mgr.restore(state, step=1)
    assert int(meta["step"]) == 1
    mgr.close()
