"""Occupancy flow aggregation (reference occupancy_aggregation,
bevformer_occupancy_head.py:253-301) + 3D grid sampling + flow-GT codec."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apollo_vision_net_tpu.ops.grid_sample import grid_sample_3d


def _norm_coord(idx, size):
    # voxel-center normalized coordinate (align_corners=False):
    # pixel p samples exactly at grid (2p + 1)/S - 1
    return (2.0 * idx + 1.0) / size - 1.0


def test_grid_sample_3d_exact_at_centers():
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((3, 4, 5, 2)), jnp.float32)
    D, H, W, C = vol.shape
    zz, yy, xx = np.meshgrid(np.arange(D), np.arange(H), np.arange(W),
                             indexing="ij")
    grid = jnp.asarray(np.stack([
        _norm_coord(xx, W), _norm_coord(yy, H), _norm_coord(zz, D)
    ], axis=-1), jnp.float32)
    out = grid_sample_3d(vol, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-5)


def test_grid_sample_3d_known_shift_warps_pattern():
    """Warping by exactly one voxel in +x reproduces a shifted pattern —
    the 'warp a known pattern by a known flow' check."""
    vol = np.zeros((1, 1, 8, 1), np.float32)
    vol[0, 0, 3, 0] = 1.0
    vol = jnp.asarray(vol)
    W = 8
    xs = np.arange(W)
    # sample position x+1: output[x] = vol[x+1] -> peak moves to x=2
    grid = jnp.asarray(np.stack([
        _norm_coord(xs + 1.0, W), np.full(W, _norm_coord(0, 1)),
        np.full(W, _norm_coord(0, 1))
    ], axis=-1), jnp.float32)[None, None]
    out = np.asarray(grid_sample_3d(vol, grid))[0, 0, :, 0]
    expected = np.zeros(8)
    expected[2] = 1.0
    np.testing.assert_allclose(out, expected, atol=1e-5)
    # out-of-range samples are zero-padded
    assert out[-1] == 0.0


def test_grid_sample_3d_trilinear_midpoint():
    vol = np.zeros((2, 1, 1, 1), np.float32)
    vol[1] = 4.0
    grid = jnp.asarray([[[[0.0, 0.0, 0.0]]]], jnp.float32)  # midpoint in z
    out = float(grid_sample_3d(jnp.asarray(vol), grid)[0, 0, 0, 0])
    assert out == pytest.approx(2.0, abs=1e-5)


def test_occupancy_flow_aggregation_trains():
    """Full det+occ+flow-aggregation model: one train step produces finite
    losses incl. loss_flow, with multi-frame occ GT."""
    from apollo_vision_net_tpu.configs import bev_smoke_det_occ_flow
    from apollo_vision_net_tpu.data.synthetic import make_batch
    from apollo_vision_net_tpu.parallel import train as train_lib

    cfg = bev_smoke_det_occ_flow()
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, 1, seed=0))
    T = cfg.model.queue_length
    vox = cfg.model.occ_zdim * cfg.model.occ_xdim * cfg.model.occ_ydim
    assert batch["gt_occupancy"].shape == (1, T, vox)
    assert batch["gt_flow"].shape == (1, T, vox, 2)

    state = train_lib.init_state(cfg, jax.random.PRNGKey(0), batch)
    # aggregation params exist
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("forward_flow" in n for n in names), sorted(names)[:20]
    assert any("backward_flow" in n for n in names)

    import jax.sharding as shd
    mesh = shd.Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "sp"))
    jstep = train_lib.make_jitted_train_step(mesh, cfg)
    from apollo_vision_net_tpu.parallel.mesh import shard_batch_pytree
    sb = shard_batch_pytree(mesh, batch)
    state2, losses = jstep(state, sb, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["loss_total"])), losses
    assert "loss_flow" in losses and np.isfinite(float(losses["loss_flow"]))
    assert np.isfinite(float(losses["loss_occupancy"]))


def test_sparse_flow_to_dense():
    from apollo_vision_net_tpu.data.semantic_kitti import sparse_flow_to_dense

    occ = np.array([[3, 1], [7, 5]])
    flow = np.array([[0.5, -1.0], [2.0, 0.25]], np.float32)
    dense = sparse_flow_to_dense(occ, flow, voxel_num=10)
    assert dense.shape == (10, 2)
    np.testing.assert_allclose(dense[3], [0.5, -1.0])
    np.testing.assert_allclose(dense[7], [2.0, 0.25])
    assert dense[[0, 1, 2, 4, 5, 6, 8, 9]].sum() == 0.0
