"""VoxelFormer head: forward shapes + finiteness + temporal carry."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from apollo_vision_net_tpu.models.voxel import (
    VoxelFormerOccupancyHead,
    voxel_reference_points_3d,
)


def test_voxel_reference_points():
    r = voxel_reference_points_3d(2, 3, 4, num_points_in_voxel=2)
    assert r.shape == (2, 24, 3)
    assert (r > 0).all() and (r < 1).all()
    c = voxel_reference_points_3d(2, 3, 4, 1)
    # first voxel center
    np.testing.assert_allclose(c[0, 0], [0.5 / 4, 0.5 / 3, 0.25], atol=1e-6)


@pytest.fixture(scope="module")
def voxel_outs():
    B, N = 1, 2
    head = VoxelFormerOccupancyHead(
        bev_h=6, bev_w=6, bev_z=2, num_query=12, num_classes=10,
        embed_dims=32, img_shape=(64, 96), num_cams=N,
        encoder_layers=1, decoder_layers=2, feedforward_channels=64,
        occupancy_classes=16, occ_xdim=12, occ_ydim=12, occ_zdim=4,
        occ_dims=16,
    )
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.standard_normal((B, N, 2, 3, 32)), jnp.float32)]
    inputs = dict(
        can_bus=jnp.asarray(rng.standard_normal((B, 18)), jnp.float32),
        lidar2img=jnp.asarray(rng.standard_normal((B, N, 4, 4)), jnp.float32),
        prev_bev=jnp.zeros((B, 2 * 6 * 6, 32)),
        has_prev=jnp.zeros((B,)),
    )
    variables = head.init({"params": jax.random.PRNGKey(0)}, feats, **inputs)
    outs = head.apply(variables, feats, **inputs)
    return head, variables, feats, inputs, outs


def test_voxel_head_shapes(voxel_outs):
    head, _, _, _, outs = voxel_outs
    assert outs["bev_embed"].shape == (1, 72, 32)
    assert outs["all_cls_scores"].shape == (2, 1, 12, 10)
    assert outs["occupancy_preds"].shape == (1, 4 * 12 * 12, 16)
    for k in ("bev_embed", "all_cls_scores", "occupancy_preds"):
        assert np.isfinite(np.asarray(outs[k])).all(), k


def test_voxel_temporal_carry(voxel_outs):
    head, variables, feats, inputs, outs = voxel_outs
    # feeding the produced voxel state as prev changes the output
    outs2 = head.apply(
        variables, feats,
        can_bus=inputs["can_bus"], lidar2img=inputs["lidar2img"],
        prev_bev=outs["bev_embed"], has_prev=jnp.ones((1,)),
    )
    assert not np.allclose(np.asarray(outs2["occupancy_preds"]),
                           np.asarray(outs["occupancy_preds"]))
