"""HybridFormer cascade: shapes, carry contract, finiteness."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from apollo_vision_net_tpu.models.hybrid import HybridFormerOccupancyHead


@pytest.fixture(scope="module")
def hybrid_outs():
    B, N = 1, 2
    head = HybridFormerOccupancyHead(
        bev_h=6, bev_w=6, num_query=12, num_classes=10,
        embed_dims=32, img_shape=(64, 96), num_cams=N,
        decoder_layers=2, feedforward_channels=64,
        encoder_embed_dims=(32, 16, 8),
        feature_map_z=(1, 2, 4),
        occupancy_classes=16, occ_xdim=12, occ_ydim=12, occ_zdim=4,
        occ_dims=8,
    )
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.standard_normal((B, N, 2, 3, 32)), jnp.float32)]
    carry_w = (1 + 2 + 4) * 6 * 6
    inputs = dict(
        can_bus=jnp.asarray(rng.standard_normal((B, 18)), jnp.float32),
        lidar2img=jnp.asarray(rng.standard_normal((B, N, 4, 4)), jnp.float32),
        prev_bev=jnp.zeros((B, carry_w, 32)),
        has_prev=jnp.zeros((B,)),
    )
    variables = head.init({"params": jax.random.PRNGKey(0)}, feats, **inputs)
    outs = head.apply(variables, feats, **inputs)
    return head, variables, feats, inputs, outs


def test_hybrid_shapes(hybrid_outs):
    head, _, _, inputs, outs = hybrid_outs
    assert outs["bev_embed"].shape == inputs["prev_bev"].shape
    assert outs["all_cls_scores"].shape == (2, 1, 12, 10)
    assert outs["occupancy_preds"].shape == (1, 4 * 12 * 12, 16)
    for k in ("bev_embed", "all_cls_scores", "occupancy_preds"):
        assert np.isfinite(np.asarray(outs[k])).all(), k


def test_hybrid_temporal_carry(hybrid_outs):
    head, variables, feats, inputs, outs = hybrid_outs
    outs2 = head.apply(
        variables, feats,
        can_bus=inputs["can_bus"], lidar2img=inputs["lidar2img"],
        prev_bev=outs["bev_embed"], has_prev=jnp.ones((1,)),
    )
    assert not np.allclose(np.asarray(outs2["occupancy_preds"]),
                           np.asarray(outs["occupancy_preds"]))
