"""MapTRv2: decoupled decoder head + o2o/o2m loss."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from apollo_vision_net_tpu.losses.map_loss import map_loss_v2
from apollo_vision_net_tpu.models.heads.map_head_v2 import BEVFormerDetMapHeadV2
from tests.test_map import PC, make_map_gt


@pytest.fixture(scope="module")
def v2_head_outs():
    B, N = 1, 2
    head = BEVFormerDetMapHeadV2(
        bev_h=8, bev_w=8, num_query=12, num_classes=10, embed_dims=32,
        img_shape=(64, 96), num_cams=N, encoder_layers=1, decoder_layers=2,
        feedforward_channels=64, pc_range=PC,
        num_vec_one2one=4, num_vec_one2many=8, map_num_pts=4,
        map_decoder_layers=2,
    )
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.standard_normal((B, N, 2, 3, 32)), jnp.float32)]
    inputs = dict(
        can_bus=jnp.asarray(rng.standard_normal((B, 18)), jnp.float32),
        lidar2img=jnp.asarray(rng.standard_normal((B, N, 4, 4)), jnp.float32),
        prev_bev=jnp.zeros((B, 64, 32)),
        has_prev=jnp.zeros((B,)),
    )
    variables = head.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats, **inputs, deterministic=False)
    outs_train = head.apply(variables, feats, **inputs, deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(2)})
    outs_eval = head.apply(variables, feats, **inputs, deterministic=True)
    return head, outs_train, outs_eval


def test_v2_query_split(v2_head_outs):
    head, outs_train, outs_eval = v2_head_outs
    # training: o2o + o2m queries; eval: o2o only
    assert outs_train["map_all_cls_scores"].shape == (2, 1, 12, 3)
    assert outs_eval["map_all_cls_scores"].shape == (2, 1, 4, 3)
    assert outs_train["bev_seg_logits"].shape == (1, 8, 8)
    assert outs_train["pv_seg_logits"].shape == (1, 2, 2, 3)


def test_v2_loss(v2_head_outs):
    head, outs_train, _ = v2_head_outs
    gt = make_map_gt(B=1, V=3, O=4, P=4, n_real=2, seed=1)
    rng = np.random.default_rng(3)
    losses = map_loss_v2(
        outs_train["map_all_cls_scores"], outs_train["map_all_pts_preds"],
        gt, pc_range=PC, num_vec_one2one=4, k_one2many=2,
        lambda_one2many=0.5,
        bev_seg_logits=outs_train["bev_seg_logits"],
        gt_bev_seg=jnp.asarray(rng.integers(0, 2, (1, 8, 8))),
        pv_seg_logits=outs_train["pv_seg_logits"],
        gt_pv_seg=jnp.asarray(rng.integers(0, 2, (1, 2, 2, 3))),
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    assert "loss_map_cls_one2many" in losses
    assert losses["loss_map_bev_seg"] > 0
