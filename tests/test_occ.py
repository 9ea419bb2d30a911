"""Occupancy head + losses: shapes, lovász parity vs torch-style reference,
multi-task loss gradients."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from apollo_vision_net_tpu.losses import occ_loss as ol
from apollo_vision_net_tpu.losses.det_loss import DetGT
from apollo_vision_net_tpu.losses.multitask import det_occ_loss
from apollo_vision_net_tpu.models.heads.occ_head import (
    BEVFormerOccupancyHead,
    occupancy_prediction,
)


def lovasz_reference(probs, labels, ignore=255):
    """Straightforward numpy reimplementation of lovász-softmax ('present')."""
    valid = labels != ignore
    probs, labels = probs[valid], labels[valid]
    C = probs.shape[1]
    losses = []
    for c in range(C):
        fg = (labels == c).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - probs[:, c])
        order = np.argsort(-errors, kind="stable")
        e, f = errors[order], fg[order]
        gts = f.sum()
        inter = gts - np.cumsum(f)
        union = gts + np.cumsum(1 - f)
        jac = 1.0 - inter / union
        jac[1:] = jac[1:] - jac[:-1]
        losses.append((e * jac).sum())
    return np.mean(losses)


def test_lovasz_matches_reference_with_ignore():
    rng = np.random.default_rng(0)
    M, C = 500, 6
    logits = rng.standard_normal((M, C)).astype(np.float32)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    labels = rng.integers(0, C, M)
    labels[rng.random(M) < 0.2] = 255
    got = float(ol.lovasz_softmax(
        jnp.asarray(probs), jnp.asarray(labels), jnp.asarray(labels != 255)
    ))
    want = lovasz_reference(probs.astype(np.float64), labels)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_occ_losses_finite():
    rng = np.random.default_rng(1)
    M, C = 400, 17
    logits = jnp.asarray(rng.standard_normal((M, C)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, C, M))
    valid = jnp.asarray(rng.random(M) < 0.9)
    probs = jax.nn.softmax(logits, axis=-1)
    for v in [
        ol.occupancy_focal_loss(logits, labels, valid,
                                class_weights=jnp.asarray(
                                    ol.balanced_class_weights(C))),
        ol.ce_ssc_loss(logits, labels, valid,
                       jnp.asarray(ol.balanced_class_weights(C))),
        ol.geo_scal_loss(probs, labels, valid, empty_idx=C - 1),
        ol.sem_scal_loss(probs, labels, valid),
    ]:
        assert np.isfinite(float(v)), v


@pytest.fixture(scope="module")
def occ_head_outs():
    B, N, H, W = 1, 2, 64, 96
    head = BEVFormerOccupancyHead(
        bev_h=8, bev_w=8, num_query=24, num_classes=10, embed_dims=32,
        img_shape=(H, W), num_cams=N, encoder_layers=1, decoder_layers=2,
        feedforward_channels=64, group_detr=2,
        occupancy_classes=16, occ_xdim=32, occ_ydim=32, occ_zdim=4,
        occ_dims=16,
    )
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.standard_normal((B, N, 2, 3, 32)), jnp.float32)]
    can_bus = jnp.asarray(rng.standard_normal((B, 18)), jnp.float32)
    l2i = jnp.asarray(rng.standard_normal((B, N, 4, 4)), jnp.float32)
    prev = jnp.zeros((B, 64, 32))
    inputs = dict(can_bus=can_bus, lidar2img=l2i, prev_bev=prev,
                  has_prev=jnp.zeros((B,)))
    variables = head.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats, **inputs, deterministic=False,
    )
    outs = head.apply(variables, feats, **inputs, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    return head, outs


def test_occ_head_shapes(occ_head_outs):
    head, outs = occ_head_outs
    assert outs["occupancy_preds"].shape == (1, 4 * 32 * 32, 16)
    # train mode: full grouped query set
    assert outs["all_cls_scores"].shape[2] == 24
    assert np.isfinite(np.asarray(outs["occupancy_preds"])).all()


def test_det_occ_loss_and_prediction(occ_head_outs):
    head, outs = occ_head_outs
    rng = np.random.default_rng(2)
    G = 4
    gt = DetGT(
        boxes=jnp.asarray(rng.uniform(-10, 10, (1, G, 9)), jnp.float32)
        .at[..., 3:6].set(2.0),
        labels=jnp.asarray(rng.integers(0, 10, (1, G))),
        mask=jnp.asarray([[True, True, False, False]]),
    )
    vox = head.voxel_num
    gt_occ = rng.integers(0, 17, (1, vox))  # includes empty (=16)
    gt_occ[0, :10] = 255  # some ignored
    losses = det_occ_loss(
        outs, gt, jnp.asarray(gt_occ),
        occupancy_classes=16, group_detr=2,
        occ_grid_hw=(32, 32), occ_zdim=4,
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    assert float(losses["loss_occupancy"]) > 0

    dense = occupancy_prediction(outs["occupancy_preds"])
    assert dense.shape == (1, vox)
    assert int(dense.max()) <= 16
