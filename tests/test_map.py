"""Map head + MapTR loss tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from apollo_vision_net_tpu.losses.map_loss import MapGT, map_loss, normalize_pts
from apollo_vision_net_tpu.models.heads.map_head import (
    BEVFormerDetMapHead,
    get_map_results,
)

PC = (-15.0, -30.0, -5.0, 15.0, 30.0, 3.0)


def make_map_gt(B=1, V=6, O=4, P=10, n_real=3, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.zeros((B, V, O, P, 2), np.float32)
    labels = np.zeros((B, V), np.int32)
    mask = np.zeros((B, V), bool)
    order_mask = np.zeros((B, V, O), bool)
    for b in range(B):
        for v in range(n_real):
            base = np.cumsum(rng.uniform(-1, 1, (P, 2)), axis=0) * 2
            base = base - base.mean(0)
            pts[b, v, 0] = base
            pts[b, v, 1] = base[::-1]  # flipped order (polyline protocol)
            labels[b, v] = rng.integers(0, 3)
            mask[b, v] = True
            order_mask[b, v, :2] = True
    return MapGT(jnp.asarray(pts), jnp.asarray(labels), jnp.asarray(mask),
                 jnp.asarray(order_mask))


def test_map_loss_finite_and_grads():
    rng = np.random.default_rng(1)
    L, B, Q, C, P = 2, 1, 8, 3, 10
    cls = jnp.asarray(rng.standard_normal((L, B, Q, C)), jnp.float32)
    pts = jnp.asarray(rng.uniform(0, 1, (L, B, Q, P, 2)), jnp.float32)
    gt = make_map_gt(B=B, P=P)
    losses = jax.jit(lambda c, p: map_loss(c, p, gt, pc_range=PC))(cls, pts)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    g = jax.grad(lambda c, p: map_loss(c, p, gt, pc_range=PC)["loss_map_total"],
                 argnums=(0, 1))(cls, pts)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)


def test_map_loss_perfect_pred_low():
    """Planting the GT (in any admissible order) at some queries should give
    near-zero pts/dir loss."""
    rng = np.random.default_rng(2)
    B, Q, C, P = 1, 8, 3, 10
    gt = make_map_gt(B=B, P=P, n_real=2)
    gt01 = np.asarray(normalize_pts(gt.shift_pts, PC))
    pts = rng.uniform(0.3, 0.7, (1, B, Q, P, 2)).astype(np.float32)
    # plant gt vec 0 (order 1!) at query 2, gt vec 1 (order 0) at query 5
    pts[0, 0, 2] = gt01[0, 0, 1]
    pts[0, 0, 5] = gt01[0, 1, 0]
    cls = np.full((1, B, Q, C), -8.0, np.float32)
    cls[0, 0, 2, int(gt.labels[0, 0])] = 8.0
    cls[0, 0, 5, int(gt.labels[0, 1])] = 8.0
    losses = map_loss(jnp.asarray(cls), jnp.asarray(pts), gt, pc_range=PC)
    assert float(losses["loss_map_pts"]) < 1e-4
    assert float(losses["loss_map_dir"]) < 1e-5
    assert float(losses["loss_map_cls"]) < 0.05


@pytest.fixture(scope="module")
def map_head_outs():
    B, N = 1, 2
    head = BEVFormerDetMapHead(
        bev_h=8, bev_w=8, num_query=12, num_classes=10, embed_dims=32,
        img_shape=(64, 96), num_cams=N, encoder_layers=1, decoder_layers=2,
        feedforward_channels=64, pc_range=PC,
        num_map_vec=5, map_num_pts=4, map_decoder_layers=2,
    )
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.standard_normal((B, N, 2, 3, 32)), jnp.float32)]
    inputs = dict(
        can_bus=jnp.asarray(rng.standard_normal((B, 18)), jnp.float32),
        lidar2img=jnp.asarray(rng.standard_normal((B, N, 4, 4)), jnp.float32),
        prev_bev=jnp.zeros((B, 64, 32)),
        has_prev=jnp.zeros((B,)),
    )
    variables = head.init({"params": jax.random.PRNGKey(0)}, feats, **inputs)
    outs = head.apply(variables, feats, **inputs)
    return head, outs


def test_map_head_shapes(map_head_outs):
    head, outs = map_head_outs
    assert outs["map_all_cls_scores"].shape == (2, 1, 5, 3)
    assert outs["map_all_pts_preds"].shape == (2, 1, 5, 4, 2)
    pts = np.asarray(outs["map_all_pts_preds"])
    assert (pts >= 0).all() and (pts <= 1).all()
    # det trunk still intact
    assert outs["all_cls_scores"].shape == (2, 1, 12, 10)


def test_get_map_results(map_head_outs):
    head, outs = map_head_outs
    res = get_map_results(
        outs["map_all_cls_scores"][-1], outs["map_all_pts_preds"][-1], PC
    )
    v = np.asarray(res["vectors"])
    assert v.shape == (1, 5, 4, 2)
    assert (v[..., 0] >= PC[0] - 1e-5).all() and (v[..., 0] <= PC[3] + 1e-5).all()
    assert res["scores"].shape == (1, 5)


def test_pts_cost_variants():
    import jax.numpy as jnp
    from apollo_vision_net_tpu.losses.map_loss import _pts_cost

    rng = np.random.default_rng(5)
    pred = jnp.asarray(rng.uniform(0, 1, (3, 4, 2)), jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (2, 2, 4, 2)), jnp.float32)
    for t in ("l1", "smooth_l1", "chamfer"):
        d = _pts_cost(pred, gt, t)
        assert d.shape == (3, 2, 2)
        assert np.isfinite(np.asarray(d)).all()
    # chamfer is order-invariant: flipping a gt ordering leaves cost equal
    gtf = gt[:, ::-1]
    np.testing.assert_allclose(
        np.asarray(_pts_cost(pred, gt, "chamfer").min(-1)),
        np.asarray(_pts_cost(pred, gtf, "chamfer").min(-1)), atol=1e-6)


def test_map_loss_chamfer_cost_runs():
    rng = np.random.default_rng(6)
    L, B, Q, C, P = 1, 1, 8, 3, 10
    cls = jnp.asarray(rng.standard_normal((L, B, Q, C)), jnp.float32)
    pts = jnp.asarray(rng.uniform(0, 1, (L, B, Q, P, 2)), jnp.float32)
    gt = make_map_gt(B=B, P=P)
    losses = map_loss(cls, pts, gt, pc_range=PC, pts_cost_type="chamfer")
    assert np.isfinite(float(losses["loss_map_total"]))
