"""Detection loss: assignment sanity + gradient flow."""
import numpy as np
import jax
import jax.numpy as jnp

from apollo_vision_net_tpu.losses.det_loss import DetGT, det_loss
from apollo_vision_net_tpu.utils.box_coder import normalize_bbox


def make_gt(B=2, G=5, n_real=(3, 0)):
    rng = np.random.default_rng(0)
    boxes = np.zeros((B, G, 9), np.float32)
    boxes[..., 3:6] = 1.0  # safe sizes for padded rows
    labels = np.zeros((B, G), np.int64)
    mask = np.zeros((B, G), bool)
    for b in range(B):
        k = n_real[b]
        boxes[b, :k, :3] = rng.uniform(-40, 40, (k, 3))
        boxes[b, :k, 3:6] = rng.uniform(0.5, 4, (k, 3))
        boxes[b, :k, 6] = rng.uniform(-np.pi, np.pi, k)
        labels[b, :k] = rng.integers(0, 10, k)
        mask[b, :k] = True
    return DetGT(jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(mask))


def test_loss_finite_and_empty_gt_ok():
    rng = np.random.default_rng(1)
    L, B, Q, C = 2, 2, 30, 10
    cls = jnp.asarray(rng.standard_normal((L, B, Q, C)), jnp.float32)
    box = jnp.asarray(rng.standard_normal((L, B, Q, 10)), jnp.float32)
    gt = make_gt(B=B, n_real=(3, 0))  # second sample has zero GT
    losses = jax.jit(lambda c, b: det_loss(c, b, gt))(cls, box)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    assert float(losses["loss_total"]) > 0


def test_perfect_prediction_has_low_bbox_loss():
    rng = np.random.default_rng(2)
    B, Q, C = 1, 20, 10
    gt = make_gt(B=B, G=5, n_real=(4,))
    gt_norm = normalize_bbox(gt.boxes)  # (B, G, 10)
    box = jnp.asarray(rng.standard_normal((1, B, Q, 10)), jnp.float32)
    # plant exact GT boxes at queries 3, 7, 11, 15
    plant = jnp.array([3, 7, 11, 15])
    box = box.at[0, 0, plant].set(gt_norm[0, :4])
    cls = jnp.full((1, B, Q, C), -8.0, jnp.float32)
    cls = cls.at[0, 0, plant, gt.labels[0, :4]].set(8.0)
    losses = det_loss(cls, box, gt)
    assert float(losses["loss_bbox"]) < 1e-4
    # classification loss should be near the background-only floor
    assert float(losses["loss_cls"]) < 0.05


def test_gradients_flow():
    rng = np.random.default_rng(3)
    L, B, Q, C = 1, 1, 15, 10
    cls = jnp.asarray(rng.standard_normal((L, B, Q, C)), jnp.float32)
    box = jnp.asarray(rng.standard_normal((L, B, Q, 10)), jnp.float32)
    gt = make_gt(B=B, G=4, n_real=(2,))

    g_cls, g_box = jax.grad(
        lambda c, b: det_loss(c, b, gt)["loss_total"], argnums=(0, 1)
    )(cls, box)
    assert np.isfinite(np.asarray(g_cls)).all()
    assert np.isfinite(np.asarray(g_box)).all()
    assert float(jnp.abs(g_cls).sum()) > 0
    assert float(jnp.abs(g_box).sum()) > 0
