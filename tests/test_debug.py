"""Debug-mode numerics probes (reference debug_nan system,
detectors/bevformer.py:111-151): inject a NaN and see the probe fire."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apollo_vision_net_tpu.utils import debug

pytestmark = pytest.mark.quick  # numpy/interpret tier, no big jit graphs


def test_probe_identity_and_stats():
    x = jnp.array([1.0, jnp.nan, 3.0, jnp.inf])
    with debug.capture_probes() as cap:
        y = jax.jit(lambda v: debug.probe("x", v) * 2.0)(x)
        jax.block_until_ready(y)
    # passthrough: finite lanes unchanged
    np.testing.assert_allclose(np.asarray(y)[[0, 2]], [2.0, 6.0])
    assert len(cap.records) == 1
    r = cap.records[0]
    assert r["name"] == "x"
    assert abs(r["finite_ratio"] - 0.5) < 1e-6
    assert r["max_abs"] == 3.0
    assert abs(r["mean"] - 2.0) < 1e-6


def test_probe_disabled_is_identity_no_records():
    sink: list = []
    x = jnp.ones((4,))
    y = debug.probe("quiet", x)  # probes not enabled
    np.testing.assert_allclose(np.asarray(y), 1.0)
    assert sink == []


def test_probe_fires_in_model_boundaries():
    """The planted call sites (backbone/neck/encoder) actually emit."""
    from apollo_vision_net_tpu.configs import bev_smoke_det
    from apollo_vision_net_tpu.data.synthetic import make_batch
    from apollo_vision_net_tpu.parallel.train import build_model, init_state

    cfg = bev_smoke_det()
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=1, seed=0))
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    model = build_model(cfg)
    with debug.capture_probes() as cap:
        outs = model.apply(
            {"params": state.params},
            batch["img"][:1], batch["can_bus"][:1], batch["lidar2img"][:1],
            batch["has_prev"][:1], deterministic=True,
        )
        jax.block_until_ready(outs)
    names = {r["name"] for r in cap.records}
    assert any(n.startswith("backbone.") for n in names), names
    assert any(n.startswith("neck.") for n in names), names
    assert "encoder.bev_embed" in names, names
    assert all(r["finite_ratio"] == 1.0 for r in cap.records)


def test_assert_all_finite_raises_on_nan():
    def bad(x):
        return {"ok": x + 1.0, "bad": x / jnp.zeros_like(x)}

    checked = debug.assert_all_finite(bad)
    with pytest.raises(Exception, match="non-finite"):
        checked(jnp.ones((3,)))
    # clean input through a clean fn passes
    out = debug.assert_all_finite(lambda x: {"ok": x * 2})(jnp.ones((3,)))
    np.testing.assert_allclose(np.asarray(out["ok"]), 2.0)


def test_sanitize():
    x = jnp.array([jnp.nan, jnp.inf, -jnp.inf, 5.0])
    y = np.asarray(debug.sanitize(x, limit=100.0))
    np.testing.assert_allclose(y, [0.0, 100.0, -100.0, 5.0])
