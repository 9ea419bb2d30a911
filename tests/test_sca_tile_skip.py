"""SCA spatial blocking + camera-tile skipping correctness."""
import numpy as np
import jax
import jax.numpy as jnp

from apollo_vision_net_tpu.models.attention import SpatialCrossAttention
from apollo_vision_net_tpu.ops.msda_pallas import _msda_pallas_fwd_impl
from apollo_vision_net_tpu.utils.geometry import spatial_block_order


def test_block_order_is_bijection():
    perm, inv = spatial_block_order(50, 50)
    assert sorted(perm.tolist()) == list(range(2500))
    np.testing.assert_array_equal(perm[inv], np.arange(2500))
    # locality: first tile of 128 spans few distinct 8-rows
    ys = perm[:128] // 50
    assert ys.max() - ys.min() <= 16


def test_masked_pallas_interpret():
    rng = np.random.default_rng(0)
    B, H, D, P = 2, 4, 8, 2
    ss = ((6, 9),)
    Q = 200  # padded to 256 -> 2 tiles
    V = 54
    value = jnp.asarray(rng.standard_normal((B, V, H, D)), jnp.float32)
    locs = jnp.asarray(rng.uniform(0, 1, (B, Q, H, 1, P, 2)), jnp.float32)
    attn = jnp.asarray(rng.random((B, Q, H, 1, P)), jnp.float32)
    full = _msda_pallas_fwd_impl(value, ss, locs, attn, interpret=True)
    ones = jnp.ones((B, 2), jnp.int32)
    same = _msda_pallas_fwd_impl(value, ss, locs, attn, interpret=True,
                                 tile_mask=ones)
    np.testing.assert_allclose(np.asarray(full), np.asarray(same), atol=1e-6)
    # zero out batch 1's first tile -> those outputs zero, rest untouched
    m = ones.at[1, 0].set(0)
    part = _msda_pallas_fwd_impl(value, ss, locs, attn, interpret=True,
                                 tile_mask=m)
    part = np.asarray(part)
    assert (part[1, :128] == 0).all()
    np.testing.assert_allclose(part[0], np.asarray(full)[0], atol=1e-6)
    np.testing.assert_allclose(part[1, 128:], np.asarray(full)[1, 128:],
                               atol=1e-6)


def test_sca_block_permutation_is_transparent():
    """bev_hw blocking must not change SCA output (XLA path ignores the
    tile mask; the permutation must round-trip exactly)."""
    rng = np.random.default_rng(1)
    B, N, Q, C, Dz = 1, 2, 64, 32, 2
    V = 12
    kwargs = dict(embed_dims=C, num_cams=N, num_heads=4, num_points=4)
    query = jnp.asarray(rng.standard_normal((B, Q, C)), jnp.float32)
    value = jnp.asarray(rng.standard_normal((B, N, V, C)), jnp.float32)
    ref = jnp.asarray(rng.uniform(0, 1, (N, B, Q, Dz, 2)), jnp.float32)
    mask = jnp.asarray(rng.random((N, B, Q, Dz)) < 0.5)
    common = dict(query_pos=None, reference_points_cam=ref, bev_mask=mask,
                  spatial_shapes=((3, 4),))

    m1 = SpatialCrossAttention(bev_hw=None, msda_impl="xla", **kwargs)
    p = m1.init(jax.random.PRNGKey(0), query, value, **common)
    out1 = m1.apply(p, query, value, **common)
    m2 = SpatialCrossAttention(bev_hw=(8, 8), msda_impl="xla", **kwargs)
    out2 = m2.apply(p, query, value, **common)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=2e-5, atol=2e-5)
