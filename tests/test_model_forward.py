"""Golden-shape forward smoke test (analog of the reference's
tools/smoke_det_map_forward_train.py + debug_shapes_v1mini.py)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from apollo_vision_net_tpu.models.detector import BEVFormer
from apollo_vision_net_tpu.models.heads.det_head import BEVFormerHead


@pytest.fixture(scope="module")
def tiny_model_and_inputs():
    B, T, N, H, W = 1, 2, 2, 64, 96
    head = BEVFormerHead(
        bev_h=8, bev_w=8, num_query=12, num_classes=10, embed_dims=32,
        img_shape=(H, W), num_cams=N, num_feature_levels=1,
        encoder_layers=1, decoder_layers=2, feedforward_channels=64,
    )
    model = BEVFormer(head=head, embed_dims=32, neck_num_outs=1)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((B, T, N, H, W, 3)).astype(np.float32)
    can_bus = rng.standard_normal((B, T, 18)).astype(np.float32)
    # plausible pinhole lidar2img
    l2i = np.zeros((B, T, N, 4, 4), np.float32)
    fx = 50.0
    for n in range(N):
        K = np.array([[fx, 0, W / 2, 0], [0, fx, H / 2, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
        yaw = 2 * np.pi * n / N
        R = np.eye(4, dtype=np.float32)
        R[:3, :3] = np.array(
            [[np.cos(yaw), -np.sin(yaw), 0],
             [0, 0, -1],
             [np.sin(yaw), np.cos(yaw), 0]], np.float32)
        l2i[:, :, n] = K @ R
    has_prev = np.array([[0.0, 1.0]], np.float32)
    inputs = dict(img=jnp.asarray(img), can_bus=jnp.asarray(can_bus),
                  lidar2img=jnp.asarray(l2i), has_prev=jnp.asarray(has_prev))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, **inputs, deterministic=True
    )
    return model, params, inputs


def test_forward_shapes(tiny_model_and_inputs):
    model, params, inputs = tiny_model_and_inputs
    outs = model.apply(params, **inputs, deterministic=True)
    assert outs["bev_embed"].shape == (1, 64, 32)
    assert outs["all_cls_scores"].shape == (2, 1, 12, 10)
    assert outs["all_bbox_preds"].shape == (2, 1, 12, 10)
    for v in outs.values():
        assert np.isfinite(np.asarray(v)).all()


def test_forward_train_mode_runs(tiny_model_and_inputs):
    model, params, inputs = tiny_model_and_inputs
    outs = model.apply(
        params, **inputs, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1),
              "grid_mask": jax.random.PRNGKey(2)},
    )
    assert np.isfinite(np.asarray(outs["all_bbox_preds"])).all()


def test_streaming_inference_carries_state(tiny_model_and_inputs):
    model, params, inputs = tiny_model_and_inputs
    img0 = inputs["img"][:, 0]
    prev0 = jnp.zeros((1, 64, 32))
    outs0, bev0 = model.apply(
        params, img0, inputs["can_bus"][:, 0], inputs["lidar2img"][:, 0],
        prev0, jnp.zeros((1,)), method=BEVFormer.forward_test_frame,
    )
    outs1, bev1 = model.apply(
        params, inputs["img"][:, 1], inputs["can_bus"][:, 1],
        inputs["lidar2img"][:, 1], bev0, jnp.ones((1,)),
        method=BEVFormer.forward_test_frame,
    )
    assert bev0.shape == bev1.shape == (1, 64, 32)
    assert not np.allclose(np.asarray(outs0["all_cls_scores"]),
                           np.asarray(outs1["all_cls_scores"]))


def test_dla_s2d_stem_exact():
    """The space-to-depth stem (ops/s2d.py) is an exact algebraic rewrite:
    same parameter tree, same outputs as the direct-conv stem."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from apollo_vision_net_tpu.models.dla import DLA

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 96, 3)), jnp.float32)
    m_direct = DLA(out_indices=(0, 1, 3, 4, 5), stem_s2d=False)
    m_s2d = DLA(out_indices=(0, 1, 3, 4, 5), stem_s2d=True)
    params = m_direct.init(jax.random.PRNGKey(0), x)
    jax.tree.map(  # identical trees -> s2d path accepts direct-path params
        lambda a, b: None, params, m_s2d.init(jax.random.PRNGKey(0), x))
    outs_d = m_direct.apply(params, x)
    outs_s = m_s2d.apply(params, x)
    for od, os_ in zip(outs_d, outs_s):
        np.testing.assert_allclose(np.asarray(od), np.asarray(os_),
                                   rtol=2e-4, atol=2e-4)


def test_tsa_block_perm_path_matches_row_major():
    """The large-grid TSA block-reorder path (perm -> msda -> inv_perm) is
    numerically identical to the row-major path — exercised on CPU where
    both routes resolve to the exact XLA msda, so any mismatch is a bug in
    the permutation plumbing itself. Grid 16x16 with q_tile=64 picks 8x8
    spatial blocks (both dividing), the same selection the 200x200 base
    BEV makes."""
    from apollo_vision_net_tpu.models.attention import TemporalSelfAttention

    bh = bw = 16
    Q, B, C = bh * bw, 2, 32
    rng = np.random.default_rng(3)
    query = jnp.asarray(rng.standard_normal((B, Q, C)), jnp.float32)
    value = jnp.asarray(rng.standard_normal((B, 2, Q, C)), jnp.float32)
    qpos = jnp.asarray(rng.standard_normal((B, Q, C)), jnp.float32)
    ys = (np.arange(bh) + 0.5) / bh
    xs = (np.arange(bw) + 0.5) / bw
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    ref = np.stack([gx.reshape(-1), gy.reshape(-1)], -1)[None, None, :, None]
    ref = jnp.asarray(np.tile(ref, (B, 2, 1, 1, 1)), jnp.float32)

    outs = []
    for qt in (64, 32):  # 64 -> block perm path, 32 -> row-major path
        tsa = TemporalSelfAttention(embed_dims=C, num_heads=4, q_tile=qt)
        params = tsa.init(
            {"params": jax.random.PRNGKey(0)}, query, value,
            query_pos=qpos, reference_points=ref,
            spatial_shapes=((bh, bw),), deterministic=True)
        outs.append(np.asarray(tsa.apply(
            params, query, value, query_pos=qpos, reference_points=ref,
            spatial_shapes=((bh, bw),), deterministic=True)))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-5, atol=2e-5)
