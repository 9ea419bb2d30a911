"""DCNv3 core vs an independent torch grid_sample implementation (the
strategy of the reference's ops_dcnv3/test.py)."""
import numpy as np

from apollo_vision_net_tpu.ops.dcnv3 import dcnv3_core


def torch_dcnv3_reference(value, offset, mask, kernel=(3, 3)):
    import torch
    import torch.nn.functional as F

    B, H, W, G, Dg = value.shape
    K = kernel[0] * kernel[1]
    v = torch.from_numpy(value).permute(0, 3, 4, 1, 2).reshape(
        B * G, Dg, H, W)
    ys = (np.arange(kernel[0]) - (kernel[0] - 1) / 2.0)
    xs = (np.arange(kernel[1]) - (kernel[1] - 1) / 2.0)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    kgrid = np.stack([gx.reshape(-1), gy.reshape(-1)], -1)  # (K, 2) px
    py, px = np.meshgrid(np.arange(H) + 0.5, np.arange(W) + 0.5,
                         indexing="ij")
    base = np.stack([px.reshape(-1), py.reshape(-1)], -1)  # (Q, 2) pixels
    # absolute sample positions in pixels
    pos = base[None, :, None, None, :] + kgrid[None, None, None] + \
        offset.reshape(B, H * W, G, K, 2)
    # to [-1, 1] grid coords (align_corners=False)
    gridx = 2.0 * pos[..., 0] / W - 1.0
    gridy = 2.0 * pos[..., 1] / H - 1.0
    grid = torch.from_numpy(
        np.stack([gridx, gridy], -1).astype(np.float32))
    grid = grid.permute(0, 2, 1, 3, 4).reshape(B * G, H * W, K, 2)
    sampled = F.grid_sample(v, grid, mode="bilinear", padding_mode="zeros",
                            align_corners=False)  # (B*G, Dg, Q, K)
    m = torch.from_numpy(mask).reshape(B, H * W, G, K).permute(
        0, 2, 1, 3).reshape(B * G, 1, H * W, K)
    out = (sampled * m).sum(-1)  # (B*G, Dg, Q)
    out = out.reshape(B, G, Dg, H * W).permute(0, 3, 1, 2).reshape(
        B, H, W, G * Dg)
    return out.numpy()


def test_dcnv3_matches_torch():
    rng = np.random.default_rng(0)
    B, H, W, G, Dg = 2, 6, 9, 2, 4
    K = 9
    value = rng.standard_normal((B, H, W, G, Dg)).astype(np.float32)
    offset = rng.normal(0, 1.5, (B, H, W, G, K, 2)).astype(np.float32)
    mask = rng.random((B, H, W, G, K)).astype(np.float32)
    mask /= mask.sum(-1, keepdims=True)
    got = np.asarray(dcnv3_core(value, offset, mask, impl="xla"))
    want = torch_dcnv3_reference(value, offset, mask)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_modulated_deform_conv_matches_torch():
    import torch
    import torch.nn.functional as F

    from apollo_vision_net_tpu.ops.dcnv3 import modulated_deform_conv

    rng = np.random.default_rng(1)
    B, H, W, C, O = 1, 5, 7, 4, 6
    K = 9
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    offset = rng.normal(0, 1.0, (B, H, W, K, 2)).astype(np.float32)
    mask = rng.random((B, H, W, K)).astype(np.float32)
    weight = rng.standard_normal((K, C, O)).astype(np.float32)

    got = np.asarray(modulated_deform_conv(x, offset, mask, weight))

    # torch reference via grid_sample
    v = torch.from_numpy(x).permute(0, 3, 1, 2)  # (B, C, H, W)
    ys, xs = np.meshgrid(np.arange(3) - 1, np.arange(3) - 1, indexing="ij")
    kgrid = np.stack([xs.reshape(-1), ys.reshape(-1)], -1)
    py, px = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    base = np.stack([px.reshape(-1), py.reshape(-1)], -1)
    pos = base[None, :, None, :] + kgrid[None, None] + \
        offset.reshape(B, H * W, K, 2)
    gx = 2 * (pos[..., 0] + 0.5) / W - 1
    gy = 2 * (pos[..., 1] + 0.5) / H - 1
    grid = torch.from_numpy(np.stack([gx, gy], -1).astype(np.float32))
    sampled = F.grid_sample(v, grid, mode="bilinear", padding_mode="zeros",
                            align_corners=False)  # (B, C, Q, K)
    sampled = sampled.permute(0, 2, 3, 1).numpy() * mask.reshape(
        B, H * W, K, 1)
    want = np.einsum("bqkc,kco->bqo", sampled, weight).reshape(B, H, W, O)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_modulated_deform_conv_stride2_matches_torch():
    """Stride-2 DCN (mmdet applies DCN to the stride-2 first block of a DCN
    stage too): offsets at output resolution, centers at (2i, 2j)."""
    import torch
    import torch.nn.functional as F

    from apollo_vision_net_tpu.ops.dcnv3 import modulated_deform_conv

    rng = np.random.default_rng(2)
    B, H, W, C, O = 1, 8, 6, 3, 5
    Ho, Wo = H // 2, W // 2
    K = 9
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    offset = rng.normal(0, 1.0, (B, Ho, Wo, K, 2)).astype(np.float32)
    mask = rng.random((B, Ho, Wo, K)).astype(np.float32)
    weight = rng.standard_normal((K, C, O)).astype(np.float32)

    got = np.asarray(
        modulated_deform_conv(x, offset, mask, weight, stride=2))
    assert got.shape == (B, Ho, Wo, O)

    v = torch.from_numpy(x).permute(0, 3, 1, 2)
    ys, xs = np.meshgrid(np.arange(3) - 1, np.arange(3) - 1, indexing="ij")
    kgrid = np.stack([xs.reshape(-1), ys.reshape(-1)], -1)
    py, px = np.meshgrid(np.arange(Ho) * 2, np.arange(Wo) * 2,
                         indexing="ij")
    base = np.stack([px.reshape(-1), py.reshape(-1)], -1)
    pos = base[None, :, None, :] + kgrid[None, None] + \
        offset.reshape(B, Ho * Wo, K, 2)
    gx = 2 * (pos[..., 0] + 0.5) / W - 1
    gy = 2 * (pos[..., 1] + 0.5) / H - 1
    grid = torch.from_numpy(np.stack([gx, gy], -1).astype(np.float32))
    sampled = F.grid_sample(v, grid, mode="bilinear", padding_mode="zeros",
                            align_corners=False)
    sampled = sampled.permute(0, 2, 3, 1).numpy() * mask.reshape(
        B, Ho * Wo, K, 1)
    want = np.einsum("bqkc,kco->bqo", sampled, weight).reshape(B, Ho, Wo, O)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _torch_mdc_reference(x, offset, mask, weight, stride=1):
    """Shared torch grid_sample reference (stride-aware)."""
    import torch
    import torch.nn.functional as F

    B, H, W, C = x.shape
    Ho, Wo = offset.shape[1], offset.shape[2]
    K = offset.shape[3]
    v = torch.from_numpy(x).permute(0, 3, 1, 2)
    ys, xs = np.meshgrid(np.arange(3) - 1, np.arange(3) - 1, indexing="ij")
    kgrid = np.stack([xs.reshape(-1), ys.reshape(-1)], -1)
    py, px = np.meshgrid(np.arange(Ho) * stride, np.arange(Wo) * stride,
                         indexing="ij")
    base = np.stack([px.reshape(-1), py.reshape(-1)], -1)
    pos = base[None, :, None, :] + kgrid[None, None] + \
        offset.reshape(B, Ho * Wo, K, 2)
    gx = 2 * (pos[..., 0] + 0.5) / W - 1
    gy = 2 * (pos[..., 1] + 0.5) / H - 1
    grid = torch.from_numpy(np.stack([gx, gy], -1).astype(np.float32))
    sampled = F.grid_sample(v, grid, mode="bilinear", padding_mode="zeros",
                            align_corners=False)
    sampled = sampled.permute(0, 2, 3, 1).numpy() * mask.reshape(
        B, Ho * Wo, K, 1)
    return np.einsum("bqkc,kco->bqo", sampled, weight).reshape(
        B, Ho, Wo, weight.shape[-1])


def _dense_case(rng, B=2, H=9, W=11, C=8, O=8, stride=1, off_std=1.0):
    Ho, Wo = H // stride, W // stride
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    offset = rng.normal(0, off_std, (B, Ho, Wo, 9, 2)).astype(np.float32)
    mask = rng.random((B, Ho, Wo, 9)).astype(np.float32)
    weight = rng.standard_normal((9, C, O)).astype(np.float32)
    return x, offset, mask, weight


def test_modulated_deform_conv_dense_xla_matches_torch():
    """impl='dense' off-TPU routes to the exact XLA composition that also
    backs the dense kernel's VJP — torch grid_sample parity."""
    from apollo_vision_net_tpu.ops.dcnv3 import modulated_deform_conv

    rng = np.random.default_rng(3)
    for stride in (1, 2):
        x, offset, mask, weight = _dense_case(rng, stride=stride)
        got = np.asarray(modulated_deform_conv(
            x, offset, mask, weight, stride=stride, impl="dense"))
        want = _torch_mdc_reference(x, offset, mask, weight, stride)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_dcn_dense_kernel_interpret_matches_torch():
    """The dedicated dense-window Pallas kernel (interpret mode) —
    including far offsets that trip the full-height fallback and a tail
    tile (Q % q_tile != 0)."""
    from apollo_vision_net_tpu.ops.dcn_pallas import _dcn_dense_fwd_impl
    from apollo_vision_net_tpu.ops.dcnv3 import _kernel_grid

    rng = np.random.default_rng(4)
    for stride, off_std in ((1, 1.0), (2, 1.0), (1, 6.0)):
        x, offset, mask, weight = _dense_case(
            rng, H=10, W=12, stride=stride, off_std=off_std)
        B, H, W, C = x.shape
        Ho, Wo = offset.shape[1], offset.shape[2]
        K = 9
        kgrid = _kernel_grid(3, 3, 1, 1)
        py, px = np.meshgrid(np.arange(Ho) * stride,
                             np.arange(Wo) * stride, indexing="ij")
        base = np.stack([px.reshape(-1), py.reshape(-1)], -1)
        pos = base[None, :, None, :] + kgrid[None, None] + \
            offset.reshape(B, Ho * Wo, K, 2)
        loc = ((pos + 0.5) / np.array([W, H], np.float32)).astype(np.float32)
        got = np.asarray(_dcn_dense_fwd_impl(
            x, loc.reshape(B, Ho * Wo, K * 2),
            mask.reshape(B, Ho * Wo, K), weight,
            fast=False, slab_rows=5, q_tile=32, interpret=True))
        want = _torch_mdc_reference(x, offset, mask, weight, stride)
        np.testing.assert_allclose(
            got.reshape(want.shape), want, rtol=1e-4, atol=1e-5)


def test_dcn_dense_grads_match_z_route():
    """dcn_dense's VJP (XLA composition) == the tap-projected MSDA route's
    grads on every differentiable input."""
    import jax
    import jax.numpy as jnp

    from apollo_vision_net_tpu.ops.dcnv3 import modulated_deform_conv

    rng = np.random.default_rng(5)
    x, offset, mask, weight = _dense_case(rng, B=1, H=6, W=7, C=4, O=5)

    def loss(impl, x, offset, mask, weight):
        out = modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), impl=impl)
        return (out * out).sum()

    g_dense = jax.grad(lambda *a: loss("dense", *a), argnums=(0, 1, 2, 3))(
        x, offset, mask, weight)
    g_z = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2, 3))(
        x, offset, mask, weight)
    for gd, gz in zip(g_dense, g_z):
        np.testing.assert_allclose(np.asarray(gd), np.asarray(gz),
                                   rtol=2e-3, atol=2e-4)
