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
