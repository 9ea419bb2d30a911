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
