"""3D trilinear MSDA vs torch 3D grid_sample."""
import numpy as np

from apollo_vision_net_tpu.ops.msda3d import ms_deform_attn_3d


def torch_msda3d_reference(value, spatial_shapes, locs, attn):
    import torch
    import torch.nn.functional as F

    value = torch.from_numpy(value)
    locs = torch.from_numpy(locs)
    attn = torch.from_numpy(attn)
    B, V, H, Dh = value.shape
    _, Q, _, L, P, _ = locs.shape
    start = 0
    sampled = []
    for lvl, (d, h, w) in enumerate(spatial_shapes):
        v = value[:, start:start + d * h * w]
        start += d * h * w
        v = v.permute(0, 2, 3, 1).reshape(B * H, Dh, d, h, w)
        grid = 2.0 * locs[:, :, :, lvl] - 1.0  # (B, Q, H, P, 3) xyz
        grid = grid.permute(0, 2, 1, 3, 4).reshape(B * H, 1, Q, P, 3)
        out = F.grid_sample(v, grid, mode="bilinear", padding_mode="zeros",
                            align_corners=False)  # (B*H, Dh, 1, Q, P)
        sampled.append(out[:, :, 0])
    stacked = torch.stack(sampled, dim=-2)  # (B*H, Dh, Q, L, P)
    w_ = attn.permute(0, 2, 1, 3, 4).reshape(B * H, 1, Q, L, P)
    out = (stacked * w_).sum(dim=(-2, -1))
    out = out.reshape(B, H, Dh, Q).permute(0, 3, 1, 2).reshape(B, Q, H * Dh)
    return out.numpy()


def test_msda3d_matches_torch():
    rng = np.random.default_rng(0)
    shapes = ((3, 5, 7), (2, 3, 4))
    B, H, Dh, Q, P = 2, 2, 4, 11, 3
    V = sum(d * h * w for d, h, w in shapes)
    value = rng.standard_normal((B, V, H, Dh)).astype(np.float32)
    locs = rng.uniform(-0.2, 1.2, (B, Q, H, 2, P, 3)).astype(np.float32)
    attn = rng.random((B, Q, H, 2, P)).astype(np.float32)
    got = np.asarray(ms_deform_attn_3d(value, shapes, locs, attn))
    want = torch_msda3d_reference(value, shapes, locs, attn)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
