"""grid_sample_2d / rotate_2d parity with torch."""
import numpy as np
import pytest

from apollo_vision_net_tpu.ops.grid_sample import grid_sample_2d, rotate_2d

pytestmark = pytest.mark.quick  # numpy/interpret tier, no big jit graphs


def test_grid_sample_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    img = rng.standard_normal((7, 11, 3)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, (5, 9, 2)).astype(np.float32)

    got = np.asarray(grid_sample_2d(img, grid))
    want = F.grid_sample(
        torch.from_numpy(img).permute(2, 0, 1)[None],
        torch.from_numpy(grid)[None],
        mode="bilinear", padding_mode="zeros", align_corners=False,
    )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_rotate_identity():
    rng = np.random.default_rng(1)
    img = rng.standard_normal((16, 16, 4)).astype(np.float32)
    out = np.asarray(rotate_2d(img, np.float32(0.0)))
    np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-5)


def test_rotate_90_matches_rot90():
    rng = np.random.default_rng(2)
    img = rng.standard_normal((12, 12, 2)).astype(np.float32)
    out = np.asarray(rotate_2d(img, np.float32(90.0)))
    # CCW rotate by 90° of an image: row i of output comes from column i
    want = np.rot90(img, k=1, axes=(0, 1))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)
