"""Native host-ops vs numpy pipeline parity."""
import numpy as np
import pytest

from apollo_vision_net_tpu.data import native
from apollo_vision_net_tpu.data.pipeline import (

    IMG_MEAN,
    IMG_STD,
    normalize_images,
    pad_images,
    scale_images,
)


pytestmark = pytest.mark.quick  # numpy/interpret tier, no big jit graphs


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_resize_normalize_pad_matches_numpy():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 64, 96, 3), np.uint8)
    got = native.resize_normalize_pad(imgs, 0.5, IMG_MEAN, IMG_STD, 32)
    want = normalize_images(imgs.astype(np.float32))
    l2i = np.eye(4, dtype=np.float32)[None].repeat(2, 0)
    want, _ = scale_images(want, l2i, 0.5)
    want = pad_images(want, 32)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_voxelize_points():
    pts = np.array([
        [0.25, 0.25, 0.25, 2.0],
        [0.26, 0.26, 0.26, 2.0],
        [0.27, 0.24, 0.23, 5.0],   # minority in the same voxel
        [1.5, 0.5, 0.5, 7.0],      # different voxel
        [99.0, 0.0, 0.0, 1.0],     # out of range
    ], np.float32)
    dense = native.voxelize_points(
        pts, pc_range=(0, 0, 0, 2, 1, 1), voxel_size=(0.5, 0.5, 0.5),
        dims=(4, 2, 2), num_classes=16, empty_label=16,
    )
    assert dense.shape == (2 * 4 * 2,)
    # voxel (z=0, y=0, x=0) -> index 0: majority label 2
    assert dense[0] == 2
    # voxel (z=1, x=3, y=1): point (1.5, .5, .5) -> z=1,x=3,y=1
    # index = (z*ydim + y)*xdim + x — the reference's x-minor layout
    idx = (1 * 2 + 1) * 4 + 3
    assert dense[idx] == 7
    assert (dense == 16).sum() == 16 - 2