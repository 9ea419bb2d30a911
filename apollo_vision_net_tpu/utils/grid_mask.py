"""GridMask image augmentation (traced, static shapes).

Parity: models/utils/grid_mask.py — GridMask(True, True, rotate=1,
offset=False, ratio=0.5, mode=1, prob=0.7) as used by every detector
(detectors/bevformer.py:52). rotate=1 means randint(1)==0: no rotation.
mode=1 keeps the stripe union and zeroes the rest: the kept region is
``((i + off) % d) < l`` per axis, union over h/w stripes.

The stripe pattern in the reference is drawn on a 1.5× canvas then
center-cropped; with modular arithmetic that's just a phase offset, which is
already uniform — so we draw the phase directly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_mask(
    rng: jax.Array,
    x: jnp.ndarray,            # (..., h, w, c)
    ratio: float = 0.5,
    prob: float = 0.7,
) -> jnp.ndarray:
    h, w = x.shape[-3], x.shape[-2]
    k_apply, k_d, k_sh, k_sw = jax.random.split(rng, 4)
    d = jax.random.randint(k_d, (), 2, h)
    l = jnp.clip((d * ratio + 0.5).astype(jnp.int32), 1, d - 1)
    st_h = jax.random.randint(k_sh, (), 0, d)
    st_w = jax.random.randint(k_sw, (), 0, d)
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    keep_h = ((rows - st_h) % d) < l   # stripe rows (kept under mode=1)
    keep_w = ((cols - st_w) % d) < l
    keep = keep_h[:, None] | keep_w[None, :]          # (h, w)
    apply = jax.random.uniform(k_apply, ()) <= prob
    mask = jnp.where(apply, keep.astype(x.dtype), jnp.ones((h, w), x.dtype))
    return x * mask[..., :, :, None]
