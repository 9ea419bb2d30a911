"""Microbenchmark MSDA implementations on real model shapes (run on TPU)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from apollo_vision_net_tpu.ops.msda import ms_deform_attn_xla
from apollo_vision_net_tpu.ops.msda_pallas import _msda_pallas_fwd_impl


def ms_deform_attn_rowgather(value, spatial_shapes, locs, attn):
    """Row-gather variant: gather full (H*D)-wide rows (lane-aligned) with
    per-head index selection folded into the weighted sum."""
    B, V, H, D = value.shape
    _, Q, _, L, P, _ = locs.shape
    starts = np.concatenate([[0], np.cumsum([h * w for h, w in spatial_shapes])])
    v_rows = value.reshape(B, V, H * D)
    out = jnp.zeros((B, Q, H, D), jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        v_l = jax.lax.slice_in_dim(v_rows, int(starts[lvl]), int(starts[lvl + 1]), axis=1)
        loc = locs[:, :, :, lvl]          # (B, Q, H, P, 2)
        aw = attn[:, :, :, lvl]           # (B, Q, H, P)
        px = loc[..., 0] * w - 0.5
        py = loc[..., 1] * h - 0.5
        x0 = jnp.floor(px); y0 = jnp.floor(py)
        fx = px - x0; fy = py - y0
        x0 = x0.astype(jnp.int32); y0 = y0.astype(jnp.int32)
        for p in range(P):
            for cx, cy, cw in ((0, 0, (1 - fx) * (1 - fy)), (1, 0, fx * (1 - fy)),
                               (0, 1, (1 - fx) * fy), (1, 1, fx * fy)):
                ix = x0[:, :, :, p] + cx  # (B, Q, H)
                iy = y0[:, :, :, p] + cy
                valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
                idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
                wgt = (cw[:, :, :, p] * valid * aw[:, :, :, p]).astype(jnp.float32)
                # use head-0 indices? NO — per head. gather per head of full rows
                # is wasteful; instead gather with head-0..H-1 indices stacked:
                g = jnp.take_along_axis(
                    v_l, idx.reshape(B, Q * H)[..., None], axis=1
                ).reshape(B, Q, H, H, D)
                # select diagonal head block: (B, Q, H, D)
                hidx = jnp.arange(H)
                g = g[:, :, hidx, hidx, :]
                out = out + g.astype(jnp.float32) * wgt[..., None]
    return out.reshape(B, Q, H * D)


def ms_deform_attn_sharedrow(value, spatial_shapes, locs, attn):
    """Variant that gathers (H*D) rows once per (q,p,corner) using per-head
    indices flattened into the row axis, then einsum-selects heads."""
    B, V, H, D = value.shape
    _, Q, _, L, P, _ = locs.shape
    starts = np.concatenate([[0], np.cumsum([h * w for h, w in spatial_shapes])])
    out = jnp.zeros((B, Q, H, D), jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        v_l = jax.lax.slice_in_dim(value, int(starts[lvl]), int(starts[lvl + 1]), axis=1)
        v_l = v_l.reshape(B, -1, H, D)
        loc = locs[:, :, :, lvl]
        aw = attn[:, :, :, lvl]
        px = loc[..., 0] * w - 0.5
        py = loc[..., 1] * h - 0.5
        x0 = jnp.floor(px); y0 = jnp.floor(py)
        fx = px - x0; fy = py - y0
        x0 = x0.astype(jnp.int32); y0 = y0.astype(jnp.int32)
        for p in range(P):
            for cx, cy, cw in ((0, 0, (1 - fx) * (1 - fy)), (1, 0, fx * (1 - fy)),
                               (0, 1, (1 - fx) * fy), (1, 1, fx * fy)):
                ix = x0[:, :, :, p] + cx
                iy = y0[:, :, :, p] + cy
                valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
                idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
                wgt = (cw[:, :, :, p] * valid * aw[:, :, :, p]).astype(jnp.float32)
                # gather (B, Q, H, D): per-head rows from (B, V, H, D) where
                # the head axis is part of the row → idx*H + h flattened
                flat = v_l.reshape(B, -1, D)  # (B, V*H, D)
                hofs = jnp.arange(H)[None, None, :]
                gidx = idx * H + hofs  # (B, Q, H)
                g = jnp.take_along_axis(
                    flat, gidx.reshape(B, Q * H)[..., None], axis=1
                ).reshape(B, Q, H, D)
                out = out + g.astype(jnp.float32) * wgt[..., None]
    return out.reshape(B, Q, H * D)


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def make(B, V_shapes, Q, H, D, P, seed=0):
    rng = np.random.default_rng(seed)
    V = sum(h * w for h, w in V_shapes)
    L = len(V_shapes)
    value = jnp.asarray(rng.standard_normal((B, V, H, D)), jnp.float32)
    locs = jnp.asarray(rng.uniform(0, 1, (B, Q, H, L, P, 2)), jnp.float32)
    attn = jnp.asarray(rng.random((B, Q, H, L, P)), jnp.float32)
    return value, V_shapes, locs, attn


def run(name, shapes):
    value, ss, locs, attn = make(*shapes)
    xla = jax.jit(functools.partial(ms_deform_attn_xla, spatial_shapes=ss))
    f_xla = lambda v, l, a: xla(v, sampling_locations=l, attention_weights=a)
    t_xla = timeit(jax.jit(lambda v, l, a: ms_deform_attn_xla(v, ss, l, a)), value, locs, attn)
    t_row = timeit(jax.jit(lambda v, l, a: ms_deform_attn_sharedrow(v, ss, l, a)), value, locs, attn)
    try:
        t_pal = timeit(jax.jit(lambda v, l, a: _msda_pallas_fwd_impl(v, ss, l, a)), value, locs, attn)
    except Exception as e:
        t_pal = float("nan")
    print(f"{name}: xla={t_xla:.2f}ms sharedrow={t_row:.2f}ms pallas={t_pal:.2f}ms")


if __name__ == "__main__":
    import os
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    # TSA tiny-det: B=2 (queue), V=40000 (bev 200x200), Q=40000, P=4
    run("TSA 200x200", (2, ((200, 200),), 40000, 8, 32, 4))
    # decoder: B=1, V=40000, Q=900, P=4
    run("DEC 200x200", (1, ((200, 200),), 900, 8, 32, 4))
    # SCA tiny-det: B=6 cams, V=375 (15x25), Q=40000, P=8
    run("SCA 15x25x6", (6, ((15, 25),), 40000, 8, 32, 8))
