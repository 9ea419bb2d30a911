"""DCNv3 (deformable convolution v3) — the InternImage core operator.

Parity: the reference's in-repo native op
(bevformer/backbones/ops_dcnv3/src/, CUDA im2col; pure-torch reference
``dcnv3_core_pytorch`` in ops_dcnv3/functions/dcnv3_func.py:19-63): for each
output pixel p0, each of G groups samples K=kh·kw points at
``p0 + dilation·k_offset + Δp_k`` with bilinear/zeros semantics, weighted by
softmaxed modulation masks, over group channels.

TPU-first: DCNv3's sampling IS multi-scale deformable attention with L=1
level, P=K points and heads=G — so the op reuses the framework's MSDA
machinery (patch-gather / Pallas kernel), not a CUDA translation.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from apollo_vision_net_tpu.ops.msda import ms_deform_attn


def _kernel_grid(kh: int, kw: int, dil_h: int, dil_w: int) -> np.ndarray:
    """(K, 2) kernel offsets in pixels (x, y), centered."""
    ys = (np.arange(kh) - (kh - 1) / 2.0) * dil_h
    xs = (np.arange(kw) - (kw - 1) / 2.0) * dil_w
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    return np.stack([gx.reshape(-1), gy.reshape(-1)], -1).astype(np.float32)


def dcnv3_core(
    value: jnp.ndarray,    # (B, H, W, G, Dg) input features (post in-proj)
    offset: jnp.ndarray,   # (B, H, W, G, K, 2) learned offsets in pixels (x, y)
    mask: jnp.ndarray,     # (B, H, W, G, K) modulation, already softmaxed
    kernel: Tuple[int, int] = (3, 3),
    dilation: Tuple[int, int] = (1, 1),
    impl: str = "auto",
) -> jnp.ndarray:
    """Returns (B, H, W, G·Dg) sampled features (stride-1, same padding)."""
    B, H, W, G, Dg = value.shape
    K = kernel[0] * kernel[1]
    grid = _kernel_grid(kernel[0], kernel[1], dilation[0], dilation[1])

    # base sampling positions: own pixel center in [0,1] coords
    ys = (np.arange(H, dtype=np.float32) + 0.5) / H
    xs = (np.arange(W, dtype=np.float32) + 0.5) / W
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    p0 = jnp.asarray(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))  # (Q,2)
    Q = H * W
    norm = jnp.asarray([W, H], jnp.float32)

    locs = (
        p0[None, :, None, None, :]                             # (1,Q,1,1,2)
        + (jnp.asarray(grid)[None, None, None] +               # kernel grid
           offset.reshape(B, Q, G, K, 2)) / norm
    )  # (B, Q, G, K, 2)
    locs = locs[:, :, :, None, :, :]                           # L=1 level
    attn = mask.reshape(B, Q, G, 1, K)
    v = value.reshape(B, Q, G, Dg)
    out = ms_deform_attn(
        v, ((H, W),),
        locs.astype(jnp.float32), attn.astype(jnp.float32), impl=impl,
    )  # (B, Q, G*Dg)
    return out.reshape(B, H, W, G * Dg)


def modulated_deform_conv(
    x: jnp.ndarray,        # (B, H, W, C)
    offset: jnp.ndarray,   # (B, H, W, K, 2) pixel offsets (x, y)
    mask: jnp.ndarray,     # (B, H, W, K) sigmoid modulation
    weight: jnp.ndarray,   # (K, C, O) conv weights (kernel-major)
    kernel: Tuple[int, int] = (3, 3),
    dilation: Tuple[int, int] = (1, 1),
    stride: int = 1,
    impl: str = "auto",
    slab_rows: int | None = None,
    q_tile: int | None = None,
) -> jnp.ndarray:
    """DCNv2 (modulated deformable convolution), 'same' padding — the op
    mmdet's ResNet-DCN uses for the R101 'base' configs. ``offset``/``mask``
    are given at OUTPUT resolution (H//stride, W//stride), matching the
    stride of the offset-predicting conv; sampling centers sit at
    ``(i·stride, j·stride)`` like torch's stride-s deform_conv2d with
    padding (k-1)/2.

    TPU-first: bilinear sampling is linear in the pixel values, so it
    commutes EXACTLY with the per-tap channel projection. Apply the conv
    weights first — one MXU matmul ``x @ [W_1 .. W_K]`` in the trunk dtype
    producing K O-channel maps — then sample each projected map at its tap
    position via the framework's MSDA machinery (taps = heads, one point
    each, modulation as the attention weight) and sum over taps. Compared
    to gathering raw C-channel patches and contracting afterwards this cuts
    the gathered row width C/O-fold (4x at R101 stage 3) and moves the
    contraction from gathered rows onto the MXU, while keeping
    bilinear/zeros border semantics bit-consistent with the reference
    (``ops_dcnv3/functions/dcnv3_func.py`` grid_sample, mmdet DCNv2).
    Returns (B, H//stride, W//stride, O)."""
    import os

    # bisect/debug override (e.g. APOLLO_DCN_IMPL=xla): force the MSDA
    # implementation backing this op without touching callers
    impl = os.environ.get("APOLLO_DCN_IMPL", impl)
    B, H, W, C = x.shape
    K = kernel[0] * kernel[1]
    O = weight.shape[-1]
    Ho, Wo = offset.shape[1], offset.shape[2]
    Q = Ho * Wo
    grid = _kernel_grid(kernel[0], kernel[1], dilation[0], dilation[1])

    if q_tile is None:
        # larger tiles than the attention defaults: the DCN grids are
        # small (30x50 at R101 stage 3) and 26 blocks dispatch per frame,
        # so the per-program floor dominates — fewer, bigger programs win
        q_tile = int(os.environ.get("MSDA_DCN_QT", "128"))
    if slab_rows is None:
        # queries are row-major over the output grid: a q_tile-query tile
        # spans ceil(q_tile/Wo) output rows = stride x that in input rows;
        # learned offsets reach a few more (outliers take the kernel's
        # exact full-width fallback)
        slab_rows = stride * ((q_tile + Wo - 1) // Wo + 1) + 6

    ys, xs = np.meshgrid(np.arange(Ho, dtype=np.float32) * stride,
                         np.arange(Wo, dtype=np.float32) * stride,
                         indexing="ij")
    base = np.stack([xs.reshape(-1), ys.reshape(-1)], -1)  # (Q, 2) pixels
    pos = (
        jnp.asarray(base)[None, :, None, :]
        + jnp.asarray(grid)[None, None, :, :]
        + offset.reshape(B, Q, K, 2)
    )  # (B, Q, K, 2) absolute pixels
    norm = jnp.asarray([W, H], jnp.float32)
    loc01 = (pos.astype(jnp.float32) + 0.5) / norm  # (B, Q, K, 2) in [0,1]

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if impl in ("dense", "dense_fast") or (
        impl in ("auto", "auto_fast") and on_tpu
        and os.environ.get("APOLLO_DCN_DENSE", "1") != "0"
    ):
        from apollo_vision_net_tpu.ops.dcn_pallas import (
            dcn_dense, is_dense_profitable, _dcn_xla_ref)

        fast = impl.endswith("_fast") or x.dtype == jnp.bfloat16
        loc_flat = loc01.reshape(B, Q, K * 2)
        attn_flat = mask.reshape(B, Q, K).astype(jnp.float32)
        if on_tpu and is_dense_profitable(x, weight, fast):
            # dedicated dense-window kernel: samples the RAW C-channel
            # input (whole padded map VMEM-resident) and fuses the tap
            # projection — no K·O-wide HBM value, no XLA-patch fallback
            # on the stride-2 / 512-channel blocks (VERDICT r4 #3)
            out = dcn_dense(x, loc_flat, attn_flat,
                            weight.astype(x.dtype), fast, slab_rows)
            return out.reshape(B, Ho, Wo, O)
        if impl in ("dense", "dense_fast"):
            # explicit dense request off-TPU (tests): exact XLA composition
            return _dcn_xla_ref(
                x, loc_flat, attn_flat, weight.astype(x.dtype)
            ).reshape(B, Ho, Wo, O)

    if impl == "auto" and x.dtype == jnp.bfloat16:
        # bf16 trunk: ride the kernel's fast mode — halves the operand so
        # R101 stage-3 grids (30x50 x 9 taps x 256ch) fit the VMEM gate and
        # take the Pallas slab kernel instead of the XLA patch fallback
        impl = "auto_fast"

    # z[b,v,k,:] = x[b,v,:] @ W_k  — (C, K*O) matmul, MXU-friendly
    z = (x.reshape(B, H * W, C) @ weight.transpose(1, 0, 2).reshape(C, K * O)
         ).reshape(B, H * W, K, O)

    locs = loc01[:, :, :, None, None, :]
    attn = mask.reshape(B, Q, K, 1, 1).astype(jnp.float32)
    out = ms_deform_attn(z, ((H, W),), locs, attn, impl=impl,
                         slab_rows=slab_rows, q_tile=q_tile)  # (B, Q, K*O)
    return out.reshape(B, Q, K, O).sum(2).reshape(B, Ho, Wo, O)
