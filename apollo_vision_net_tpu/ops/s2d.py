"""Space-to-depth convolution rewrites for MXU-hostile stem layers.

The DLA/ResNet stems run 7×7/3×3 convolutions with 3–32 channels at full
image resolution (480×800). On TPU those map terribly onto the 128×128 MXU
(≤12% operand utilization) and force XLA into layout-shuffle copies that
dominate the backbone's runtime (measured: ~4 ms/frame of pure `copy` ops
around the stem at the flagship config).

The rewrite is an EXACT algebraic transformation (no approximation, no new
parameters): express the image in 2×2 space-to-depth form (H/2, W/2, 4C)
and rebuild the conv kernel so that

  stride-1 k×k conv  ->  ceil((k+1)/2)² conv over (4·Cin) -> (4·Cout)
                         channels, outputs in s2d form;
  stride-2 k×k conv  ->  ceil((k+1)/2)² conv over (4·Cin) -> Cout,
                         outputs at the stride-2 (= s2d) resolution.

Channel counts rise 4×, spatial extent falls 4× — identical FLOPs modulo
kernel zero padding, but ~16× better MXU operand utilization and layouts
XLA keeps without copies.

Weight layout contract: the stored parameter keeps nn.Conv's HWIO shape
(k, k, Cin, Cout), so checkpoints are interchangeable with the direct path.

s2d channel order: (row_parity, col_parity, channel), i.e. index
(a*2 + b)*C + c — the natural order of ``reshape/transpose`` below.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/r, W/r, r²·C), channel order (ra, rb, c)."""
    B, H, W, C = x.shape
    assert H % r == 0 and W % r == 0, (H, W, r)
    x = x.reshape(B, H // r, r, W // r, r, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // r, W // r, r * r * C)


def depth_to_space(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    B, H2, W2, C4 = x.shape
    C = C4 // (r * r)
    x = x.reshape(B, H2, W2, r, r, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H2 * r, W2 * r, C)


def _expand_kernel_axis(w: jnp.ndarray, axis: int, k: int, pad: int,
                        parities: Tuple[int, ...]):
    """For each output parity a, build the padded/reshaped view giving
    W[du, ra, ...] such that tap u contributes at s2d offset du with input
    parity ra. Returns (stacked over parities along a new leading axis,
    du_min, U2)."""
    t_lo_all = min(a - pad for a in parities)
    t_hi_all = max(a + k - 1 - pad for a in parities)
    # align to even so t -> (du, ra) is a clean reshape
    t_lo_even = (t_lo_all // 2) * 2
    T = t_hi_all - t_lo_even + 1
    T = ((T + 1) // 2) * 2
    du_min = t_lo_even // 2
    U2 = T // 2
    outs = []
    for a in parities:
        start = (a - pad) - t_lo_even
        pads = [(0, 0)] * w.ndim
        pads[axis] = (start, T - k - start)
        wp = jnp.pad(w, pads)
        shape = list(wp.shape)
        shape[axis:axis + 1] = [U2, 2]
        outs.append(wp.reshape(shape))
    return jnp.stack(outs, axis=0), du_min, U2


def s2d_conv(x2: jnp.ndarray, w: jnp.ndarray, *, stride: int, pad: int,
             dtype=None) -> jnp.ndarray:
    """Compute the full-resolution k×k conv (stride 1 or 2, zero padding
    `pad`) directly on the s2d form ``x2`` of the input.

    x2: (B, H/2, W/2, 4·Cin); w: (k, k, Cin, Cout) full-res HWIO weights.
    Returns s2d-form (B, H/2, W/2, 4·Cout) for stride 1, or plain
    (B, H/2, W/2, Cout) for stride 2 (even H, W assumed).
    """
    assert stride in (1, 2)
    k, k2, Cin, Cout = w.shape
    assert k == k2, (k, k2)
    parities = (0, 1) if stride == 1 else (0,)

    # rows: (A, U2, 2, k, Cin, Cout)
    wr, du_min, U2 = _expand_kernel_axis(w, 0, k, pad, parities)
    # cols on the result: axis now 3 (after U2, ra)
    wrc, dv_min, V2 = _expand_kernel_axis(wr, 3, k, pad, parities)
    # wrc: (Bpar, Apar, U2, 2, V2, 2, Cin, Cout) with leading axes (b, a)
    # reorder -> (U2, V2, ra, rb, Cin, a, b, Cout) then merge
    wrc = wrc.transpose(2, 4, 3, 5, 6, 1, 0, 7)
    A = len(parities)
    W2 = wrc.reshape(U2, V2, 4 * Cin, A * A * Cout)

    if dtype is not None:
        x2 = x2.astype(dtype)
        W2 = W2.astype(dtype)
    pad_h = (-du_min, U2 - 1 + du_min)
    pad_w = (-dv_min, V2 - 1 + dv_min)
    y = jax.lax.conv_general_dilated(
        x2, W2, window_strides=(1, 1), padding=(pad_h, pad_w),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y  # s2d-form (4·Cout) for s1; (Cout) for s2


def s2d_entry_conv(x: jnp.ndarray, w: jnp.ndarray, *, pad: int,
                   dtype=None) -> jnp.ndarray:
    """Stride-1 k×k conv + 2×2 space-to-depth packing of the OUTPUT,
    fused into ONE stride-2 (k+1)×(k+1) conv on the raw image.

    The four output phases (a, b) of the s2d packing are four
    phase-shifted applications of the same kernel, so stacking
    ``pad(w, [(a, 1-a), (b, 1-b)])`` over phases along the output-channel
    axis turns the whole stem entry into a single native stride-2 conv —
    no explicit image transpose. (The naive cast→reshape→transpose chain
    cost a measured ~1.9 ms/frame of layout copies on the 6×480×800
    flagship input; XLA lowers resnet-stem-shaped strided convs without
    any.) Output: (B, H/2, W/2, 4·Cout) in s2d channel order (a, b, f).
    """
    k, k2, Cin, Cout = w.shape
    assert k == k2 and pad == (k - 1) // 2, (k, k2, pad)
    phases = [
        jnp.pad(w, [(a, 1 - a), (b, 1 - b), (0, 0), (0, 0)])
        for a in (0, 1) for b in (0, 1)
    ]
    K = jnp.stack(phases, axis=-2)                  # (k+1, k+1, Cin, 4, Cout)
    K = K.reshape(k + 1, k + 1, Cin, 4 * Cout)
    if dtype is not None:
        x = x.astype(dtype)
        K = K.astype(dtype)
    return jax.lax.conv_general_dilated(
        x, K, window_strides=(2, 2),
        padding=((pad, pad + 1), (pad, pad + 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class S2DEntryConv(nn.Module):
    """Stem-entry module: raw image in, s2d-form activations out — same
    parameter name/shape ('kernel', HWIO) as the direct-path nn.Conv."""

    features: int
    kernel_size: int
    in_channels: int
    pad: int = 0
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, self.in_channels,
             self.features),
        )
        return s2d_entry_conv(x, w, pad=self.pad, dtype=self.dtype)


class S2DConv(nn.Module):
    """Drop-in replacement for a stem ``nn.Conv`` (use_bias=False): same
    parameter name/shape ('kernel', HWIO), same math, s2d in/out."""

    features: int
    kernel_size: int
    in_channels: int
    stride: int = 1
    pad: int = 0
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x2: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, self.in_channels,
             self.features),
        )
        return s2d_conv(x2, w, stride=self.stride, pad=self.pad,
                        dtype=self.dtype)


def apply_channelwise_s2d(fn, y2: jnp.ndarray) -> jnp.ndarray:
    """Apply a per-channel module (e.g. FrozenBatchNorm with C params) to an
    s2d tensor whose channels are (parity, C) blocks."""
    B, H2, W2, C4 = y2.shape
    y = y2.reshape(B, H2, W2, 4, C4 // 4)
    return fn(y).reshape(B, H2, W2, C4)
