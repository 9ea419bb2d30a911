"""Attention modules of the BEV trunk and decoders (flax.linen).

Parity targets (reference file:line):
- TemporalSelfAttention: bevformer/modules/temporal_self_attention.py:24-289
- SpatialCrossAttention + MSDeformableAttention3D:
  bevformer/modules/spatial_cross_attention.py:28-403
- CustomMSDeformableAttention (decoder cross-attn):
  bevformer/modules/decoder.py:129-358

TPU-first deviations (documented in DEVIATIONS.md):
- SCA's data-dependent per-camera query rebatching (reference 136-165) is
  replaced by dense masked attention: every query attends in every camera,
  outputs are masked by pillar visibility and normalized by hit count —
  identical math, static shapes.
- TSA's queue handling stacks (bs, 2, ...) explicitly instead of the
  reference's interleaved ``bs*2`` fold, which silently mixes samples when
  bs > 1 (temporal_self_attention.py:203 takes ``value[:bs]``).

All modules are batch-first and keep softmax/attention math in fp32.

``dtype`` on every module is the ACTIVATION compute dtype (params stay
f32): bf16 halves the HBM traffic of the Dense/FFN/LayerNorm chain and
runs the projections as native MXU bf16 matmuls. Precision-critical
arithmetic is pinned to f32 regardless: softmax logits, sampling-location
accumulation (bf16's 8 mantissa bits would quantize normalized grid
coords by ~0.4 cell at 50x50), and the MSDA kernel's output accumulator.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from apollo_vision_net_tpu.ops.msda import ms_deform_attn

Shapes = Tuple[Tuple[int, int], ...]


def grid_offset_bias(num_heads: int, num_groups: int, num_points: int) -> np.ndarray:
    """mmcv's deformable-attention sampling_offsets bias init: 8 unit
    directions scaled by point index (temporal_self_attention.py:113-128)."""
    thetas = np.arange(num_heads, dtype=np.float64) * (2.0 * np.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (H, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, num_groups, num_points, 1))
    for i in range(num_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1).astype(np.float32)


def _xavier_uniform():
    return nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")


class TemporalSelfAttention(nn.Module):
    """Deformable self-attention over the 2-slot BEV queue [prev, cur]."""

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    num_bev_queue: int = 2
    dropout: float = 0.1
    attn_logits_clamp: Optional[float] = None
    msda_impl: str = "auto"
    # row-slab windowing for the Pallas kernel: BEV queries are row-major,
    # so a q_tile-query tile spans ~ceil(q_tile/bev_w)+1 grid rows; sampling
    # offsets add a few cells. Wide outliers fall back exactly.
    # q_tile: None = auto. Small grids (flagship, slab kernel) use 32 — the
    # scatter-mask build is VPU-bound at QT·S ops per point, and finer
    # tiles touch narrower row bands. Grids beyond VMEM residency (base
    # 200×200, window kernel) use 128 with 8×16 spatial block tiles: the
    # window kernel is program-dispatch bound (~4 µs/program; 2×1250
    # programs at qt=32 ≈ its whole 9.5 ms/call), and a compact 8×16 block
    # + offsets fits the same 24×32 window a 32-long row strip needed.
    use_slab: bool = True
    q_tile: Optional[int] = None
    dtype: object = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,          # (B, Q, C)
        value: jnp.ndarray,          # (B, 2, Q, C) = [prev, cur] per sample
        *,
        query_pos: Optional[jnp.ndarray],   # (B, Q, C)
        reference_points: jnp.ndarray,      # (B, 2, Q, L, 2) per-queue refs
        spatial_shapes: Shapes,             # ((bev_h, bev_w),)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        # bisect/debug override: force this module's MSDA implementation
        # (e.g. APOLLO_TSA_IMPL=xla_fast) without touching the config
        msda_impl = os.environ.get("APOLLO_TSA_IMPL", self.msda_impl)
        query = query.astype(self.dtype)
        value = value.astype(self.dtype)
        B, Q, C = query.shape
        H, L, P, NQ = self.num_heads, self.num_levels, self.num_points, self.num_bev_queue
        assert NQ == 2
        identity = query
        if query_pos is not None:
            query = query + query_pos.astype(self.dtype)

        qt = self.q_tile or int(os.environ.get(
            "APOLLO_TSA_QT", 128 if Q > 8192 else 32))
        perm = inv_perm = None
        (bh, bw) = spatial_shapes[0]
        if (qt >= 64 and Q == bh * bw
                and msda_impl.split("_")[0] in ("auto", "pallas")):
            # large-grid window-kernel path: reorder queries into spatial
            # blocks so each q_tile stays window-compact. The block shape
            # must EXACTLY tile the grid — with a ragged edge (e.g. 16∤200),
            # fixed-qt tiles would mix queries from distant blocks, dragging
            # the window center off and clamping ~1 tile per block-row
            # (silently wrong TSA values). Pick the largest exactly-dividing
            # (bh_blk, bw_blk) with product ≤ qt; fall back to row strips
            # when nothing ≥64 divides.
            # block + 4-cell offsets + bilinear must fit the 24×32 window:
            # bh_blk + 9 ≤ 24, bw_blk + 9 ≤ 32
            for cand_qt, bh_blk, bw_blk in (
                    (qt, 8, qt // 8), (64, 8, 8), (64, 4, 16)):
                if (cand_qt >= 64 and bh % bh_blk == 0
                        and bw % bw_blk == 0):
                    qt = cand_qt
                    break
            else:
                bh_blk = None
            if bh_blk is not None:
                from apollo_vision_net_tpu.utils.geometry import (
                    spatial_block_order,
                )

                perm_np, inv_np = spatial_block_order(bh, bw, bh_blk, bw_blk)
                perm, inv_perm = jnp.asarray(perm_np), jnp.asarray(inv_np)
                query = query[:, perm]
                value_q = value[:, 0][:, perm]
                reference_points = reference_points[:, :, perm]
            else:
                qt = 32
                value_q = value[:, 0]
        else:
            value_q = value[:, 0]

        # offsets/weights are predicted from [prev_bev_value, query] concat
        # (reference :203)
        q_in = jnp.concatenate([value_q, query], axis=-1)  # (B, Q, 2C)

        value_flat = value.reshape(B * NQ, Q, C)
        v = nn.Dense(C, kernel_init=_xavier_uniform(), dtype=self.dtype,
                     name="value_proj")(value_flat)
        v = v.reshape(B * NQ, Q, H, C // H)

        offsets = nn.Dense(
            NQ * H * L * P * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *_: jnp.asarray(
                grid_offset_bias(H, L * NQ, P)
            ),
            dtype=self.dtype,
            name="sampling_offsets",
        )(q_in).astype(jnp.float32).reshape(B, Q, H, NQ, L, P, 2)
        attn = nn.Dense(
            NQ * H * L * P,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention_weights",
        )(q_in).reshape(B, Q, H, NQ, L * P)
        if self.attn_logits_clamp is not None:
            attn = jnp.clip(attn, -self.attn_logits_clamp, self.attn_logits_clamp)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        attn = attn.reshape(B, Q, H, NQ, L, P)

        # fold queue into batch: (B*NQ, Q, H, L, P[,2])
        offsets = offsets.transpose(0, 3, 1, 2, 4, 5, 6).reshape(B * NQ, Q, H, L, P, 2)
        attn = attn.transpose(0, 3, 1, 2, 4, 5).reshape(B * NQ, Q, H, L, P)

        normalizer = np.array(
            [[w, h] for h, w in spatial_shapes], np.float32
        )  # (L, 2) in (x, y) order
        ref = reference_points.reshape(B * NQ, Q, L, 2)
        locations = (
            ref[:, :, None, :, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )

        slab = None
        if self.use_slab:
            # block tiles span bh_blk grid rows + sampling margin; row-major
            # tiles span ~qt/bev_w rows + margin
            slab = (min(bh + 2, bh_blk + 12) if perm is not None
                    else min(bh + 2, qt // max(bw, 1) + 12))
        # window=True: TSA's learned offsets are initialized within 4 cells
        # and stay spatially compact, so on grids beyond VMEM residency
        # (200x200 base BEV) the clamped block-window kernel is safe — the
        # explicit opt-in keeps wide-sampling callers (SCA) off that path
        out = ms_deform_attn(v, spatial_shapes, locations, attn,
                             impl=msda_impl, slab_rows=slab,
                             q_tile=qt, window=True)
        out = out.reshape(B, NQ, Q, C).mean(axis=1)
        if inv_perm is not None:
            out = out[:, inv_perm]
        out = nn.Dense(C, kernel_init=_xavier_uniform(), dtype=self.dtype,
                       name="output_proj")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out + identity


class MSDeformableAttention3D(nn.Module):
    """Inner deformable sampler of SCA: no output proj, offsets are spread
    over the pillar's z-anchors (spatial_cross_attention.py:364-376).

    ``query`` may carry a SMALLER batch than ``value`` (Bs | B, replication
    axis fast — SCA's (Bq, N_cam) fold): offsets/attention are predicted
    from the shared BEV query ONCE instead of per camera, and the kernel
    consumes the FACTORED operands (ref per camera, offsets/attn shared) —
    per-camera sampling locations are never materialized. At base-SCA
    scale the materialized per-camera (B, Qp, H·L·P·2) f32 pack transpose
    was ~0.5 GB of layout copies per encoder layer (~75 ms/frame traced).
    """

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 8  # total across z-anchors; must be divisible by D_z
    msda_impl: str = "auto"
    dtype: object = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,             # (Bs, Q, C), Bs | B
        value: jnp.ndarray,             # (B, V, C)
        *,
        reference_points: jnp.ndarray,  # (B, Q, D_z, 2) projected pillar pts
        spatial_shapes: Shapes,
        tile_mask: Optional[jnp.ndarray] = None,
        slab_rows: Optional[int] = None,
        q_tile: int = 128,
    ) -> jnp.ndarray:
        query = query.astype(self.dtype)
        value = value.astype(self.dtype)
        Bs, Q, C = query.shape
        H, L, P = self.num_heads, self.num_levels, self.num_points
        B, V = value.shape[0], value.shape[1]
        assert B % Bs == 0, (B, Bs)

        v = nn.Dense(C, kernel_init=_xavier_uniform(), dtype=self.dtype,
                     name="value_proj")(value)
        v = v.reshape(B, V, H, C // H)

        # RAW-CELL offsets: the Dense output is already in grid cells of
        # each level (grid_offset_bias init) — the 1/wh normalization is
        # folded into the kernel-side pack / materialization
        offsets = nn.Dense(
            H * L * P * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *_: jnp.asarray(grid_offset_bias(H, L, P)),
            dtype=self.dtype,
            name="sampling_offsets",
        )(query).astype(jnp.float32)  # (Bs, Q, H·L·P·2) FLAT
        attn = nn.Dense(
            H * L * P,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention_weights",
        )(query).reshape(Bs, Q, H, L * P)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        attn_flat = attn.reshape(Bs, Q, H * L * P)

        D_z = reference_points.shape[2]
        assert P % D_z == 0, (P, D_z)
        # ref[p] = ref_z[p % D_z] (ref :364-376's z-anchor spread): a tiny
        # (B, Q, P·2) tile — the full (B, Q, H·L·P·2) per-camera location
        # tensor is never built (see class docstring)
        ref_flat = jnp.tile(
            reference_points.astype(jnp.float32).reshape(B, Q, D_z * 2),
            (1, 1, P // D_z))

        out = ms_deform_attn(v, spatial_shapes, None, None,
                             impl=os.environ.get(
                                 "APOLLO_SCA_IMPL", self.msda_impl),
                             tile_mask=tile_mask,
                             slab_rows=slab_rows, q_tile=q_tile,
                             factored=(ref_flat, offsets, attn_flat))
        return out  # (B, Q, C) — caller owns masking/projection


class SpatialCrossAttention(nn.Module):
    """Image→BEV cross attention, dense-masked over cameras.

    With `bev_hw` set, queries are reordered into spatially-compact blocks
    and a per-(camera, query-tile) visibility mask lets the Pallas kernel
    skip invisible tiles — recovering the reference's per-camera rebatching
    savings (spatial_cross_attention.py:136-165) with static shapes.
    """

    embed_dims: int = 256
    num_cams: int = 6
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 8
    dropout: float = 0.1
    msda_impl: str = "auto"
    bev_hw: Optional[Tuple[int, int]] = None
    # None = auto per pyramid depth. Single-level (flagship): 32-query
    # tiles in 8x4 spatial blocks — the scatter-mask build is VPU-bound at
    # QT·S per point; smaller tiles skip more cameras (measured 52% -> 35%
    # active pairs at 64) and project narrower row bands (p50 15 -> 11
    # rows); swept 128/64/32/16, 32 is the flagship optimum. Multi-level
    # (base-scale) rides the transposed point-stacked kernel whose output
    # block puts QT in lanes -> 128 (measured 32.1 ms vs the chunk
    # kernel's 109.8 at qt=64 / 136.2 at qt=32, bev_base_occ SCA scale).
    q_tile: Optional[int] = None
    # image row-slab windowing: a spatially-compact BEV tile projects into
    # a band of camera rows; half the (padded) image height covers the vast
    # majority of tiles (outliers fall back exactly inside the kernel)
    use_slab: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,                 # (B, Q, C)
        value: jnp.ndarray,                 # (B, N_cam, V, C) image features
        *,
        query_pos: Optional[jnp.ndarray],
        reference_points_cam: jnp.ndarray,  # (N_cam, B, Q, D_z, 2)
        bev_mask: jnp.ndarray,              # (N_cam, B, Q, D_z) bool
        spatial_shapes: Shapes,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        query = query.astype(self.dtype)
        value = value.astype(self.dtype)
        B, Q, C = query.shape
        N = self.num_cams
        identity = query
        if query_pos is not None:
            query = query + query_pos.astype(self.dtype)

        ref_cam = reference_points_cam
        hit = jnp.any(bev_mask, axis=-1)  # (N, B, Q)
        qt = self.q_tile or int(os.environ.get(
            "APOLLO_SCA_QT", 128 if self.num_levels > 1 else 32))
        inv_perm = None
        tile_mask = None
        if self.bev_hw is not None and self.msda_impl.split("_")[0] in ("auto", "pallas"):
            from apollo_vision_net_tpu.utils.geometry import (
                spatial_block_order,
            )

            bh_blk = 8
            bw_blk = max(1, qt // bh_blk)
            perm, inv_perm = spatial_block_order(*self.bev_hw, bh_blk, bw_blk)
            perm = jnp.asarray(perm)
            inv_perm = jnp.asarray(inv_perm)
            query = query[:, perm]
            ref_cam = ref_cam[:, :, perm]
            hit = hit[:, :, perm]
            QT = qt
            Qp = (Q + QT - 1) // QT * QT
            hit_pad = jnp.pad(
                hit.transpose(1, 0, 2).reshape(B * N, Q),
                [(0, 0), (0, Qp - Q)],
            )
            tile_mask = hit_pad.reshape(B * N, Qp // QT, QT).any(-1)

        inner = MSDeformableAttention3D(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            num_levels=self.num_levels,
            num_points=self.num_points,
            msda_impl=self.msda_impl,
            dtype=self.dtype,
            name="deformable_attention",
        )
        # fold cameras into batch; the query is NOT broadcast — offsets and
        # attention are camera-invariant (the reference computes them from
        # the shared BEV query too), so the inner module predicts them once
        # (Bs = B) and the kernel consumes factored operands.
        v_cam = value.reshape(B * N, value.shape[2], C)
        ref = ref_cam.transpose(1, 0, 2, 3, 4).reshape(
            B * N, Q, ref_cam.shape[3], 2
        )
        slab = None
        if self.use_slab:
            # ~1/3 of the image height: an 8x4-cell BEV tile's pillar
            # projects a p50 ~10-row band (measured on real projection
            # geometry at q_tile=64); wide tiles fall back exactly.
            # Multi-level pyramids (base configs) get one slab per level —
            # the per-level row-slab kernel bounds the mask build to the
            # projected band of each level instead of its full grid
            if len(spatial_shapes) == 1:
                slab = max(8, (spatial_shapes[0][0] + 2 + 2) // 3)
            else:
                slab = tuple(max(8, (h + 4) // 3)
                             for (h, w) in spatial_shapes)
        out = inner(query, v_cam, reference_points=ref,
                    spatial_shapes=spatial_shapes, tile_mask=tile_mask,
                    slab_rows=slab, q_tile=qt)
        out = out.reshape(B, N, Q, C)

        hitf = hit.transpose(1, 0, 2).astype(out.dtype)  # (B, N, Q)
        out = (out * hitf[..., None]).sum(axis=1)
        count = jnp.clip(hitf.sum(axis=1), 1.0, None)
        out = out / count[..., None]
        if inv_perm is not None:
            out = out[:, inv_perm]

        out = nn.Dense(C, kernel_init=_xavier_uniform(), dtype=self.dtype,
                       name="output_proj")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out + identity


class CustomMSDeformableAttention(nn.Module):
    """Single-source deformable attention (det/map decoder cross-attn over
    BEV memory), mmcv-standard semantics (decoder.py:129-358)."""

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    dropout: float = 0.1
    msda_impl: str = "auto"
    dtype: object = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,             # (B, Q, C)
        value: jnp.ndarray,             # (B, V, C)
        *,
        query_pos: Optional[jnp.ndarray],
        reference_points: jnp.ndarray,  # (B, Q, 2) normalized
        spatial_shapes: Shapes,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        query = query.astype(self.dtype)
        value = value.astype(self.dtype)
        B, Q, C = query.shape
        H, L, P = self.num_heads, self.num_levels, self.num_points
        V = value.shape[1]
        identity = query
        if query_pos is not None:
            query = query + query_pos.astype(self.dtype)

        v = nn.Dense(C, kernel_init=_xavier_uniform(), dtype=self.dtype,
                     name="value_proj")(value)
        v = v.reshape(B, V, H, C // H)

        offsets = nn.Dense(
            H * L * P * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *_: jnp.asarray(grid_offset_bias(H, L, P)),
            dtype=self.dtype,
            name="sampling_offsets",
        )(query).astype(jnp.float32).reshape(B, Q, H, L, P, 2)
        attn = nn.Dense(
            H * L * P,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention_weights",
        )(query).reshape(B, Q, H, L * P)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        attn = attn.reshape(B, Q, H, L, P)

        normalizer = np.array([[w, h] for h, w in spatial_shapes], np.float32)
        locations = (
            reference_points.astype(jnp.float32)[:, :, None, None, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )
        out = ms_deform_attn(v, spatial_shapes, locations, attn, impl=self.msda_impl)
        out = nn.Dense(C, kernel_init=_xavier_uniform(), dtype=self.dtype,
                       name="output_proj")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out + identity


class MultiheadAttention(nn.Module):
    """Standard MHA with residual + dropout (decoder self-attention)."""

    embed_dims: int = 256
    num_heads: int = 8
    dropout: float = 0.1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        *,
        query_pos: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        query = query.astype(self.dtype)
        identity = query
        q = (query + query_pos.astype(self.dtype)
             if query_pos is not None else query)
        out = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.embed_dims,
            out_features=self.embed_dims,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            dtype=self.dtype,
            name="attn",
        )(inputs_q=q, inputs_k=q, inputs_v=query, mask=attn_mask)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out + identity


class FFN(nn.Module):
    """mmcv FFN: Dense→ReLU→Dropout→Dense→Dropout + residual."""

    embed_dims: int = 256
    feedforward_channels: int = 512
    dropout: float = 0.1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        identity = x
        y = nn.Dense(self.feedforward_channels, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.embed_dims, dtype=self.dtype)(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return y + identity
