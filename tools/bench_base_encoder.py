"""Per-op attribution bench for the base-scale (200x200) encoder layer.

Rebuilds the EXACT operands the encoder hands each hot op at
``bev_base_occ`` scale — real projection geometry from a synthetic batch,
bias-init sampling offsets (what init-params benches measure), uniform
attention — and times each op in its own lax.scan jit (same methodology
as bench.py / tools/bench_stages.py). Run on the TPU.

Usage: python tools/bench_base_encoder.py [--frames 16] [--ops sca,tsa,...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, args, n, label):
    @jax.jit
    def run(*args):
        def body(c, i):
            out = fn(*jax.tree.map(lambda a: a, args[:-1]), args[-1] + c * 1e-6)
            s = jax.tree.leaves(out)[0].astype(jnp.float32).sum()
            return c + s * 1e-20, s
        _, ss = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n))
        return ss.sum()

    s = run(*args); float(s)
    t0 = time.perf_counter()
    s = run(*args); float(s)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:34s} {ms:9.3f} ms/frame")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--ops", default="sca,tsa,dense,ffn")
    ap.add_argument("--qt", type=int, default=32)
    args = ap.parse_args()
    ops = set(args.ops.split(","))

    from apollo_vision_net_tpu import configs as cfglib
    from apollo_vision_net_tpu.data.synthetic import make_batch
    from apollo_vision_net_tpu.models.attention import grid_offset_bias
    from apollo_vision_net_tpu.ops.msda import ms_deform_attn
    from apollo_vision_net_tpu.utils.geometry import (
        bev_reference_points_3d, point_sampling, spatial_block_order,
    )

    cfg = cfglib.bev_base_occ()
    m = cfg.model
    B, N, C, H = 1, m.num_cams, m.embed_dims, 8
    D = C // H
    bev_h = bev_w = m.bev_h
    Q = bev_h * bev_w
    L, P_sca, P_tsa = m.num_feature_levels, 8, 4
    Dz = m.num_points_in_pillar
    img_h, img_w = m.img_shape
    # feature pyramid shapes (strides 8/16/32/64 — matches extract_img_feat)
    shapes = tuple((img_h // s, img_w // s) for s in (8, 16, 32, 64))[:L]
    V = sum(h * w for h, w in shapes)
    print(f"shapes={shapes} V={V} Q={Q}")

    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=B, seed=0))
    lidar2img = batch["lidar2img"][:, -1]  # (B, N, 4, 4)

    # --- real projection geometry ---
    z_size = m.pc_range[5] - m.pc_range[2]
    ref_3d = jnp.asarray(bev_reference_points_3d(
        bev_h, bev_w, z_size, Dz))
    ref_cam, bev_mask = point_sampling(
        ref_3d, m.pc_range, lidar2img[0], (img_h, img_w))
    # point_sampling returns per-camera (N, Q?, ...) — normalize shapes
    ref_cam = jnp.asarray(ref_cam)   # (N, B?, Q, Dz, 2) per utils.geometry
    bev_mask = jnp.asarray(bev_mask)
    if ref_cam.ndim == 4:            # (N, Q, Dz, 2) -> add batch
        ref_cam = ref_cam[:, None]
        bev_mask = bev_mask[:, None]
    print("ref_cam", ref_cam.shape, "bev_mask", bev_mask.shape,
          "hit frac", float(bev_mask.any(-1).mean()))

    rng = np.random.default_rng(0)

    # ---------------- SCA operand build (mirrors SpatialCrossAttention) ---
    QT = args.qt
    perm, _ = spatial_block_order(bev_h, bev_w, 8, max(1, QT // 8))
    ref_cam_p = ref_cam[:, :, jnp.asarray(perm)]
    hit = bev_mask.any(-1)[:, :, jnp.asarray(perm)]        # (N, B, Q)
    Qp = (Q + QT - 1) // QT * QT
    hit_pad = jnp.pad(hit.transpose(1, 0, 2).reshape(B * N, Q),
                      [(0, 0), (0, Qp - Q)])
    tile_mask = hit_pad.reshape(B * N, Qp // QT, QT).any(-1)
    print("sca active tile frac", float(tile_mask.mean()))

    ref = ref_cam_p.transpose(1, 0, 2, 3, 4).reshape(B * N, Q, Dz, 2)
    bias = grid_offset_bias(H, L, P_sca).reshape(H, L, P_sca, 2)
    normalizer = np.array([[w, h] for h, w in shapes], np.float32)
    offs = jnp.asarray(bias)[None, None] / normalizer[None, None, None, :, None, :]
    offs = offs.reshape(1, 1, H, L, P_sca // Dz, Dz, 2)
    sca_loc = (ref[:, :, None, None, None, :, :] + offs).reshape(
        B * N, Q, H, L, P_sca, 2).astype(jnp.float32)
    sca_attn = jnp.full((B * N, Q, H, L, P_sca), 1.0 / (L * P_sca), jnp.float32)
    sca_val = jnp.asarray(
        rng.standard_normal((B * N, V, H, D)), jnp.bfloat16)
    sca_slab = tuple(max(8, (h + 4) // 3) for (h, w) in shapes)

    def sca_op(val, loc, attn, tm, eps):
        return ms_deform_attn(val, shapes, loc + eps * 1e-9, attn,
                              impl="auto_fast", tile_mask=tm,
                              slab_rows=sca_slab, q_tile=QT)

    # ---------------- TSA operand build (mirrors TemporalSelfAttention) ---
    ys = (np.arange(bev_h) + 0.5) / bev_h
    xs = (np.arange(bev_w) + 0.5) / bev_w
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    ref2d = np.stack([gx.reshape(-1), gy.reshape(-1)], -1)
    tbias = grid_offset_bias(H, 2, P_tsa).reshape(H, 2, P_tsa, 2)
    tnorm = np.array([bev_w, bev_h], np.float32)
    tloc = (ref2d[None, :, None, None, :]
            + tbias.transpose(1, 0, 2, 3)[:, None] / tnorm)  # (2, Q, H, P, 2)
    tsa_loc = jnp.asarray(
        tloc[:, :, :, None, :, :], jnp.float32)  # (2, Q, H, 1, P, 2)
    tsa_attn = jnp.full((2, Q, H, 1, P_tsa), 1.0 / P_tsa, jnp.float32)
    tsa_val = jnp.asarray(rng.standard_normal((2, Q, H, D)), jnp.bfloat16)
    t_qt = 32
    t_slab = min(bev_h + 2, t_qt // bev_w + 12)

    def tsa_op(val, loc, attn, eps):
        return ms_deform_attn(val, ((bev_h, bev_w),), loc + eps * 1e-9, attn,
                              impl="auto_fast", slab_rows=t_slab,
                              q_tile=t_qt, window=True)

    # ---------------- Dense/FFN costs at 40k queries --------------------
    q40 = jnp.asarray(rng.standard_normal((B, Q, C)), jnp.bfloat16)
    q40c = jnp.asarray(rng.standard_normal((B * N, Q, C)), jnp.bfloat16)
    w_off = jnp.asarray(rng.standard_normal((C, H * L * P_sca * 3)),
                        jnp.bfloat16)  # offsets(2)+attn(1) fused width
    w_ffn1 = jnp.asarray(rng.standard_normal((C, 512)), jnp.bfloat16)
    w_ffn2 = jnp.asarray(rng.standard_normal((512, C)), jnp.bfloat16)

    def dense_percam(q, w, eps):
        return (q + eps * 0) @ w  # (B*N, Q, 768)

    def dense_once(q, w, eps):
        return (q + eps * 0) @ w

    def ffn(q, w1, w2, eps):
        return jax.nn.relu((q + eps * 0) @ w1) @ w2

    # ---------------- factored SCA operands (the production path) -------
    # ref per camera (tiny), raw-cell offsets/attn shared across cameras —
    # what SpatialCrossAttention now hands the kernel (no per-camera
    # materialized locations)
    ref_fact = jnp.tile(ref.astype(jnp.float32).reshape(B * N, Q, Dz * 2),
                        (1, 1, P_sca // Dz))
    off_fact = jnp.broadcast_to(
        jnp.asarray(bias.reshape(-1), jnp.float32),
        (B, Q, H * L * P_sca * 2))
    attn_fact = jnp.full((B, Q, H * L * P_sca), 1.0 / (L * P_sca),
                         jnp.float32)

    def sca_fact_op(val, rf, of, af, tm, eps):
        return ms_deform_attn(val, shapes, None, None,
                              impl="auto_fast", tile_mask=tm,
                              slab_rows=sca_slab, q_tile=QT,
                              factored=(rf, of + eps * 1e-9, af))

    n = args.frames
    if "sca" in ops:
        timed(sca_op, (sca_val, sca_loc, sca_attn, tile_mask,
                       jnp.zeros(())), n, "SCA msda (chunked kernel)")
    if "scafact" in ops:
        timed(sca_fact_op, (sca_val, ref_fact, off_fact, attn_fact,
                            tile_mask, jnp.zeros(())), n,
              "SCA msda FACTORED operands")
    if "pack" in ops:
        # pack/glue bisect: the tile-major pack on materialized per-camera
        # operands vs the factored pack (offsets 1/6, refs 1/32 volume)
        from apollo_vision_net_tpu.ops.msda_pallas import (
            _pack_tile_major, _pack_tile_major_factored,
        )

        loc_flat = sca_loc.reshape(B * N, Q, -1)
        attn_flat6 = sca_attn.reshape(B * N, Q, -1)
        QTp = 128
        Qpp = (Q + QTp - 1) // QTp * QTp
        lf = jnp.pad(loc_flat, [(0, 0), (0, Qpp - Q), (0, 0)], mode="edge")
        af6 = jnp.pad(attn_flat6, [(0, 0), (0, Qpp - Q), (0, 0)])
        rf = jnp.pad(ref_fact, [(0, 0), (0, Qpp - Q), (0, 0)], mode="edge")
        of = jnp.pad(off_fact, [(0, 0), (0, Qpp - Q), (0, 0)], mode="edge")
        afs = jnp.pad(attn_fact, [(0, 0), (0, Qpp - Q), (0, 0)])

        def pack_mat(lf, af, eps):
            pxyk, sk = _pack_tile_major(lf + eps * 1e-9, af, shapes, H,
                                        P_sca, QTp)
            return pxyk.sum() + sk.astype(jnp.float32).sum()

        def pack_fact(rf, of, af, eps):
            pxyk, sk = _pack_tile_major_factored(rf, of + eps * 1e-9, af,
                                                 shapes, H, P_sca, QTp)
            return pxyk.sum() + sk.astype(jnp.float32).sum()

        timed(pack_mat, (lf, af6, jnp.zeros(())), n,
              "pack tile-major MATERIALIZED")
        timed(pack_fact, (rf, of, afs, jnp.zeros(())), n,
              "pack tile-major FACTORED")
    if "glue" in ops:
        # the old model-side per-camera location build (one-hot matmul +
        # flat add) that the factored path deletes
        fi = np.arange(H * L * P_sca * 2)
        z_of = ((fi // 2) % P_sca) % Dz
        onehot = np.zeros((Dz * 2, H * L * P_sca * 2), np.float32)
        onehot[z_of * 2 + (fi % 2), fi] = 1.0
        inv = 1.0 / np.array(
            [[w, h] for h, w in shapes], np.float32)[
                (fi // (2 * P_sca)) % L, fi % 2]

        def loc_build(ref, off, eps):
            return (ref.reshape(B * N, Q, Dz * 2) @ jnp.asarray(onehot)
                    + (off + eps * 1e-9) * jnp.asarray(inv)[None, None])

        timed(loc_build, (ref, jnp.broadcast_to(
            off_fact, (B * N, Q, H * L * P_sca * 2)), jnp.zeros(())), n,
              "per-cam loc build (one-hot+add)")
    if "scastack" in ops:
        # encoder-shaped repro: 6 SCA calls inside lax.scan over per-layer
        # weights, query carried through — the structure the full
        # bev_base_occ graph wraps the kernel in (crash isolation harness)
        C = m.embed_dims
        wq = jnp.asarray(rng.standard_normal((6, 32, C)) * 0.02, jnp.bfloat16)
        wo = jnp.asarray(rng.standard_normal((6, C, 32)) * 0.02, jnp.bfloat16)
        q0 = jnp.asarray(rng.standard_normal((B * N, Q, 32)), jnp.bfloat16)

        def sca_stack(q0, loc, attn, val, tm, eps):
            def layer(q, w):
                wq_l, wo_l = w
                h = (q @ wq_l).astype(jnp.float32)  # (B*N, Q, C)
                dloc = h[..., :1].reshape(B * N, Q, 1, 1, 1, 1) * 1e-5
                out = ms_deform_attn(
                    val, shapes, loc + dloc + eps * 1e-9, attn,
                    impl="auto_fast", tile_mask=tm, slab_rows=sca_slab,
                    q_tile=QT)
                return (out @ wo_l).astype(q.dtype) + q, ()
            q, _ = jax.lax.scan(layer, q0, (wq, wo))
            return q

        timed(sca_stack, (q0, sca_loc, sca_attn, sca_val, tile_mask,
                          jnp.zeros(())), n, "SCA x6 scan-over-layers")
    if "scafactstack" in ops:
        # factored-operand scan repro: 6 factored SCA calls under
        # lax.scan, offsets/attn derived from the carried query (the
        # production SCA dataflow after the factored rewrite)
        C = m.embed_dims
        wq = jnp.asarray(rng.standard_normal((6, 32, C)) * 0.02, jnp.bfloat16)
        wo = jnp.asarray(rng.standard_normal((6, C, 32)) * 0.02, jnp.bfloat16)
        q0 = jnp.asarray(rng.standard_normal((B, Q, 32)), jnp.bfloat16)

        def sca_fact_stack(q0, rf, of, af, val, tm, eps):
            def layer(q, w):
                wq_l, wo_l = w
                h = (q @ wq_l).astype(jnp.float32)  # (B, Q, C)
                doff = h[..., :1].reshape(B, Q, 1) * 1e-5
                out = ms_deform_attn(
                    val, shapes, None, None,
                    impl="auto_fast", tile_mask=tm, slab_rows=sca_slab,
                    q_tile=QT,
                    factored=(rf, of + doff + eps * 1e-9, af))
                out = out.reshape(B, N, Q, C).sum(1)  # camera-fold back
                return (out @ wo_l).astype(q.dtype) + q, ()
            q, _ = jax.lax.scan(layer, q0, (wq, wo))
            return q

        timed(sca_fact_stack, (q0, ref_fact, off_fact, attn_fact, sca_val,
                               tile_mask, jnp.zeros(())), n,
              "SCA FACTORED x6 scan-over-layers")
    if "encfactlayers" in ops:
        # TSA (window kernel) + FACTORED SCA co-resident per scan layer —
        # the exact kernel pairing of the production encoder after the
        # factored rewrite
        C = m.embed_dims
        wq = jnp.asarray(rng.standard_normal((6, 32, C)) * 0.02, jnp.bfloat16)
        wo = jnp.asarray(rng.standard_normal((6, C, 32)) * 0.02, jnp.bfloat16)
        q0 = jnp.asarray(rng.standard_normal((B, Q, 32)), jnp.bfloat16)

        def enc_fact_layers(q0, tval, tloc, tattn, rf, of, af, val, tm, eps):
            def layer(q, w):
                wq_l, wo_l = w
                h = (q @ wq_l).astype(jnp.float32)
                tshift = jnp.broadcast_to(
                    h[:1, :, :1], (2, Q, 1)).reshape(2, Q, 1, 1, 1, 1) * 1e-6
                t_out = ms_deform_attn(
                    tval, ((bev_h, bev_w),), tloc + tshift + eps * 1e-9,
                    tattn, impl="auto_fast", slab_rows=t_slab, q_tile=t_qt,
                    window=True)
                doff = (h[..., :1].reshape(B, Q, 1) * 1e-5
                        + t_out[:1, :, :1].reshape(1, Q, 1) * 1e-6)
                out = ms_deform_attn(
                    val, shapes, None, None,
                    impl="auto_fast", tile_mask=tm, slab_rows=sca_slab,
                    q_tile=QT, factored=(rf, of + doff, af))
                out = out.reshape(B, N, Q, C).sum(1)
                return (out @ wo_l).astype(q.dtype) + q, ()
            q, _ = jax.lax.scan(layer, q0, (wq, wo))
            return q

        timed(enc_fact_layers, (q0, tsa_val, tsa_loc, tsa_attn, ref_fact,
                                off_fact, attn_fact, sca_val, tile_mask,
                                jnp.zeros(())),
              n, "TSA+SCA-FACTORED x6 scan-over-layers")
    if "enclayers" in ops:
        # closer repro: TSA (window kernel) + SCA (pt2d) per layer under
        # scan-over-layers — the two Pallas kernels co-resident in one
        # scan body, as the real encoder graph has them
        C = m.embed_dims
        wq = jnp.asarray(rng.standard_normal((6, 32, C)) * 0.02, jnp.bfloat16)
        wo = jnp.asarray(rng.standard_normal((6, C, 32)) * 0.02, jnp.bfloat16)
        q0 = jnp.asarray(rng.standard_normal((B * N, Q, 32)), jnp.bfloat16)

        def enc_layers(q0, tval, tloc, tattn, loc, attn, val, tm, eps):
            def layer(q, w):
                wq_l, wo_l = w
                h = (q @ wq_l).astype(jnp.float32)
                tshift = h[:2, :, :1].reshape(2, Q, 1, 1, 1, 1) * 1e-6
                t_out = ms_deform_attn(
                    tval, ((bev_h, bev_w),), tloc + tshift + eps * 1e-9,
                    tattn, impl="auto_fast", slab_rows=t_slab, q_tile=t_qt,
                    window=True)
                dloc = (h[..., :1].reshape(B * N, Q, 1, 1, 1, 1) * 1e-5
                        + t_out[:1, :, :1].reshape(1, Q, 1, 1, 1, 1) * 1e-6)
                out = ms_deform_attn(
                    val, shapes, loc + dloc, attn,
                    impl="auto_fast", tile_mask=tm, slab_rows=sca_slab,
                    q_tile=QT)
                return (out @ wo_l).astype(q.dtype) + q, ()
            q, _ = jax.lax.scan(layer, q0, (wq, wo))
            return q

        timed(enc_layers, (q0, tsa_val, tsa_loc, tsa_attn, sca_loc,
                           sca_attn, sca_val, tile_mask, jnp.zeros(())),
              n, "TSA+SCA x6 scan-over-layers")
    if "tsa" in ops:
        timed(tsa_op, (tsa_val, tsa_loc, tsa_attn, jnp.zeros(())), n,
              "TSA msda (window kernel)")
    if "dense" in ops:
        timed(dense_percam, (q40c, w_off, jnp.zeros(())), n,
              "offs+attn Dense PER-CAM (6x40k)")
        timed(dense_once, (q40, w_off, jnp.zeros(())), n,
              "offs+attn Dense once (1x40k)")
    if "ffn" in ops:
        timed(ffn, (q40, w_ffn1, w_ffn2, jnp.zeros(())), n,
              "FFN 40k x 256 x 512")


if __name__ == "__main__":
    main()
