"""Stage-attribution bench for the flagship streaming step (run on TPU).

Times each pipeline stage inside its own lax.scan-jit (host dispatch off the
measured path, same methodology as bench.py) so per-frame milliseconds can be
attributed: backbone+neck / encoder (BEV features) / decoder+branches.

Usage: python tools/bench_stages.py [config_name] [--frames 32]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed_scan(fn, carry0, n_frames, params):
    """Scan fn (params, carry -> carry, scalar) n_frames times inside one
    jit; returns per-iteration ms (second call, compiled). params ride as a
    jit argument — closing over them embeds the weights as MLIR constants
    (slow remote compiles, request-size limits)."""

    @jax.jit
    def run(params, carry):
        def body(carry, i):
            carry, s = fn(params, carry, i)
            return carry, s
        carry, sums = jax.lax.scan(body, carry, jnp.arange(n_frames))
        return carry, sums.sum()

    carry, s = run(params, carry0)
    float(s)
    t0 = time.perf_counter()
    carry, s = run(params, carry0)
    float(s)
    return (time.perf_counter() - t0) / n_frames * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="bev_tiny_det_map_apollo")
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--stages", default="full,bb,enc,head",
                    help="comma list of stages to run (crash isolation)")
    ap.add_argument("--trace", action="store_true",
                    help="profile the (single) selected stage and print "
                         "top device ops")
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    from apollo_vision_net_tpu import configs as cfglib
    from apollo_vision_net_tpu.data.synthetic import make_batch
    from apollo_vision_net_tpu.models.detector import BEVFormer
    from apollo_vision_net_tpu.parallel.train import build_model, init_state

    cfg = getattr(cfglib, args.config)()
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=1, seed=0))
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    model = build_model(cfg)
    params = {"params": state.params}
    Q = cfg.model.bev_h * cfg.model.bev_w

    img = batch["img"][:, -1]
    can_bus = batch["can_bus"][:, -1]
    lidar2img = batch["lidar2img"][:, -1]
    prev0 = jnp.zeros((1, Q, cfg.model.embed_dims), jnp.float32)
    has_prev = jnp.ones((1,), jnp.float32)

    # ---- full step ----
    def full(p, prev, i):
        im = img + i.astype(img.dtype) * 1e-6
        outs, new_prev = model.apply(
            p, im, can_bus, lidar2img, prev, has_prev,
            method=BEVFormer.forward_test_frame)
        return new_prev, outs["all_cls_scores"][-1].sum()

    if "full" in stages:
        ms_full = timed_scan(full, prev0, args.frames, params)
        print(f"full_step          {ms_full:8.3f} ms/frame   "
              f"({1e3/ms_full:.1f} fps)", flush=True)

    # ---- backbone+neck only ----
    def bb(p, carry, i):
        im = img + i.astype(img.dtype) * 1e-6
        feats = model.apply(p, im, method=BEVFormer.extract_img_feat)
        s = sum(f.sum() for f in feats)
        return carry + s * 1e-9, s

    if "bb" in stages:
        ms_bb = timed_scan(bb, jnp.zeros(()), args.frames, params)
        print(f"backbone+neck      {ms_bb:8.3f} ms/frame", flush=True)

    # ---- encoder only (BEV features from precomputed feats) ----
    feats0 = jax.jit(
        lambda p, im: model.apply(p, im, method=BEVFormer.extract_img_feat)
    )(params, img)

    def enc(p, prev, i):
        feats = tuple(f + i.astype(f.dtype) * 1e-6 for f in feats0)
        bev = model.apply(
            p, feats, can_bus=can_bus, lidar2img=lidar2img,
            prev_bev=prev, has_prev=has_prev, only_bev=True,
            deterministic=True,
            method=lambda m, *a, **k: m.head(*a, **k))
        return bev, bev.sum()

    if "enc" in stages:
        ms_enc = timed_scan(enc, prev0, args.frames, params)
        print(f"encoder (bev)      {ms_enc:8.3f} ms/frame", flush=True)
        if args.trace:
            from tools.profile_step import trace_and_report

            @jax.jit
            def run_enc(p, carry):
                def body(carry, i):
                    carry, s = enc(p, carry, i)
                    return carry, s
                carry, sums = jax.lax.scan(
                    body, carry, jnp.arange(args.frames))
                return carry, sums.sum()

            def traced():
                c, s = run_enc(params, prev0)
                float(s)
            traced()
            trace_and_report(traced, args.frames)

    # ---- full head (encoder + decoders) from precomputed feats ----
    def head_full(p, prev, i):
        feats = tuple(f + i.astype(f.dtype) * 1e-6 for f in feats0)
        outs = model.apply(
            p, feats, can_bus=can_bus, lidar2img=lidar2img,
            prev_bev=prev, has_prev=has_prev, deterministic=True,
            method=lambda m, *a, **k: m.head(*a, **k))
        return outs["bev_embed"], outs["all_cls_scores"][-1].sum()

    if "head" in stages:
        ms_head = timed_scan(head_full, prev0, args.frames, params)
        print(f"encoder+decoders   {ms_head:8.3f} ms/frame", flush=True)
        if "enc" in stages:
            print(f"  -> decoders+branches ~ {ms_head - ms_enc:8.3f} ms/frame")
    if stages >= {"full", "bb", "head"}:
        print(f"residual (full - bb - head) ~ "
              f"{ms_full - ms_bb - ms_head:8.3f} ms/frame")


if __name__ == "__main__":
    main()
