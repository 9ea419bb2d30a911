"""Stage bisect for the base-scale (200x200) TPU worker crash.

The full `bev_base_det_map` / `bev_base_occ` streaming graph kills the TPU
worker at first execution on the factored-SCA path, while every kernel
isolation (tools/bench_base_encoder.py) and the full TRAIN/init forward
succeed. This harness executes progressively larger slices of the REAL
model graph (real modules + params, synthetic batch) so the faulting
composition can be pinned:

  once      jit(forward_test_frame), single call — no outer frame scan
  scan N    the bench's run_stream: forward_test_frame under lax.scan(N)
  trunk     head(only_bev=True) (encoder trunk only) under lax.scan(N)
  backbone  extract_img_feat alone under lax.scan(N)

Env toggles that move the kernel choice: MSDA_FACTORED=0 (materialize),
APOLLO_SCA_QT / APOLLO_TSA_QT (tile sizes).

Usage: python tools/bisect_base_crash.py --config bev_base_occ --stage once
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="bev_base_occ")
    ap.add_argument("--stage", default="once",
                    choices=["once", "scan", "trunk", "headful", "backbone"])
    ap.add_argument("--frames", type=int, default=2)
    args = ap.parse_args()

    from apollo_vision_net_tpu import configs as cfglib
    from apollo_vision_net_tpu.data.synthetic import make_batch
    from apollo_vision_net_tpu.models.detector import BEVFormer
    from apollo_vision_net_tpu.parallel.train import build_model, init_state

    cfg = getattr(cfglib, args.config)()
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size=1, seed=0))
    print("init_state (jit-executes the full train forward)...", flush=True)
    t0 = time.perf_counter()
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    jax.block_until_ready(state.params)
    print(f"init ok in {time.perf_counter() - t0:.1f}s", flush=True)
    model = build_model(cfg)
    Q = model.prev_tokens
    C = cfg.model.embed_dims

    params = state.params
    img = batch["img"][:, -1]
    can_bus = batch["can_bus"][:, -1]
    lidar2img = batch["lidar2img"][:, -1]
    prev0 = jnp.zeros((1, Q, C), jnp.float32)
    has_prev = jnp.ones((1,), jnp.float32)

    if args.stage == "once":
        @jax.jit
        def step(params, img, can_bus, lidar2img, prev, has_prev):
            outs, new_prev = model.apply(
                {"params": params}, img, can_bus, lidar2img, prev, has_prev,
                method=BEVFormer.forward_test_frame)
            first = next(x for x in jax.tree.leaves(outs)
                         if hasattr(x, "dtype"))
            return first.astype(jnp.float32).sum(), new_prev

        t0 = time.perf_counter()
        s, prev = step(params, img, can_bus, lidar2img, prev0, has_prev)
        print(f"once: compiled+ran in {time.perf_counter() - t0:.1f}s "
              f"s={float(s):.4f}", flush=True)
        t0 = time.perf_counter()
        s, prev = step(params, img, can_bus, lidar2img, prev, has_prev)
        float(s)
        print(f"once: 2nd call {time.perf_counter() - t0 :.3f}s ok", flush=True)
        return

    if args.stage == "scan":
        @jax.jit
        def run_stream(params, img, can_bus, lidar2img, prev, has_prev):
            def body(prev, i):
                im = img + (i.astype(img.dtype) * 1e-6)
                outs, new_prev = model.apply(
                    {"params": params}, im, can_bus, lidar2img, prev,
                    has_prev, method=BEVFormer.forward_test_frame)
                first = next(x for x in jax.tree.leaves(outs)
                             if hasattr(x, "dtype"))
                return new_prev, first.astype(jnp.float32).sum()
            prev, sums = jax.lax.scan(body, prev, jnp.arange(args.frames))
            return prev, sums.sum()

        t0 = time.perf_counter()
        prev, s = run_stream(params, img, can_bus, lidar2img, prev0, has_prev)
        print(f"scan{args.frames}: compiled+ran in "
              f"{time.perf_counter() - t0:.1f}s s={float(s):.4f}", flush=True)
        return

    if args.stage == "trunk":
        @jax.jit
        def run_trunk(params, img_feats, can_bus, lidar2img, prev, has_prev):
            def body(prev, i):
                feats = tuple(f + i.astype(f.dtype) * 1e-6 for f in img_feats)
                new_prev = model.head.apply(
                    {"params": params["head"]}, feats, can_bus=can_bus,
                    lidar2img=lidar2img, prev_bev=prev, has_prev=has_prev,
                    only_bev=True)
                return new_prev.astype(jnp.float32), \
                    new_prev.astype(jnp.float32).sum()
            prev, sums = jax.lax.scan(body, prev, jnp.arange(args.frames))
            return prev, sums.sum()

        feats = jax.jit(
            lambda p, im: model.apply(
                {"params": p}, im, method=BEVFormer.extract_img_feat)
        )(params, img)
        print("feats:", [f.shape for f in feats], flush=True)
        t0 = time.perf_counter()
        prev, s = run_trunk(params, feats, can_bus, lidar2img, prev0,
                            has_prev)
        print(f"trunk scan{args.frames}: compiled+ran in "
              f"{time.perf_counter() - t0:.1f}s s={float(s):.4f}", flush=True)
        return

    if args.stage == "headful":
        # FULL head (trunk + decode branches) on precomputed feats — the
        # complement of `trunk` (only_bev) and `backbone`: isolates whether
        # the decode branches or the backbone co-residency trips the crash
        @jax.jit
        def run_head(params, img_feats, can_bus, lidar2img, prev, has_prev):
            feats = tuple(f for f in img_feats)
            outs = model.head.apply(
                {"params": params["head"]}, feats, can_bus=can_bus,
                lidar2img=lidar2img, prev_bev=prev, has_prev=has_prev,
                deterministic=True)
            first = next(x for x in jax.tree.leaves(outs)
                         if hasattr(x, "dtype"))
            return first.astype(jnp.float32).sum()

        feats = jax.jit(
            lambda p, im: model.apply(
                {"params": p}, im, method=BEVFormer.extract_img_feat)
        )(params, img)
        print("feats:", [f.shape for f in feats], flush=True)
        t0 = time.perf_counter()
        s = run_head(params, feats, can_bus, lidar2img, prev0, has_prev)
        print(f"headful: compiled+ran in {time.perf_counter() - t0:.1f}s "
              f"s={float(s):.4f}", flush=True)
        t0 = time.perf_counter()
        s = run_head(params, feats, can_bus, lidar2img, prev0, has_prev)
        float(s)
        print(f"headful: 2nd call {time.perf_counter() - t0:.3f}s ok",
              flush=True)
        return

    if args.stage == "backbone":
        @jax.jit
        def run_bb(params, img):
            def body(c, i):
                feats = model.apply(
                    {"params": params}, img + i.astype(img.dtype) * 1e-6,
                    method=BEVFormer.extract_img_feat)
                return c, feats[0].astype(jnp.float32).sum()
            _, sums = jax.lax.scan(body, jnp.zeros(()),
                                   jnp.arange(args.frames))
            return sums.sum()

        t0 = time.perf_counter()
        s = run_bb(params, img)
        print(f"backbone scan{args.frames}: compiled+ran in "
              f"{time.perf_counter() - t0:.1f}s s={float(s):.4f}", flush=True)
        return


if __name__ == "__main__":
    main()
