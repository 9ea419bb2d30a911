"""Capture a device trace of the flagship streaming step and print the
top ops by self time (run on TPU).

Usage: python tools/profile_step.py [config] [--top 40]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import collections
import glob

import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="bev_tiny_det_map_apollo")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

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

    @jax.jit
    def run(params, prev):
        def body(prev, i):
            im = img + i.astype(img.dtype) * 1e-6
            outs, new_prev = model.apply(
                params, im, can_bus, lidar2img, prev, has_prev,
                method=BEVFormer.forward_test_frame)
            return new_prev, outs["all_cls_scores"][-1].sum()
        prev, sums = jax.lax.scan(body, prev, jnp.arange(args.frames))
        return prev, sums.sum()

    prev, s = run(params, prev0)
    float(s)

    tdir = "/tmp/jax_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        prev, s = run(params, prev0)
        float(s)

    # parse the xplane proto
    from jax._src.profiler import ProfileData

    paths = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {tdir}"
    data = ProfileData.from_file(paths[0])
    per_op = collections.Counter()
    total = 0.0
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            lname = line.name.lower()
            if "step" in lname or "sparse" in lname:
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e3
                name = ev.name
                per_op[name] += dur
                total += dur
    print(f"total device-op time: {total/1e3:.3f} ms over {args.frames} frames "
          f"({total/1e3/args.frames:.3f} ms/frame)")
    for name, us in per_op.most_common(args.top):
        print(f"{us/args.frames:10.1f} us/frame  {us/total*100:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
