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
    ap.add_argument("config", nargs="?", default=None,
                    help="config name; default = the flagship entry, built "
                         "EXACTLY like bench.py so its compile cache hits")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--frames", type=int, default=32,
                    help="must match bench.py N_FRAMES for a cache hit")
    args = ap.parse_args()

    import bench as bench_mod

    if args.config is None:
        from __graft_entry__ import entry

        fn, fargs = entry()
    else:
        fn, fargs = bench_mod.config_entry(args.config)
    params, img, can_bus, lidar2img, prev0, has_prev = fargs

    @jax.jit
    def run_stream(params, img, can_bus, lidar2img, prev, has_prev):
        def body(prev, i):
            im = img + (i.astype(img.dtype) * 1e-6)
            outs = fn(params, im, can_bus, lidar2img, prev, has_prev)
            return outs[-1], outs[0].sum()
        prev, sums = jax.lax.scan(body, prev, jnp.arange(args.frames))
        return prev, sums.sum()

    prev, s = run_stream(params, img, can_bus, lidar2img, prev0, has_prev)
    float(s)

    def traced():
        prev2, s2 = run_stream(params, img, can_bus, lidar2img, prev,
                               has_prev)
        float(s2)

    trace_and_report(traced, args.frames, args.top)


def trace_and_report(fn, n_frames, top=40):
    """Run fn under jax.profiler.trace and print top device ops by self
    time (shared by tools/bench_stages.py --trace)."""
    tdir = "/tmp/jax_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        fn()

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
    print(f"total device-op time: {total/1e3:.3f} ms over {n_frames} frames "
          f"({total/1e3/n_frames:.3f} ms/frame)")
    for name, us in per_op.most_common(top):
        print(f"{us/n_frames:10.1f} us/frame  {us/total*100:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
