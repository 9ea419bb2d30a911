"""Benchmark: 6-camera frames/sec/chip, streaming BEVFormer det+map inference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: BASELINE.json north star = 60 six-camera frames/sec/chip.

The steady-state loop runs as a lax.scan over frames INSIDE one jit — the
prev_bev recurrence keeps every step sequentially dependent (no pipelining
cheat), while keeping host dispatch off the measured path, matching how a
production serving loop enqueues work.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_FRAMES = 32


def main():
    from __graft_entry__ import entry

    fn, args = entry()
    params, img, can_bus, lidar2img, prev0, has_prev = args

    @jax.jit
    def run_stream(params, img, can_bus, lidar2img, prev, has_prev):
        def body(prev, i):
            # fold the frame index into the image so steps can't be CSE'd
            im = img + (i.astype(img.dtype) * 1e-6)
            outs = fn(params, im, can_bus, lidar2img, prev, has_prev)
            return outs[-1], outs[0].sum()
        prev, sums = jax.lax.scan(body, prev, jnp.arange(N_FRAMES))
        return prev, sums.sum()

    # warmup / compile
    prev, s = run_stream(params, img, can_bus, lidar2img, prev0, has_prev)
    float(s)

    t0 = time.perf_counter()
    prev, s = run_stream(params, img, can_bus, lidar2img, prev, has_prev)
    float(s)
    dt = time.perf_counter() - t0

    batch = int(img.shape[0])
    fps = batch * N_FRAMES / dt
    baseline = 60.0
    print(json.dumps({
        "metric": "6cam_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline, 4),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # pragma: no cover - TPU-environment resilience
        # the axon TPU worker occasionally crashes/restarts mid-session
        # (observed: FAILED_PRECONDITION / UNAVAILABLE); one clean-process
        # retry rides out the restart. Never fabricates a number — a second
        # failure propagates.
        import sys
        import traceback

        if os.environ.get("BENCH_RETRIED"):
            raise
        traceback.print_exc()
        print("bench: retrying once in a fresh process", file=sys.stderr)
        env = dict(os.environ, BENCH_RETRIED="1")
        os.execve(sys.executable, [sys.executable] + sys.argv, env)
