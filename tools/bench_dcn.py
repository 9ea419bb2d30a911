"""Per-shape DCN (modulated deform conv) attribution bench, base scale.

Times ``modulated_deform_conv`` at each distinct shape the R101-DCN
backbone (bev_base_* configs: 480x800 input, DCN stages 3-4) dispatches,
weighted by how many blocks share that shape — so the backbone's DCN
millisecond total attributes to shapes. ``--impl`` compares dispatch
choices (auto_fast = production, xla = patch-gather fallback, dense =
the dedicated dense-window kernel).

Usage: python tools/bench_dcn.py [--frames 16] [--impl auto_fast,xla]
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

# (label, n_blocks, H, W, C_in, O, stride) — R101-DCN at 480x800:
# layer3 (planes 256): first block strides 60x100 -> 30x50, 22 more at
# 30x50; layer4 (planes 512): first 30x50 -> 15x25, 2 more at 15x25.
SHAPES = [
    ("l3.b0 s2 60x100->30x50 c256", 1, 60, 100, 256, 256, 2),
    ("l3.b1-22  30x50 c256", 22, 30, 50, 256, 256, 1),
    ("l4.b0 s2 30x50->15x25 c512", 1, 30, 50, 512, 512, 2),
    ("l4.b1-2   15x25 c512", 2, 15, 25, 512, 512, 1),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--impl", default="auto_fast")
    ap.add_argument("--cams", type=int, default=6)
    args = ap.parse_args()

    from apollo_vision_net_tpu.ops.dcnv3 import modulated_deform_conv

    rng = np.random.default_rng(0)
    for impl in args.impl.split(","):
        total = 0.0
        for label, nblk, H, W, C, O, s in SHAPES:
            B = args.cams
            Ho, Wo = H // s, W // s
            x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
            # offsets at trained-ish magnitude (~1px std), sigmoid masks
            off = jnp.asarray(
                rng.standard_normal((B, Ho, Wo, 9, 2)), jnp.float32)
            mask = jax.nn.sigmoid(jnp.asarray(
                rng.standard_normal((B, Ho, Wo, 9)), jnp.float32))
            w = jnp.asarray(rng.standard_normal((9, C, O)) * 0.02,
                            jnp.bfloat16)

            @jax.jit
            def run(x, off, mask, w, s=s, impl=impl):
                def body(c, i):
                    out = modulated_deform_conv(
                        x + i.astype(x.dtype) * 1e-6, off, mask, w,
                        stride=s, impl=impl)
                    return c, out.astype(jnp.float32).sum()
                _, ss = jax.lax.scan(body, jnp.zeros(()),
                                     jnp.arange(args.frames))
                return ss.sum()

            r = run(x, off, mask, w); float(r)
            t0 = time.perf_counter()
            r = run(x, off, mask, w); float(r)
            ms = (time.perf_counter() - t0) / args.frames * 1e3
            total += ms * nblk
            print(f"[{impl:10s}] {label:30s} {ms:8.3f} ms/call "
                  f"x{nblk} = {ms * nblk:8.3f} ms", flush=True)
        print(f"[{impl:10s}] backbone DCN total {total:8.3f} ms/frame",
              flush=True)


if __name__ == "__main__":
    main()
