#!/usr/bin/env python
"""Plot loss/metric curves from a metrics.jsonl stream.

Reference analog: tools/analysis_tools/plot_loss_from_log.py (reads mmcv
text logs); here the source is the structured jsonl stream written by
runtime/train_loop.py (and tools/overfit_check.py's per-step jsonl).

Usage: python tools/plot_loss_from_log.py <work_dir|metrics.jsonl>
           [--keys loss_total loss_cls ...] [--out curves.png]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("log", help="work dir or metrics.jsonl path")
    p.add_argument("--keys", nargs="*", default=None,
                   help="scalar keys to plot (default: every loss_* key)")
    p.add_argument("--kind", default="train", choices=["train", "eval"])
    p.add_argument("--out", default="curves.png")
    p.add_argument("--logy", action="store_true")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from apollo_vision_net_tpu.runtime.metrics_log import read_metrics

    path = args.log
    if os.path.isfile(path) and not path.endswith("metrics.jsonl"):
        # bare jsonl without kind tags (e.g. overfit_check's curve file):
        # treat every record as the requested kind
        import json

        recs = [json.loads(ln) for ln in open(path) if ln.strip()]
    else:
        recs = read_metrics(path, kind=args.kind)
    if not recs:
        sys.exit(f"no '{args.kind}' records in {path}")

    keys = args.keys
    if not keys:
        skip = {"step", "wall_time", "kind", "sec_per_it"}
        keys = sorted({
            k for r in recs for k, v in r.items()
            if k not in skip and isinstance(v, (int, float))
            and (args.kind == "eval" or k.startswith("loss"))
        })
    steps = [r["step"] for r in recs]
    fig, ax = plt.subplots(figsize=(9, 5.5))
    for k in keys:
        ys = [r.get(k, float("nan")) for r in recs]
        lw = 2.2 if k in ("loss_total", "NDS", "mean_ap") else 1.0
        ax.plot(steps, ys, label=k, lw=lw)
    if args.logy:
        ax.set_yscale("log")
    ax.set_xlabel("step")
    ax.set_ylabel("value")
    ax.grid(alpha=0.3)
    ax.legend(fontsize=7, ncols=2)
    ax.set_title(os.path.basename(os.path.abspath(args.log)))
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"wrote {args.out} ({len(recs)} records, {len(keys)} series)")


if __name__ == "__main__":
    main()
