#!/usr/bin/env python
"""Training-log analysis: iter-time statistics + loss/metric summaries.

Reference analog: tools/analysis_tools/analyze_logs.py (cal_train_time +
plot_curve over mmcv json logs); source here is the metrics.jsonl stream.

Usage: python tools/analyze_logs.py <work_dir|metrics.jsonl>
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("log")
    args = p.parse_args()

    from apollo_vision_net_tpu.runtime.metrics_log import read_metrics

    train = read_metrics(args.log, kind="train")
    evals = read_metrics(args.log, kind="eval")
    if not train:
        sys.exit(f"no train records in {args.log}")

    times = np.array([r["sec_per_it"] for r in train if "sec_per_it" in r])
    if times.size:
        print(f"iter time: mean {times.mean():.3f}s  median "
              f"{np.median(times):.3f}s  min {times.min():.3f}s  "
              f"max {times.max():.3f}s  over {times.size} logged points")

    keys = sorted({k for r in train for k, v in r.items()
                   if k.startswith("loss") and isinstance(v, (int, float))})
    print(f"steps {train[0]['step']}..{train[-1]['step']}")
    for k in keys:
        ys = np.array([r[k] for r in train if k in r])
        print(f"  {k:28s} first {ys[0]:10.4f}  last {ys[-1]:10.4f}  "
              f"min {ys.min():10.4f}")
    if evals:
        print("eval metrics (best over run):")
        ekeys = sorted({k for r in evals for k, v in r.items()
                        if k not in ("step", "wall_time", "kind")
                        and isinstance(v, (int, float))})
        for k in ekeys:
            ys = [(r[k], r["step"]) for r in evals if k in r]
            best, at = max(ys) if not k.endswith("_err") else min(ys)
            print(f"  {k:28s} best {best:10.4f} @ step {at}")


if __name__ == "__main__":
    main()
