#!/usr/bin/env python
"""Offline map evaluation (reference tools/eval_map_offline.py analog):
re-evaluate a dumped map_results pickle against map GT annotations,
isolating the evaluator from distributed collection."""
import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("results", help="pickle: list of map result records")
    p.add_argument("annotations", help="pickle: list of map GT records")
    p.add_argument("--metrics", nargs="+", default=["chamfer"],
                   choices=["chamfer", "iou"])
    args = p.parse_args()

    from apollo_vision_net_tpu.evaluation.map_eval import evaluate_map
    from apollo_vision_net_tpu.evaluation import formatting

    if args.results.endswith(".json"):
        # nuscmap_results.json layout (tools/test.py --dump-results)
        results = formatting.load_results_json(args.results)["map"]
    else:
        with open(args.results, "rb") as f:
            results = pickle.load(f)
    if args.annotations.endswith(".json"):
        annotations = formatting.load_map_gt_json(args.annotations)
    else:
        with open(args.annotations, "rb") as f:
            annotations = pickle.load(f)
    summary = evaluate_map(results, annotations, metrics=args.metrics)
    print(json.dumps({k: round(v, 6) for k, v in summary.items()}, indent=1))


if __name__ == "__main__":
    main()
