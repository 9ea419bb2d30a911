#!/usr/bin/env python
"""Train CLI (reference tools/train.py analog, minus the registry/plugin
machinery — configs are typed factories in apollo_vision_net_tpu.configs).

Data: `--data synthetic` generates contract-conformant batches (smoke
training); `--data nuscenes --infos <pkl> --data-root <dir>` consumes
converted infos when the dataset is on disk.
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_iter(cfg, batch_size, seed=0):
    from apollo_vision_net_tpu.data.synthetic import make_batch

    i = 0
    while True:
        yield make_batch(cfg, batch_size, seed=seed + i)
        i += 1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", help="config factory name, e.g. bev_tiny_det")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--data", default="synthetic",
                   choices=["synthetic", "nuscenes"])
    p.add_argument("--infos", default="",
                   help="nuscenes infos pkl (tools/create_data.py output)")
    p.add_argument("--data-root", default="",
                   help="dataset root for relative image paths")
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--img-scale", type=float, default=0.5)
    p.add_argument("--pretrained", default="",
                   help="torch .pth checkpoint for backbone(+neck) init "
                        "(reference pretrained=dict(img=...)); overrides "
                        "cfg.pretrained_path")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--eval-interval", type=int, default=0,
                   help="run the synthetic streaming eval every N steps")
    p.add_argument("--eval-frames", type=int, default=8)
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")

    from apollo_vision_net_tpu import configs
    from apollo_vision_net_tpu.runtime.train_loop import train

    cfg_factory = getattr(configs, args.config)
    cfg = cfg_factory()
    if args.pretrained:
        import dataclasses

        cfg = dataclasses.replace(cfg, pretrained_path=args.pretrained)
    work_dir = args.work_dir or f"work_dirs/{cfg.name}"

    if args.data == "synthetic":
        data = synthetic_iter(cfg, args.batch_size, args.seed)
    else:
        # dataset -> prefetching loader -> endless epoch iterator
        # (reference tools/train.py:225-266 builds dataset+loader+runner)
        if not args.infos:
            raise SystemExit("--data nuscenes requires --infos <pkl>")
        from apollo_vision_net_tpu.data.loader import (
            PrefetchLoader, shuffled_epoch_indices)
        from apollo_vision_net_tpu.data.nuscenes_dataset import (
            NuScenesTemporalDataset)

        ds = NuScenesTemporalDataset(
            cfg, args.infos, data_root=args.data_root, training=True,
            img_scale=args.img_scale, seed=args.seed)
        logging.info("nuscenes dataset: %d samples from %s",
                     len(ds), args.infos)

        if len(ds) < args.batch_size:
            raise SystemExit(
                f"dataset has {len(ds)} samples < batch size "
                f"{args.batch_size}: every epoch would be empty "
                "(drop-last batching)")

        def nuscenes_iter():
            epoch = 0
            while True:
                idx = shuffled_epoch_indices(
                    len(ds), args.seed + epoch, drop_last_to=args.batch_size)
                loader = PrefetchLoader(
                    ds.get_queue_sample, idx, args.batch_size,
                    num_workers=args.num_workers)
                yield from loader
                epoch += 1

        data = nuscenes_iter()

    eval_fn = None
    if args.eval_interval:
        from apollo_vision_net_tpu.data.synthetic import make_batch
        from apollo_vision_net_tpu.evaluation import formatting
        from apollo_vision_net_tpu.parallel.train import build_model
        from apollo_vision_net_tpu.runtime.inference import (
            evaluate_results,
            run_streaming_eval,
        )

        model = build_model(cfg)
        frames, gt_det = [], []
        for i in range(args.eval_frames):
            b = make_batch(cfg, 1, seed=10_000 + i)
            frames.append(dict(
                img=b["img"][0, -1], can_bus=b["can_bus"][0, -1],
                lidar2img=b["lidar2img"][0, -1],
                scene_token=f"eval{i // 10}",
            ))
            gt_det.append(formatting.gt_to_sample_record(
                b["gt_boxes"][0], b["gt_labels"][0], b["gt_mask"][0]))

        def eval_fn(state):
            results = run_streaming_eval(cfg, model, state.params, frames)
            return evaluate_results(cfg, results, {"det": gt_det})

    train(cfg, data, num_steps=args.steps, work_dir=work_dir,
          resume=args.resume, seed=args.seed,
          log_interval=args.log_interval,
          eval_fn=eval_fn, eval_interval=args.eval_interval)


if __name__ == "__main__":
    main()
