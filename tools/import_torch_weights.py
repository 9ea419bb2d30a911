"""Convert torch pretrained backbone checkpoints to flax param msgpack.

Reference behavior: mmcv load_checkpoint consumes ``pretrained=dict(img=
'ckpts/...pth')`` (bev_tiny_det_map_apollo.py:91 DLA-34, bev_base_occ.py
R101-DCN FCOS3D, vovnet/internimage variants) before training starts. Here
the torch state dict is name-mapped onto the flax backbone/neck param
trees (utils/torch_import.py) and saved as a flax msgpack — or consumed
directly by ``tools/train.py --pretrained ckpt.pth`` without this tool.

Usage:
  python tools/import_torch_weights.py ckpt.pth --config bev_base_det_map \
      [--out params.msgpack] [--img-hw 480 800]
Prints the per-subtree import summary (leaf counts, unused torch keys).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt")
    p.add_argument("--config", required=True)
    p.add_argument("--out", default="")
    # conv param shapes are resolution-independent; a small init image keeps
    # the one-off CPU init forward cheap
    p.add_argument("--img-hw", type=int, nargs=2, default=(64, 64))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from apollo_vision_net_tpu import configs
    from apollo_vision_net_tpu.parallel.train import build_model
    from apollo_vision_net_tpu.utils.torch_import import (
        apply_pretrained,
        load_torch_state_dict,
    )

    cfg = getattr(configs, args.config)()
    model = build_model(cfg)
    h, w = args.img_hw
    x = jnp.zeros((1, h, w, 3), jnp.float32)

    # init only the conv trunk (backbone + neck): cheap and sufficient —
    # the transformer tree never takes torch weights
    def trunk_init(mdl, img):
        feats = mdl.img_backbone(img)
        mdl.img_neck(feats)
        return feats

    variables = model.init(jax.random.PRNGKey(0), x, method=trunk_init)
    params = dict(variables["params"])

    sd = load_torch_state_dict(args.ckpt)
    print(f"torch checkpoint: {len(sd)} tensors")
    new_params = apply_pretrained(params, sd, cfg.model.backbone_type)
    n_bb = len(jax.tree.leaves(new_params["img_backbone"]))
    print(f"imported img_backbone: {n_bb} leaves "
          f"({cfg.model.backbone_type})")
    if "img_neck" in new_params and new_params["img_neck"] is not \
            params.get("img_neck"):
        print(f"imported img_neck: "
              f"{len(jax.tree.leaves(new_params['img_neck']))} leaves")

    if args.out:
        import flax.serialization

        with open(args.out, "wb") as f:
            f.write(flax.serialization.to_bytes(new_params))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
