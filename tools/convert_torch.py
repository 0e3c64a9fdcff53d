#!/usr/bin/env python
"""Convert torch checkpoints to this framework's formats.

Usage:
  # torchvision ResNet state_dict (e.g. resnet152-f82ba261.pth) →
  # backbone msgpack consumed by --backbone_ckpt / <saving_folder>/backbone.msgpack
  python tools/convert_torch.py backbone resnet152.pth backbone.msgpack

  # full reference checkpoint (resnet152_sr) → framework resume checkpoint
  python tools/convert_torch.py checkpoint resnet152_sr sr_converted

The reference checkpoint's epoch + metric histories are carried over, and
the torch Adamax optimizer state converts to optax (exp_avg/exp_inf/step →
mu/nu/count), so ``--resume_model sr_converted`` continues the exact
optimizer trajectory the torch run was on.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["backbone", "checkpoint"])
    ap.add_argument("src", help="torch .pth/.pt file")
    ap.add_argument("dst", help="output path")
    ap.add_argument("--heads", type=int, default=16,
                    help="attention heads for ViT-flavor backbones "
                         "(16 for ViT-L, 12 for ViT-B; ignored for ResNets)")
    ap.add_argument("--image_size", type=int, default=None,
                    help="adapt a ViT checkpoint to this input resolution "
                         "(bicubic pos-embed interpolation, e.g. 336 for "
                         "CLIP ViT-L/14@336; default: keep the "
                         "checkpoint's grid; ignored for ResNets)")
    args = ap.parse_args()

    import numpy as np
    from flax import serialization

    from situation_recognition_tpu.utils import torch_convert
    from situation_recognition_tpu.utils.checkpoint import save_checkpoint

    if args.mode == "backbone":
        sd = torch_convert.load_torch_file(args.src)
        # sniff the flavor: torchvision ViT / CLIP visual tower / ResNet
        if "conv_proj.weight" in sd:
            params, stats = torch_convert.convert_vit(
                sd, args.heads, image_size=args.image_size), {}
        elif any(k.endswith("ln_pre.weight") for k in sd):
            params, stats = torch_convert.convert_clip_vit(
                sd, args.heads, image_size=args.image_size), {}
        else:
            prefix = "convnet_nouns.model." if any(
                k.startswith("convnet_nouns.") for k in sd) else ""
            params, stats = torch_convert.convert_resnet(sd, prefix=prefix)
        with open(args.dst, "wb") as f:
            f.write(serialization.msgpack_serialize(
                {"params": params, "batch_stats": stats}))
        print(f"wrote backbone ({sum(np.asarray(x).size for x in _leaves(params)):,} params) -> {args.dst}")
    else:
        raw = torch_convert.load_torch_pickle(args.src)
        sd = torch_convert.state_dict_numpy(raw["model_state_dict"])
        bparams, bstats, head = torch_convert.convert_reference_checkpoint(sd)
        opt_state = None
        osd = raw.get("optimizer_state_dict") or {}
        if osd.get("param_groups") and osd.get("state"):
            import optax

            mu, nu, count = torch_convert.convert_adamax_state(osd, list(sd))
            # same chain the Trainer builds (train.py): clip + adamax
            tx = optax.chain(optax.clip_by_global_norm(1.0),
                             optax.adamax(0.002))
            template = serialization.to_state_dict(tx.init(head))
            opt_state = torch_convert.fill_adamax_opt_state(
                template, mu, nu, count)
        ckpt = {
            "epoch": int(raw.get("epoch", 0)),
            "avg_scores": list(raw.get("avg_scores", [])),
            "verb_losses": list(raw.get("verb_losses", [])),
            "nouns_losses": list(raw.get("nouns_losses", [])),
            "val_avg_scores": list(raw.get("val_avg_scores", [])),
            "val_verb_losses": list(raw.get("val_verb_losses", [])),
            "val_nouns_losses": list(raw.get("val_nouns_losses", [])),
            "head_params": head,
            "backbone_params": bparams,
            "backbone_stats": bstats,
            "opt_state": opt_state,
        }
        save_checkpoint(args.dst, ckpt)
        print(f"wrote checkpoint (epoch {ckpt['epoch']}) -> {args.dst}")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
