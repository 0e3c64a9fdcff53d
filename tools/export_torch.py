#!/usr/bin/env python
"""Export framework weights back to torch formats (reverse of convert_torch).

Usage:
  # framework resume checkpoint (msgpack, written every epoch by training)
  # → torch .pth the REFERENCE stack resumes from (sr.py --resume_model)
  python tools/export_torch.py checkpoint checkpoints/model checkpoints/model.pth

  # backbone msgpack ({params, batch_stats}, as written by
  # convert_torch.py backbone / the auto-converted backbone cache)
  # → torchvision-layout state_dict .pth (ResNet or ViT, sniffed)
  python tools/export_torch.py backbone checkpoints/backbone.msgpack bb.pth

Checkpoint mode writes the reference's exact dict (sr.py:145-162):
``model_state_dict`` in registration-order key layout (twin convnets,
/root/reference/model.py:89-111), ``optimizer_state_dict`` in
``torch.optim.Adamax`` layout so the torch run continues the exact
optimizer trajectory, and the epoch + six history lists.  The round trip
(export → tools/convert_torch.py checkpoint) reproduces the framework
state exactly (tests/test_export_torch.py).

Backbone mode emits the fc-less feature extractor (the reference
replaces fc with Identity, model.py:31; ViT exports drop torchvision's
``heads.*``) — load with ``strict=False`` into a stock torchvision model.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["checkpoint", "backbone"])
    ap.add_argument("src", help="framework checkpoint / backbone msgpack")
    ap.add_argument("dst", help="output torch .pth path")
    ap.add_argument("--lr", type=float, default=0.002,
                    help="optimizer lr recorded in param_groups "
                         "(checkpoint mode; the reference's default, "
                         "sr.py:420)")
    args = ap.parse_args()

    import numpy as np
    import torch

    from situation_recognition_tpu.utils.torch_export import (
        export_reference_checkpoint, export_resnet_state, export_vit_state)

    def to_torch(x):
        if isinstance(x, dict):
            return {k: to_torch(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return type(x)(to_torch(v) for v in x)
        if isinstance(x, np.ndarray):
            # copy=True: msgpack-restored arrays are non-writable views,
            # which torch.from_numpy warns about and save would alias
            return torch.from_numpy(np.array(x, copy=True))
        return x

    if args.mode == "backbone":
        from flax import serialization

        with open(args.src, "rb") as f:
            tree = serialization.msgpack_restore(f.read())
        params = tree.get("params", tree)
        stats = tree.get("batch_stats", {})
        if "cls_token" in params:
            sd = export_vit_state(params)
        elif "conv1" in params:
            sd = export_resnet_state(params, stats)
        else:
            raise SystemExit(
                "export_torch: unrecognized backbone tree (expected a "
                "models/resnet.py or models/vit.py params layout)")
        torch.save(to_torch(sd), args.dst)
        n = sum(int(np.asarray(v).size) for v in sd.values())
        print(f"wrote torchvision-layout backbone ({n:,} tensor elements, "
              f"{len(sd)} keys; fc-less — load strict=False) -> {args.dst}")
        return

    from situation_recognition_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(args.src)
    if "backbone_params" not in ckpt or "conv1" not in ckpt.get(
            "backbone_params", {}):
        raise SystemExit(
            "export_torch: checkpoint has no ResNet backbone tree — only "
            "ResNet-backbone checkpoints map onto the reference layout "
            "(the reference has no ViT, /root/reference/model.py:16); "
            "use 'backbone' mode for the ViT feature extractor itself")
    out = export_reference_checkpoint(ckpt, lr=args.lr)

    out["model_state_dict"] = to_torch(out["model_state_dict"])
    if "optimizer_state_dict" in out:
        out["optimizer_state_dict"] = to_torch(out["optimizer_state_dict"])
    torch.save(out, args.dst)
    n = sum(v.numel() for v in out["model_state_dict"].values())
    print(f"wrote torch checkpoint (epoch {out['epoch']}, {n:,} tensor "
          f"elements) -> {args.dst}")


if __name__ == "__main__":
    main()
