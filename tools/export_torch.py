#!/usr/bin/env python
"""Export a framework checkpoint back to a reference-shaped torch checkpoint.

Usage:
  # framework resume checkpoint (msgpack, as written every epoch by training)
  # → torch .pth the REFERENCE stack resumes from (sr.py --resume_model)
  python tools/export_torch.py checkpoints/model_tpu checkpoints/model_torch.pth

This is the reverse of tools/convert_torch.py: a model trained (or
fine-tuned) on TPU becomes a ``torch.save`` file with the reference's
``model_state_dict`` key layout (twin convnets included,
/root/reference/model.py:89-111), its ``optimizer_state_dict`` in
``torch.optim.Adamax`` layout so the torch run continues the exact
optimizer trajectory, and the epoch + six history lists (sr.py:145-162).
The round trip (export → tools/convert_torch.py checkpoint) reproduces
the framework state exactly (tests/test_export_torch.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help="framework checkpoint (msgpack)")
    ap.add_argument("dst", help="output torch .pth path")
    ap.add_argument("--lr", type=float, default=0.002,
                    help="optimizer lr recorded in param_groups "
                         "(the reference's default, sr.py:420)")
    args = ap.parse_args()

    import numpy as np
    import torch

    from situation_recognition_tpu.utils.checkpoint import load_checkpoint
    from situation_recognition_tpu.utils.torch_export import (
        export_reference_checkpoint)

    ckpt = load_checkpoint(args.src)
    if "backbone_params" not in ckpt or "conv1" not in ckpt.get(
            "backbone_params", {}):
        raise SystemExit(
            "export_torch: checkpoint has no ResNet backbone tree — only "
            "ResNet-backbone checkpoints map onto the reference layout "
            "(the reference has no ViT, /root/reference/model.py:16)")
    out = export_reference_checkpoint(ckpt, lr=args.lr)

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

    out["model_state_dict"] = to_torch(out["model_state_dict"])
    if "optimizer_state_dict" in out:
        out["optimizer_state_dict"] = to_torch(out["optimizer_state_dict"])
    torch.save(out, args.dst)
    n = sum(v.numel() for v in out["model_state_dict"].values())
    print(f"wrote torch checkpoint (epoch {out['epoch']}, {n:,} tensor "
          f"elements) -> {args.dst}")


if __name__ == "__main__":
    main()
