#!/usr/bin/env python
"""Export a trained checkpoint as a self-contained serving artifact.

The CLI face of ``situation_recognition_tpu.serving.export_inference``
(previously reachable only programmatically): loads a checkpoint —
this framework's msgpack OR an original torch one, both resolved the
same way ``sr.py --resume_model`` resolves them — and writes a
StableHLO artifact directory with both entries (argmax-verb and the
reference's gt-verb-conditioned path, /root/reference/sr.py:249-261).

Usage:
  python tools/export_serving.py checkpoints/sr artifact_dir \\
      --batch_size 768 [--backbone resnet152] [--weights int8] \\
      [--dataset_folder imSitu] [--precision fp32|bf16]

``--weights bf16|int8`` re-encodes the kernel constants (2x / 4x
smaller) with tested logit deviation bounds
(tests/test_serving.py::test_quantized_weight_exports).
``--external`` writes the weights to a ``weights.msgpack`` side file
instead of baking them into the StableHLO: the program files become
~1 MB, which is the fix for remote-compiler request-size caps that
quantization alone cannot clear on big backbones (a ViT-L/14 entry is
still 299 MB at int8).

The encoder vocabulary is rebuilt from ``<dataset_folder>/train.json``
(the reference's own rule — the checkpoint stores no vocab), so export
needs the same dataset folder the model was trained against.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__.split("\n")[0],
        epilog="See the module docstring for details.")
    ap.add_argument("checkpoint", help="msgpack or torch checkpoint path")
    ap.add_argument("out", help="artifact output directory")
    ap.add_argument("--batch_size", type=int, default=1,
                    help="static serving batch (the loader pads/chunks "
                         "any caller batch size onto it)")
    ap.add_argument("--backbone", default="resnet152",
                    choices=["resnet18", "resnet34", "resnet50",
                             "resnet101", "resnet152", "mini",
                             "vit_l14", "vit_l14_clip", "vit_b16",
                             "vit_tiny"])
    ap.add_argument("--weights", default="f32",
                    choices=["f32", "bf16", "int8"],
                    help="artifact weight encoding (f32 exact; bf16 2x "
                         "smaller kernels; int8 4x, per-channel symmetric)")
    ap.add_argument("--external", action="store_true",
                    help="ship weights as a weights.msgpack side file "
                         "instead of StableHLO constants (program files "
                         "~1 MB; loads with one device_put)")
    ap.add_argument("--target", default="portable",
                    choices=["portable", "tpu"],
                    help="portable: runs on cpu AND tpu (non-Pallas "
                         "paths); tpu: keep the fused Pallas kernels in "
                         "the program — TPU-only artifact, faster "
                         "(export from a TPU host so the trainer "
                         "resolves to the kernels)")
    ap.add_argument("--dataset_folder", default="imSitu",
                    help="folder whose train.json defines the vocabulary")
    ap.add_argument("--precision", default="fp32",
                    choices=["fp32", "bf16"],
                    help="compute dtype BAKED into the artifact "
                         "(bf16 for TPU serving)")
    ap.add_argument("--platform", default="auto", choices=["auto", "cpu"],
                    help='"cpu" forces the CPU backend for the export '
                         "trace (artifacts are platform-portable either "
                         "way)")
    args = ap.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from situation_recognition_tpu.cli import _load_resume
    from situation_recognition_tpu.data.encoder import ImsituEncoder
    from situation_recognition_tpu.parallel.mesh import make_mesh
    from situation_recognition_tpu.serving import export_inference
    from situation_recognition_tpu.train import (
        Trainer, TrainerConfig, default_hidden)

    with open(os.path.join(args.dataset_folder, "train.json")) as f:
        encoder = ImsituEncoder(json.load(f), verbose=False)

    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    cfg = TrainerConfig(hidden=default_hidden(args.backbone),
                        batch_size=args.batch_size, backbone=args.backbone,
                        compute_dtype=dtype)
    # export is a single-device trace (the artifact itself is portable);
    # a 1-device mesh also frees the tool from batch/device divisibility
    trainer = Trainer(encoder, cfg, mesh=make_mesh(num_devices=1))
    _load_resume(trainer, args.checkpoint)

    export_inference(trainer, args.out, batch_size=args.batch_size,
                     weights=args.weights, bake_weights=not args.external,
                     platform=args.target)
    total = sum(os.path.getsize(os.path.join(args.out, f))
                for f in os.listdir(args.out))
    placement = "external" if args.external else "baked"
    print(f"exported {args.out} (batch {args.batch_size}, "
          f"weights {args.weights} {placement}, target {args.target}, "
          f"{total / 1e6:.1f} MB): entries argmax + gt")


if __name__ == "__main__":
    main()
