"""Chip-time the fused ViT encoder-block kernels' attention-core variants.

Times a 4-block forward stack at a ViT parity shape (default L/14:
B=256, N=257, D=1024, heads=16, bf16) for each of:

  * ``flax``          — the plain jnp/XLA reference block
  * ``pallas:softmax``— fused kernels, baseline f32 softmax core
  * ``pallas:exp2``   — fused kernels, folded exp2 core (scale/log2e
                        pre-multiplied into q, denominator divided into
                        the context rows — removes both N x N VPU
                        elementwise passes)

Prints one JSON line per variant.  This is the harness behind the
SRTPU_ATTN_CORE default decision recorded in PERF.md (the exp2 variant
shipped CPU-verified in r6 with its chip timing pending a wedged
tunnel; run this on the live chip to decide the default).

Usage:  python tools/bench_vit_block.py [--batch 256] [--blocks 4]
        [--width l14|b16] [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


WIDTHS = {
    "l14": dict(n=257, d=1024, heads=16),
    "b16": dict(n=197, d=768, heads=12),
}


def _params(rng: np.random.Generator, d: int):
    import jax.numpy as jnp

    hid = 4 * d

    def w(*shape, scale=0.02):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    return (w(d, d), w(d), w(d, d), w(d), w(d, d), w(d),      # q k v
            w(d, d), w(d),                                     # out proj
            1.0 + w(d), w(d), 1.0 + w(d), w(d),                # ln1, ln2
            w(d, hid), w(hid), w(hid, d), w(d))                # mlp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--width", choices=sorted(WIDTHS), default="l14")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from situation_recognition_tpu.ops.vit_pallas import (
        _reference_block, fused_block_supported, fused_encoder_block)

    shape = WIDTHS[args.width]
    n, d, heads = shape["n"], shape["d"], shape["heads"]
    if not fused_block_supported(d, heads, n, args.batch):
        raise SystemExit(f"fused kernels unsupported at {shape}")

    rng = np.random.default_rng(0)
    weights = [_params(rng, d) for _ in range(args.blocks)]
    x = jnp.asarray(rng.standard_normal((args.batch, n, d)) * 0.1,
                    jnp.bfloat16)

    def stack(block):
        @jax.jit
        def run(x):
            for w in weights:
                x = block(x, *w)
            return x
        return run

    variants = {
        "flax": stack(functools.partial(
            _reference_block, heads=heads, eps=1e-6, quick_gelu=False)),
        "pallas:softmax": stack(functools.partial(
            fused_encoder_block, heads=heads, eps=1e-6, quick_gelu=False,
            attn_core="softmax")),
        "pallas:exp2": stack(functools.partial(
            fused_encoder_block, heads=heads, eps=1e-6, quick_gelu=False,
            attn_core="exp2")),
    }

    outs = {}
    for name, fn in variants.items():
        outs[name] = np.asarray(fn(x), np.float32)    # compile + correctness
        best = float("inf")
        for _ in range(3):                            # 3 timing reps, min
            t0 = time.perf_counter()
            for _ in range(args.iters):
                y = fn(x)
            y.block_until_ready()
            best = min(best, (time.perf_counter() - t0) / args.iters)
        print(json.dumps({
            "variant": name, "ms_per_block": round(best * 1e3 / args.blocks, 3),
            "ms_stack": round(best * 1e3, 2), "batch": args.batch,
            "tokens": n, "width": d, "blocks": args.blocks,
            "device": jax.devices()[0].device_kind}), flush=True)

    ref = outs["flax"]
    scale = float(np.max(np.abs(ref)))
    for name in ("pallas:softmax", "pallas:exp2"):
        diff = float(np.max(np.abs(outs[name] - ref)))
        print(json.dumps({"variant": name, "max_abs_diff_vs_flax": diff,
                          "ref_scale": scale}), flush=True)


if __name__ == "__main__":
    main()
