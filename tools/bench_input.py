#!/usr/bin/env python
"""Standalone input-pipeline benchmark: measures host decode+window
throughput (img/s) for both decoder paths, with and without the decoded
cache, against a synthetic or real image directory.

Usage:
  python tools/bench_input.py [--img_dir DIR] [--n 256] [--batch 64]
                              [--workers 4]

With no --img_dir, synthesizes N JPEGs in a temp dir first.  The number to
beat is the training step's consumption rate (bench.py: ~2950 img/s/chip on
v5e — the host pipeline must sustain batch_size/step_time per chip, or use
--cache_decoded / pre-decoded storage for multi-epoch runs).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img_dir", default="")
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--workers", type=int, default=4)
    args = ap.parse_args()

    import numpy as np

    from situation_recognition_tpu.data.dataset import ImsituDataset, ImsituLoader
    from situation_recognition_tpu.data.encoder import ImsituEncoder

    if args.img_dir:
        img_dir = args.img_dir
        names = sorted(os.listdir(img_dir))[: args.n]
    else:
        from tools.common import synth_jpeg

        tmp = tempfile.mkdtemp(prefix="srtpu_input_bench_")
        rng = np.random.default_rng(0)
        names = []
        for i in range(args.n):
            name = f"synth_{i}.jpg"
            # non-square (340x256): exercises the long-axis window path
            synth_jpeg(rng, os.path.join(tmp, name), wh=(340, 256),
                       quality=90)
            names.append(name)
        img_dir = tmp

    ann = {n: {"verb": "v", "frames": [{"agent": "x"}] * 3} for n in names}
    enc = ImsituEncoder(ann, verbose=False)

    def run(decoder, cache=False, epochs=2):
        ds = ImsituDataset(img_dir, ann, enc, train=True)
        if cache:
            ds.enable_decode_cache()
        loader = ImsituLoader(ds, batch_size=args.batch, shuffle=True,
                              num_workers=args.workers, decoder=decoder)
        rates = []
        for e in range(epochs):
            loader.set_epoch(e)
            t0 = time.perf_counter()
            count = sum(len(b["verbs"]) for b in loader)
            rates.append(count / (time.perf_counter() - t0))
        return rates

    for decoder in ("python", "native"):
        try:
            rates = run(decoder)
            print(f"{decoder:7s}: " + "  ".join(
                f"epoch{i} {r:7.0f} img/s" for i, r in enumerate(rates)))
        except Exception as e:
            print(f"{decoder:7s}: unavailable ({e})")
    rates = run("python", cache=True)
    print("cached : " + "  ".join(
        f"epoch{i} {r:7.0f} img/s" for i, r in enumerate(rates)))


if __name__ == "__main__":
    main()
