#!/usr/bin/env python
"""Pack an image directory into a pre-decoded flat store for training.

Writes ``<out_dir>/images.bin`` (one flat uint8 buffer) and
``<out_dir>/index.json`` ({name: [offset, h, w]}).  Each image is decoded
once and normalized to shorter-side-256 with the EXACT function the live
loader uses (``transforms.normalize_short_side``), so a packed dataset
produces bit-identical training batches while removing JPEG decode from the
input path permanently: cold-epoch reads become memmap slices at
page-cache/NVMe speed instead of ~134 decodes/s per host core.

The random-crop augmentation is unaffected — the full shorter-side-256
image is stored (long side variable), and the loader windows it per epoch
exactly as before.

Usage:
  python tools/pack_dataset.py <img_dir> <out_dir> [--annotations a.json ...]

With --annotations, only images named in the given JSON files are packed
(one pack can serve train/dev/test together); otherwise the whole directory.
Then train with:  python sr.py ... --packed_dir <out_dir>

Sizing: imSitu resized_256 (~125k images, long side ≤ ~500) packs to
~40-50 GB — stream it from local NVMe; RAM page cache makes epoch 2+ free.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("img_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--annotations", nargs="*", default=[],
                    help="JSON annotation files; pack only their image keys")
    args = ap.parse_args()

    import numpy as np

    from situation_recognition_tpu.data.dataset import _decode_image
    from situation_recognition_tpu.data.transforms import normalize_short_side

    if args.annotations:
        names = []
        seen = set()
        for path in args.annotations:
            with open(path) as f:
                for name in json.load(f):
                    if name not in seen:
                        seen.add(name)
                        names.append(name)
    else:
        names = sorted(os.listdir(args.img_dir))

    os.makedirs(args.out_dir, exist_ok=True)
    index = {}
    offset = 0
    t0 = time.perf_counter()
    with open(os.path.join(args.out_dir, "images.bin"), "wb") as out:
        for i, name in enumerate(names):
            # the SAME decode the live loader uses — the pack's
            # bit-identity guarantee holds by construction
            img = _decode_image(os.path.join(args.img_dir, name))
            img = np.ascontiguousarray(normalize_short_side(img))
            h, w = img.shape[:2]
            out.write(img.tobytes())
            index[name] = [offset, h, w]
            offset += h * w * 3
            if (i + 1) % 5000 == 0:
                rate = (i + 1) / (time.perf_counter() - t0)
                print(f"[pack] {i + 1}/{len(names)} ({rate:.0f} img/s)",
                      file=sys.stderr)
    with open(os.path.join(args.out_dir, "index.json"), "w") as f:
        json.dump(index, f)
    print(json.dumps({"packed": len(names), "bytes": offset,
                      "seconds": round(time.perf_counter() - t0, 1)}))


if __name__ == "__main__":
    main()
