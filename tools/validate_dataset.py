#!/usr/bin/env python
"""Validate an imSitu-layout dataset folder BEFORE a long training run.

The reference tolerates nothing and explains nothing: an annotation with
the wrong frame count dies in its collate, an unseen dev label dies in
``label_list.index('UNK')`` deep inside epoch-1 evaluation
(``/root/reference/utils/imsitu_encoder.py:190-194``), a missing or
corrupt JPEG dies mid-epoch in a DataLoader worker.  This tool runs every
check up front and prints one line per problem, so a multi-hour TPU run
never dies an hour in on data it could have rejected at t=0.

Checks, per split:
  schema    — record is {"verb": v, "frames": [{role: noun} x 3]}; frame
              roles exactly match the verb's role set; 3 frames
  verbs     — dev/test verbs must exist in train.json (the encoder is
              always built from train.json — reference rule)
  labels    — dev/test nouns unseen in train map to 'UNK'; if train has
              no 'UNK' label the reference (and this framework) CRASHES —
              reported as an error, with per-split unseen counts
  images    — file exists under --imgset_dir, decodes, is RGB-convertible;
              size stats (short side < 256 triggers the host upscale path)
  roles     — a verb whose role count exceeds max_role_count across splits
              (schema drift between splits)

Exit code 0 = clean (warnings allowed with --strict off), 1 = errors.

Usage: python tools/validate_dataset.py [--dataset_folder imSitu]
       [--imgset_dir resized_256] [--skip_images] [--strict]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--dataset_folder", default="imSitu")
    ap.add_argument("--imgset_dir", default="resized_256")
    ap.add_argument("--skip_images", action="store_true",
                    help="skip the per-image decode pass (slow on 126k "
                         "images; annotations-only checks remain)")
    ap.add_argument("--strict", action="store_true",
                    help="treat warnings as errors")
    args = ap.parse_args(argv)

    errors: list[str] = []
    warnings: list[str] = []

    def err(msg):
        errors.append(msg)
        print(f"ERROR: {msg}")

    def warn(msg):
        warnings.append(msg)
        print(f"warning: {msg}")

    splits = {}
    for name in ("train.json", "dev.json", "test.json"):
        path = os.path.join(args.dataset_folder, name)
        if not os.path.isfile(path):
            err(f"{path} missing")
            continue
        try:
            with open(path) as f:
                splits[name] = json.load(f)
        except Exception as e:
            err(f"{path}: not valid JSON ({e})")
    if "train.json" not in splits:
        print("validate_dataset: FAILED (no train.json)")
        return 1

    # ---- schema + vocab scan (train first: it defines the vocabulary) ----
    def scan(name, ann):
        verbs, labels = set(), set()
        roles_per_verb: dict = {}
        bad = 0
        for img, rec in ann.items():
            if (not isinstance(rec, dict) or "verb" not in rec
                    or "frames" not in rec):
                bad += 1
                if bad <= 3:
                    err(f"{name}: {img!r} lacks verb/frames keys")
                continue
            v = rec["verb"]
            verbs.add(v)
            frames = rec["frames"]
            if len(frames) != 3:
                bad += 1
                if bad <= 3:
                    err(f"{name}: {img!r} has {len(frames)} frames, "
                        f"expected 3 (the scorer's annotator semantics)")
            roleset = roles_per_verb.setdefault(
                v, frozenset(frames[0].keys()) if frames else frozenset())
            for f_i, frame in enumerate(frames):
                if frozenset(frame.keys()) != roleset:
                    bad += 1
                    if bad <= 3:
                        err(f"{name}: {img!r} frame {f_i} roles "
                            f"{sorted(frame)} != verb {v!r}'s "
                            f"{sorted(roleset)}")
                labels.update(frame.values())
        if bad > 3:
            err(f"{name}: ... and {bad - 3} more schema problems")
        return verbs, labels, roles_per_verb

    train_verbs, train_labels, train_roles = scan("train.json",
                                                  splits["train.json"])
    print(f"train.json: {len(splits['train.json'])} images, "
          f"{len(train_verbs)} verbs, {len(train_labels)} labels")

    max_rc = max((len(r) for r in train_roles.values()), default=0)
    for name in ("dev.json", "test.json"):
        if name not in splits:
            continue
        verbs, labels, roles = scan(name, splits[name])
        missing_verbs = verbs - train_verbs
        if missing_verbs:
            err(f"{name}: {len(missing_verbs)} verbs absent from "
                f"train.json (encoder is ALWAYS built from train.json): "
                f"{sorted(missing_verbs)[:5]}")
        for v, rs in roles.items():
            if v in train_roles and rs != train_roles[v]:
                err(f"{name}: verb {v!r} role set {sorted(rs)} != "
                    f"train's {sorted(train_roles[v])}")
            if len(rs) > max_rc:
                err(f"{name}: verb {v!r} has {len(rs)} roles > train "
                    f"max_role_count {max_rc} (encoder tables are sized "
                    f"from train.json)")
        unseen = labels - train_labels
        if unseen:
            if "UNK" in train_labels:
                warn(f"{name}: {len(unseen)} labels unseen in train map "
                     f"to 'UNK' (reference semantics)")
            else:
                err(f"{name}: {len(unseen)} labels unseen in train and "
                    f"train has NO 'UNK' label — encoding will crash "
                    f"(first: {sorted(unseen)[:5]})")
        print(f"{name}: {len(splits[name])} images, {len(verbs)} verbs")

    # ---- image files ------------------------------------------------------
    if not args.skip_images:
        from PIL import Image

        names = sorted({n for s in splits.values() for n in s})
        missing = corrupt = small = 0
        for i, n in enumerate(names):
            path = os.path.join(args.imgset_dir, n)
            if not os.path.isfile(path):
                missing += 1
                if missing <= 3:
                    err(f"image missing: {path}")
                continue
            try:
                with Image.open(path) as im:
                    w, h = im.size
                    im.convert("RGB").load()
            except Exception as e:
                corrupt += 1
                if corrupt <= 3:
                    err(f"image corrupt: {path} ({e})")
                continue
            if min(w, h) < 256:
                small += 1
            if (i + 1) % 20000 == 0:
                print(f"  checked {i + 1}/{len(names)} images...")
        if missing > 3:
            err(f"... and {missing - 3} more missing images")
        if corrupt > 3:
            err(f"... and {corrupt - 3} more corrupt images")
        if small:
            warn(f"{small}/{len(names)} images have short side < 256 "
                 f"(they take the host PIL upscale path — fine, slower)")
        print(f"images: {len(names)} referenced, {missing} missing, "
              f"{corrupt} corrupt")

    bad = errors or (args.strict and warnings)
    print(f"validate_dataset: {'FAILED' if bad else 'OK'} "
          f"({len(errors)} errors, {len(warnings)} warnings)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
