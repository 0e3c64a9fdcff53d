"""Generate a LEARNABLE synthetic imSitu dataset (annotations + images).

Purpose: end-to-end accuracy evidence.  The real imSitu dataset (and the
reference's published checkpoint) are not available in this environment, so
the reference's #1 build target — val mean ~= 65.7 at epoch 30
(``/root/reference/README.md:98-107``) — cannot be reproduced directly.
This tool generates a dataset in the exact imSitu schema
(``{img: {"verb": v, "frames": [{role: noun} x 3]}}``,
``/root/reference/utils/imsitu_loader.py:13-20``) whose images *visually
encode* their annotations, so the full training stack (CLI -> encoder ->
loader -> device transforms -> frozen backbone -> GGNN -> heads -> scorer ->
checkpoints) can demonstrate genuine *generalization*: train on one split,
watch held-out dev metrics climb from chance to near-ceiling.  Unlike the
5-image overfit fixture (memorization), dev images here are unseen
verb/noun combinations — the model must learn the visual code.

Visual code (flip-, crop- AND pooling-robust by construction):
* the image is horizontal color bands (uniform along x, so the train-time
  random horizontal flip is a no-op on the signal);
* band 0 (top, 40 px) encodes the VERB as an HSV hue;
* band i+1 (36 px each) encodes role slot i's NOUN as an HSV hue
  ('' -> black, the imSitu empty label); slots beyond the verb's role
  count are mid-gray;
* each ROLE NAME owns a disjoint noun sub-vocabulary (as in real imSitu —
  places are places, agents are people), so the (role -> noun) assignment
  is decodable from position-blind features: the backbone's global
  average pooling sees "which hues are present", and every present hue
  belongs to exactly one of the verb's roles.  A role is empty ('') iff
  none of its nouns is visible.  Without this property the task needs
  band POSITION, which pooled conv features barely carry (measured: dev
  mean plateaus near 45 with a shared noun pool vs near-ceiling with
  disjoint pools);
* bands are thick relative to the random-crop jitter of the 256->224
  window, so every band stays visible under augmentation;
* mild Gaussian pixel noise + JPEG compression keep the task non-trivial
  at the pixel level.

Annotator frames: frame 0 is the ground-truth assignment; frames 1-2 each
re-roll one role with probability ``--disagree`` (default 0.1), exercising
the 3-annotation scoring semantics (``utils/imsitu_scorer.py:44-48``)
while keeping the task learnable.

Outputs under --out: train.json / dev.json / test.json / imsitu_space.json
(minimal gloss table so --test_img / --subset work), and JPEG images under
--img_dir.  Fully deterministic for a given --seed.
"""

from __future__ import annotations

import argparse
import colorsys
import json
import os

import numpy as np

ROLE_POOL = [
    "agent", "place", "tool", "item", "target", "source",
    "destination", "container", "coagent", "surface", "obstacle", "goal",
]


def _hue_rgb(h: float, s: float = 0.9, v: float = 0.95) -> np.ndarray:
    return np.array([round(255 * c) for c in colorsys.hsv_to_rgb(h % 1.0, s, v)],
                    dtype=np.uint8)


def _color_grid(n: int, sats, n_values: int, v_lo: float = 0.30,
                v_hi: float = 0.95, hue_offset: float = 0.0):
    """``n`` maximally-separated HSV colors on a hue x value x saturation
    grid.  At real-imSitu cardinality (2000 nouns) a pure hue wheel puts
    adjacent labels ~0.18 degrees apart — indistinguishable after JPEG —
    so the full-scale mode spreads labels over 3 independent,
    pooling-robust color axes instead.  Returns index -> rgb."""
    per_hue = len(sats) * n_values
    n_h = -(-n // per_hue)
    values = np.linspace(v_lo, v_hi, n_values)
    out = []
    for c in range(n):
        h = (c % n_h) / n_h + hue_offset
        v = values[(c // n_h) % n_values]
        s = sats[c // (n_h * n_values)]
        out.append(_hue_rgb(h, s, v))
    return out


class SynthSpec:
    """Deterministic vocabulary + visual-code tables.

    Default mode (``n_roles=None, total_nouns=None``) reproduces the
    original small-vocab hue-wheel code exactly.  Full-scale mode
    (``--roles/--total_nouns``) targets real-imSitu cardinality
    (504/190/2001, ``/root/reference/README.md:23-26``): the role pool is
    extended procedurally, ``total_nouns`` is distributed near-evenly over
    the roles, and colors come from a 3-D HSV grid — nouns on
    saturations {0.55, 1.0}, verbs exclusively on saturation 0.75, so the
    position-blind "which colors are present" decoding stays well-posed
    even with verb+noun colors sharing the wheel.  ``unk=True`` names one
    noun literally ``'UNK'``, matching the real train vocabulary the
    reference indexes into (``utils/imsitu_encoder.py:190-194``)."""

    def __init__(self, n_verbs: int, nouns_per_role: int,
                 n_roles: int | None = None,
                 total_nouns: int | None = None, unk: bool = False):
        full_scale = total_nouns is not None
        if n_roles is None:
            role_pool = list(ROLE_POOL)
        else:
            role_pool = [ROLE_POOL[i] if i < len(ROLE_POOL)
                         else f"synthrole{i}" for i in range(n_roles)]
        self.role_pool = role_pool
        self.verbs = [f"synthverb{i}" for i in range(n_verbs)]
        # verb i has 1..6 roles, rotating through the role pool so roles are
        # shared across verbs (as in real imSitu); every 6th verb uses the
        # full 6 so max_role_count matches the real dataset's
        self.roles_per_verb = {}
        for i, v in enumerate(self.verbs):
            rc = 1 + (i % 6)
            self.roles_per_verb[v] = [
                role_pool[(i + j) % len(role_pool)] for j in range(rc)]
        # disjoint noun sub-vocabulary per role name (see module docstring)
        if full_scale:
            base, extra = divmod(total_nouns, len(role_pool))
            if base < 2:
                raise ValueError(
                    f"--total_nouns {total_nouns} gives <2 nouns for some "
                    f"of the {len(role_pool)} roles")
            pool_sizes = [base + (1 if r < extra else 0)
                          for r in range(len(role_pool))]
        else:
            pool_sizes = [nouns_per_role] * len(role_pool)
        self.nouns = []
        self.role_nouns = {}
        self._noun_global_idx = {}
        for r_idx, role in enumerate(role_pool):
            pool = [f"n{90000000 + r_idx * 100000 + j}"
                    for j in range(pool_sizes[r_idx])]
            self.role_nouns[role] = pool
            for n in pool:
                self._noun_global_idx[n] = len(self.nouns)
                self.nouns.append(n)
        if unk:
            old = self.role_nouns[role_pool[-1]][-1]
            self._rename_noun(old, "UNK")
        n_nouns = len(self.nouns)
        if full_scale:
            verb_colors = _color_grid(n_verbs, sats=[0.75], n_values=8,
                                      hue_offset=0.31)
            self.verb_rgb = dict(zip(self.verbs, verb_colors))
            noun_colors = _color_grid(n_nouns, sats=[0.55, 1.0], n_values=10)
            self.noun_rgb = {}
            for r_idx, role in enumerate(role_pool):
                for j, n in enumerate(self.role_nouns[role]):
                    # stride by role so a role's OWN nouns (the ones the
                    # model must discriminate) sit far apart on the grid
                    c = (j * len(role_pool) + r_idx) % n_nouns
                    self.noun_rgb[n] = noun_colors[c]
        else:
            self.verb_rgb = {
                v: _hue_rgb(i / n_verbs) for i, v in enumerate(self.verbs)}
            # noun hues: offset half a step so no noun color equals a verb
            # color, and strided by role so a role's nouns sit maximally
            # far apart on the wheel
            self.noun_rgb = {}
            for r_idx, role in enumerate(role_pool):
                for j, n in enumerate(self.role_nouns[role]):
                    h = (j * len(role_pool) + r_idx + 0.5) / n_nouns
                    self.noun_rgb[n] = _hue_rgb(h)
        self.noun_rgb[""] = np.zeros((3,), dtype=np.uint8)

    def _rename_noun(self, old: str, new: str) -> None:
        idx = self._noun_global_idx.pop(old)
        self._noun_global_idx[new] = idx
        self.nouns[idx] = new
        for pool in self.role_nouns.values():
            for j, n in enumerate(pool):
                if n == old:
                    pool[j] = new


def render(spec: SynthSpec, verb: str, assignment: dict,
           rng: np.random.Generator, size: int = 256) -> np.ndarray:
    """Render the band image for one (verb, {role: noun}) annotation."""
    img = np.full((size, size, 3), 128, dtype=np.float32)
    img[:40] = spec.verb_rgb[verb]
    for slot, role in enumerate(spec.roles_per_verb[verb]):
        y0 = 40 + 36 * slot
        img[y0:y0 + 36] = spec.noun_rgb[assignment[role]]
    img += rng.normal(0.0, 8.0, size=img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def sample_annotation(spec: SynthSpec, verb: str, rng: np.random.Generator,
                      empty_p: float, disagree_p: float) -> dict:
    roles = spec.roles_per_verb[verb]
    gt = {}
    for r in roles:
        pool = spec.role_nouns[r]
        gt[r] = ("" if rng.random() < empty_p else
                 pool[int(rng.integers(len(pool)))])
    frames = [dict(gt)]
    for _ in range(2):
        f = dict(gt)
        if rng.random() < disagree_p:
            r = roles[int(rng.integers(len(roles)))]
            pool = spec.role_nouns[r]
            f[r] = pool[int(rng.integers(len(pool)))]
        frames.append(f)
    return {"verb": verb, "frames": frames}


def _patch_label_coverage(spec: SynthSpec, anns: dict) -> None:
    """Force the train split to use every label its verbs can produce.

    The reference encoder maps unseen labels to the literal train label
    'UNK' via ``label_list.index('UNK')``
    (``/root/reference/utils/imsitu_encoder.py:190-194``) — which CRASHES
    when no 'UNK' string exists in the train vocabulary.  The real imSitu
    train split covers its label space; a small synthetic sample might
    not, so rewrite a round-robin of images until every (role, noun) pair
    — including the empty label — appears in some train annotation."""
    by_role = {r: [] for r in spec.role_pool}
    for name, ann in anns.items():
        for role in ann["frames"][0]:
            by_role[role].append(name)
    for role, names in by_role.items():
        if not names:
            continue  # role unused by this verb set -> can't occur in dev/test
        counts: dict = {}
        cur = {}
        for name in names:
            noun = anns[name]["frames"][0][role]
            cur[name] = noun
            counts[noun] = counts.get(noun, 0) + 1
        missing = [n for n in spec.role_nouns[role] + [""]
                   if n not in counts]
        for noun in missing:
            # only rewrite an image whose CURRENT noun occurs elsewhere —
            # overwriting a singleton would erase that noun's last train
            # occurrence and recreate the unseen-label crash downstream
            donor = next((nm for nm in names if counts[cur[nm]] > 1), None)
            if donor is None:
                raise ValueError(
                    f"train split too small to cover role {role!r}: "
                    f"{len(missing)} labels missing over {len(names)} train "
                    f"images using the role — raise --train or lower "
                    f"--nouns_per_role")
            counts[cur[donor]] -= 1
            cur[donor] = noun
            counts[noun] = 1
            for frame in anns[donor]["frames"]:
                frame[role] = noun


def make_split(spec: SynthSpec, n: int, split: str, img_dir: str,
               rng: np.random.Generator, empty_p: float, disagree_p: float,
               quality: int) -> dict:
    from PIL import Image

    anns = {}
    verbs = spec.verbs
    for i in range(n):
        verb = verbs[i % len(verbs)]  # balanced classes
        name = f"{verb}_{split}_{i}.jpg"
        anns[name] = sample_annotation(spec, verb, rng, empty_p, disagree_p)
    if split == "train":
        _patch_label_coverage(spec, anns)
    for name, ann in anns.items():
        verb = ann["verb"]
        img = render(spec, verb, ann["frames"][0], rng)
        Image.fromarray(img).save(os.path.join(img_dir, name),
                                  quality=quality)
    return anns


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--out", default="synth_imSitu",
                   help="annotation output folder")
    p.add_argument("--img_dir", default="synth_resized_256")
    p.add_argument("--verbs", type=int, default=16)
    p.add_argument("--nouns_per_role", type=int, default=4,
                   help="disjoint nouns per role name "
                        f"(total = this x {len(ROLE_POOL)} roles)")
    p.add_argument("--roles", type=int, default=None,
                   help="role-pool size (default: the built-in 12; the real "
                        "imSitu has 190 — names beyond the pool are "
                        "generated)")
    p.add_argument("--total_nouns", type=int, default=None,
                   help="full-scale mode: total non-empty noun vocabulary, "
                        "distributed near-evenly over the roles (overrides "
                        "--nouns_per_role; the real imSitu has 2001 labels "
                        "= 1999 nouns + '' + 'UNK' -> use --total_nouns "
                        "2000 --unk)")
    p.add_argument("--unk", action="store_true",
                   help="name one noun literally 'UNK' (present in the real "
                        "train vocabulary, utils/imsitu_encoder.py:190-194)")
    p.add_argument("--train", type=int, default=2048)
    p.add_argument("--dev", type=int, default=512)
    p.add_argument("--test", type=int, default=512)
    p.add_argument("--empty_p", type=float, default=0.08,
                   help="probability a role's noun is the empty label ''")
    p.add_argument("--disagree", type=float, default=0.1,
                   help="per-frame probability annotators 2/3 re-roll a role")
    p.add_argument("--quality", type=int, default=90, help="JPEG quality")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    os.makedirs(args.img_dir, exist_ok=True)
    spec = SynthSpec(args.verbs, args.nouns_per_role, n_roles=args.roles,
                     total_nouns=args.total_nouns, unk=args.unk)
    rng = np.random.default_rng(args.seed)

    for split, n in (("train", args.train), ("dev", args.dev),
                     ("test", args.test)):
        anns = make_split(spec, n, split, args.img_dir, rng,
                          args.empty_p, args.disagree, args.quality)
        with open(os.path.join(args.out, f"{split}.json"), "w") as f:
            json.dump(anns, f)
        print(f"{split}: {n} images -> {args.img_dir}, "
              f"annotations -> {args.out}/{split}.json")

    # minimal imsitu_space.json so --test_img / --subset gloss lookups work
    space = {
        "nouns": {n: {"gloss": [f"noun{i}"]}
                  for i, n in enumerate(spec.nouns)},
        "verbs": {v: {"order": spec.roles_per_verb[v]} for v in spec.verbs},
    }
    with open(os.path.join(args.out, "imsitu_space.json"), "w") as f:
        json.dump(space, f)
    print(f"imsitu_space.json -> {args.out}")


if __name__ == "__main__":
    main()
