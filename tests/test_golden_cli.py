"""Golden-transcript CLI tests: byte-exact stdout for all five modes.

The reference README transcripts (/root/reference/README.md:20-73) are its
de-facto golden outputs; these tests freeze OUR seeded transcripts (stub mini
model, fixed fixture dataset, deterministic synthetic JPEGs) under
``tests/golden/`` and diff exactly — a drifted float format, reordered line,
or changed metric value fails where test_cli.py's shape regexes cannot.

Regenerate after an intentional output change with:

    SRTPU_REGEN_GOLDENS=1 python -m pytest tests/test_golden_cli.py -q

and review the golden diff like any other code change.

Normalization: memory addresses in PIL/IPython ``display()`` reprs are the
only nondeterministic stdout bytes; they are masked before comparison.
"""

import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

# Integration tier: every test here shells out / runs full epochs;
# excluded from the fast unit tier (pytest -m 'not slow').
pytestmark = pytest.mark.slow


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
REGEN = os.environ.get("SRTPU_REGEN_GOLDENS") == "1"
CACHE_DIR = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.environ.get("TMPDIR", "/tmp"), "srtpu_test_jax_cache"))


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    """Deterministic dataset layout (same recipe as test_cli, fixed seeds)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("golden_cli")
    ds = root / "imSitu"
    ds.mkdir()
    with open(os.path.join(REPO, "imSitu", "overfitting.json")) as f:
        ann = json.load(f)
    for name in ("train.json", "dev.json", "test.json"):
        with open(ds / name, "w") as f:
            json.dump(ann, f)

    verbs, nouns = {}, {}
    for img, rec in ann.items():
        roles = {}
        for frame in rec["frames"]:
            for role, label in frame.items():
                roles.setdefault(role, {})
                if label and label != "UNK":
                    nouns.setdefault(label, {"gloss": [label + "_gloss"]})
        verbs.setdefault(rec["verb"], {"roles": roles})
    with open(ds / "imsitu_space.json", "w") as f:
        json.dump({"nouns": nouns, "verbs": verbs}, f)

    imgs = root / "resized_256"
    imgs.mkdir()
    rng = np.random.default_rng(0)
    for name in ann:
        low = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        arr = np.asarray(Image.fromarray(low).resize((256, 256),
                                                     Image.BILINEAR))
        Image.fromarray(arr).save(imgs / name, quality=95)
    return str(root)


def run_cli(workdir, *extra):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["JAX_COMPILATION_CACHE_DIR"] = CACHE_DIR
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    cmd = [sys.executable, os.path.join(REPO, "sr.py"),
           "--backbone", "mini", "--batch_size", "5", "--num_workers", "2",
           "--platform", "cpu",
           "--precision", "fp32", "--seed", "0", *extra]
    r = subprocess.run(cmd, cwd=workdir, env=env, timeout=900,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-3000:]
    return r.stdout


def normalize(text: str) -> str:
    # PIL/IPython display() reprs embed object addresses
    return re.sub(r"0x[0-9A-Fa-f]{6,}", "0xADDR", text)


def check(name: str, stdout: str):
    got = normalize(stdout)
    path = os.path.join(GOLDEN_DIR, name)
    if REGEN:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            f.write(got)
        pytest.skip(f"regenerated {name}")
    with open(path) as f:
        want = f.read()
    assert got == want, (
        f"stdout drifted from tests/golden/{name}; if intentional, "
        f"regenerate with SRTPU_REGEN_GOLDENS=1 and review the diff.\n"
        f"--- got ---\n{got}\n--- want ---\n{want}")


# Modes run in a fixed order: train first (builds + caches the encoder and
# writes the 'sr' checkpoint).  NOTE: like the reference, evaluate/test_img/
# subset do NOT load a checkpoint unless --resume_model is passed — those
# goldens pin seeded-random-weight outputs; checkpoint restore is covered by
# the resume golden below.

@pytest.fixture(scope="module")
def trained(workdir):
    out = run_cli(workdir, "--epochs", "1")
    return out


def test_golden_train(trained):
    check("train.txt", trained)


def test_golden_resume(workdir, trained):
    """Covers msgpack checkpoint restore end-to-end: epoch-1 continues from
    the saved epoch-0 state, histories intact."""
    check("resume.txt", run_cli(workdir, "--epochs", "2",
                                "--resume_model", "sr"))


def test_golden_evaluate_dev(workdir, trained):
    check("evaluate_dev.txt", run_cli(workdir, "--evaluate_dev"))


def test_golden_evaluate_test(workdir, trained):
    check("evaluate_test.txt", run_cli(workdir, "--evaluate_test"))


def test_golden_test_img_with_verb(workdir, trained):
    check("test_img_verb.txt", run_cli(
        workdir, "--test_img", "resized_256/glaring_215.jpg",
        "--verb", "glaring"))


def test_golden_test_img_predicted(workdir, trained):
    check("test_img_pred.txt", run_cli(
        workdir, "--test_img", "resized_256/talking_90.jpg"))


def test_golden_subset(workdir, trained):
    check("subset.txt", run_cli(workdir, "--subset", "2"))
