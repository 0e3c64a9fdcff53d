"""Reference-differential oracle: run the ACTUAL reference code end-to-end.

Every other parity test in this suite checks our stack against clean-room
torch replicas (tests/torch_refmodel.py).  This module closes the loop one
level higher: it executes the real ``/root/reference/sr.py`` + ``model.py``
+ ``utils/*`` — unmodified, as a subprocess — against a checkpoint this
framework trained and exported (``tools/export_torch.py``), and diffs the
two stacks' stdout:

* ``--evaluate_dev``: the reference's eval loop + its own ``imsitu_scorer``
  + its own loss code over our exported weights must print the SAME metric
  lines our ``--evaluate_dev`` prints (discrete metrics byte-equal; losses
  to print precision), with ZERO ``[Missed]`` keys from ``utils.load_net``
  — i.e. our ``model_state_dict`` export covers every parameter and buffer
  the real model owns (``/root/reference/sr.py:478-505``).
* ``--test_img`` (gt-verb and predicted-verb): the reference's ``results()``
  quirk path (``sr.py:235-281``, role-axis softmax) must name the same verb
  and the same role→gloss assignments ours does.

torchvision is not installed here, so the reference runs with the
clean-room shim in ``tests/refshim/torchvision.py`` (see its docstring for
exactly what it supplies and why that does not weaken the oracle: all
weights come from the checkpoint under test, and the shim's preprocessing
geometry is the torchvision geometry our ``--preproc exact`` mode pins
independently).

Both sides run fp32 on CPU (the reference's autocast is a no-op without
CUDA): the comparison is torch-vs-XLA at full precision, so discrete
metric agreement is expected to be exact.
"""

import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

pytestmark = [
    pytest.mark.slow,
    # ~10 min wall on the 1-core rig (the module fixture trains a real
    # CLI checkpoint, then both stacks run full eval subprocesses) —
    # excluded from the default run, `pytest -m xslow` executes it
    pytest.mark.xslow,
    pytest.mark.skipif(not os.path.isdir("/root/reference"),
                       reason="reference checkout not present"),
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIM = os.path.join(os.path.dirname(os.path.abspath(__file__)), "refshim")
REFERENCE = "/root/reference"
CACHE_DIR = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.environ.get("TMPDIR", "/tmp"), "srtpu_test_jax_cache"))


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    """Dataset layout both stacks read: overfitting.json as
    train/dev/test, synthetic 256x256 JPEGs, derived imsitu_space.json
    (same deterministic recipe as tests/test_golden_cli.py)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("ref_diff")
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


def run_ours(workdir, *extra):
    """Our CLI at the reference's flagship widths (ResNet-152, hidden 2048)
    in fp32 on CPU with reference-exact eval preprocessing."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["JAX_COMPILATION_CACHE_DIR"] = CACHE_DIR
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    cmd = [sys.executable, os.path.join(REPO, "sr.py"),
           "--backbone", "resnet152", "--batch_size", "5",
           "--num_workers", "2", "--platform", "cpu",
           "--precision", "fp32", "--seed", "0", "--preproc", "exact",
           *extra]
    r = subprocess.run(cmd, cwd=workdir, env=env, timeout=2400,
                       capture_output=True, text=True,
                       stdin=subprocess.DEVNULL)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    return r.stdout


def run_reference(workdir, *extra, folder="ref_ckpt"):
    """The real /root/reference/sr.py under the torchvision shim."""
    env = dict(os.environ)
    env["PYTHONPATH"] = SHIM
    env["MPLBACKEND"] = "Agg"
    # The reference pickles its encoder to <saving_folder>/encoder via
    # torch.save and re-loads it on later runs (sr.py:442-447); under
    # torch>=2.6's weights_only=True default that reload of an arbitrary
    # pickled class fails, so clear the cache and let each run rebuild the
    # encoder from train.json (same insertion-order scan either way).
    enc_cache = os.path.join(workdir, folder, "encoder")
    if os.path.exists(enc_cache):
        os.remove(enc_cache)
    cmd = [sys.executable, os.path.join(REFERENCE, "sr.py"),
           "--saving_folder", folder, "--batch_size", "5",
           "--num_workers", "0", *extra]
    r = subprocess.run(cmd, cwd=workdir, env=env, timeout=2400,
                       capture_output=True, text=True,
                       stdin=subprocess.DEVNULL)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    # utils.load_net prints [Missed] per absent key and falls into pdb on
    # size mismatches — any of these means the export is incomplete.
    assert "[Missed]" not in r.stdout, r.stdout
    assert "Error loading" not in r.stdout, r.stdout
    return r.stdout


@pytest.fixture(scope="module")
def exported(workdir):
    """Train a few epochs here, export the checkpoint to the reference's
    .pth layout, and stage it in the reference's saving_folder."""
    run_ours(workdir, "--epochs", "3")
    ref_folder = os.path.join(workdir, "ref_ckpt")
    os.makedirs(ref_folder, exist_ok=True)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_torch.py"),
         "checkpoint", os.path.join(workdir, "checkpoints", "sr"),
         os.path.join(ref_folder, "sr_ref.pth")],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    return "sr_ref.pth"


def metric_block(stdout):
    """The four eval-result lines: val losses, 1-, 5-, gt+mean."""
    lines = stdout.splitlines()
    idx = [i for i, l in enumerate(lines) if l.startswith("val losses = ")]
    assert idx, stdout
    i = idx[-1]
    return lines[i:i + 4]


def parse_losses(line):
    return [float(x) for x in re.findall(r"[-\d.]+", line)]


def prediction_lines(stdout):
    """('action'|role, prob, value) triples from a --test_img transcript."""
    out = []
    for line in stdout.splitlines():
        m = re.match(r"^(\S+) \((\d+\.\d\d)%\): (.*)$", line)
        if m:
            out.append((m.group(1), float(m.group(2)), m.group(3)))
    return out


def test_reference_evaluates_our_exported_checkpoint(workdir, exported):
    """The real reference eval stack reproduces our metrics on the exported
    checkpoint: discrete metric lines byte-equal, losses to print noise."""
    ref = run_reference(workdir, "--evaluate_dev", "--resume_model", exported)
    ours = run_ours(workdir, "--evaluate_dev", "--resume_model", "sr")

    rblock, oblock = metric_block(ref), metric_block(ours)
    # top-1 / top-5 / gt+mean lines: discrete card means — byte equality.
    assert rblock[1] == oblock[1], (rblock, oblock)
    assert rblock[2] == oblock[2], (rblock, oblock)
    assert rblock[3] == oblock[3], (rblock, oblock)
    # losses: fp32 torch conv stack vs fp32 XLA conv stack; printed at 2dp.
    rl, ol = parse_losses(rblock[0]), parse_losses(oblock[0])
    assert len(rl) == len(ol) == 3
    np.testing.assert_allclose(ol, rl, atol=0.02)


def test_reference_evaluate_test_matches(workdir, exported):
    """--evaluate_test goes through the shuffled test loader (sr.py:461-463)
    — order-invariant at one batch, so metrics must still agree."""
    ref = run_reference(workdir, "--evaluate_test", "--resume_model", exported)
    ours = run_ours(workdir, "--evaluate_test", "--resume_model", "sr")
    rblock, oblock = metric_block(ref), metric_block(ours)
    assert rblock[1:] == oblock[1:], (rblock, oblock)
    np.testing.assert_allclose(parse_losses(oblock[0]),
                               parse_losses(rblock[0]), atol=0.02)


def test_reference_test_img_gt_verb_matches(workdir, exported):
    """results() with a gt verb: probability-100 contract, same role→gloss
    map, role-axis-softmax probabilities to print noise (sr.py:249-267)."""
    with open(os.path.join(workdir, "imSitu", "train.json")) as f:
        ann = json.load(f)
    name = sorted(ann)[0]
    verb = ann[name]["verb"]
    img = os.path.join("resized_256", name)

    ref = run_reference(workdir, "--test_img", img, "--verb", verb,
                        "--resume_model", exported)
    ours = run_ours(workdir, "--test_img", img, "--verb", verb,
                    "--resume_model", "sr")

    rp, op = prediction_lines(ref), prediction_lines(ours)
    assert rp and op
    assert rp[0][0] == op[0][0] == "action"
    assert rp[0][1] == op[0][1] == 100.0
    assert rp[0][2] == op[0][2] == verb
    # same roles in order, same predicted glosses (argmax over 2001 labels)
    assert [(r, v) for r, _, v in rp[1:]] == [(r, v) for r, _, v in op[1:]]
    np.testing.assert_allclose([p for _, p, _ in op[1:]],
                               [p for _, p, _ in rp[1:]], atol=0.5)


def masked_probs(stdout, start_marker="&&&"):
    """Mask probability values and object addresses out of a transcript,
    returning (masked_text, [probs]) from the first marker line on."""
    lines = stdout.splitlines()
    idx = [i for i, l in enumerate(lines) if l.startswith(start_marker)]
    assert idx, stdout
    text = "\n".join(lines[idx[0]:])
    text = re.sub(r"0x[0-9A-Fa-f]{6,}", "0xADDR", text)
    probs = [float(p) for p in re.findall(r"\((\d+\.\d\d)%\)", text)]
    text = re.sub(r"\(\d+\.\d\d%\)", "(P%)", text)
    return text, probs


def test_reference_subset_matches(workdir, exported):
    """--subset: the shim's sitecustomize seeds the reference's stdlib RNG
    to our --seed 0 stream, so both stacks sample the SAME with-replacement
    indices (sr.py:294-295) and must print the same predictions and ground
    truth; probabilities (role-axis softmax quirk) compared to print noise."""
    ref = run_reference(workdir, "--subset", "4", "--resume_model", exported)
    ours = run_ours(workdir, "--subset", "4", "--resume_model", "sr")

    rtext, rprobs = masked_probs(ref)
    otext, oprobs = masked_probs(ours)
    assert rtext == otext, f"--- ref ---\n{rtext}\n--- ours ---\n{otext}"
    np.testing.assert_allclose(oprobs, rprobs, atol=0.5)


def test_reference_trains_from_our_export_and_round_trips(workdir, exported):
    """Interop round trip THROUGH the real reference train loop:

    1. the reference resumes our exported checkpoint in TRAIN mode — this
       path does a strict ``load_state_dict`` (sr.py:37-41), proving the
       export's key set EQUALS the real model's (not merely covers it),
       and restores the exported Adamax ``optimizer_state_dict``;
    2. it trains two epochs on CPU (RNG streams differ across frameworks,
       so this leg is a behavioral run, not a numeric lockstep) and saves
       its own checkpoint (sr.py:145-162);
    3. ``tools/convert_torch.py`` brings that torch-trained checkpoint
       BACK into this framework, which evaluates it.

    A reference user can therefore move checkpoints in both directions
    mid-training without retraining either side."""
    import shutil

    train_folder = os.path.join(workdir, "ref_train")
    os.makedirs(train_folder, exist_ok=True)
    shutil.copy(os.path.join(workdir, "ref_ckpt", exported),
                os.path.join(train_folder, exported))

    # exported epoch is 3, so --epochs 5 trains epochs 3 and 4
    ref = run_reference(workdir, "--epochs", "5", "--resume_model", exported,
                        folder="ref_train")
    assert "Model training started!" in ref
    assert "Epoch-3, lr: 0.0020" in ref and "Epoch-4, lr: 0.0020" in ref
    assert "training losses = " in ref

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_torch.py"),
         "checkpoint", os.path.join(train_folder, exported),
         os.path.join(workdir, "checkpoints", "sr_back")],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])

    ours = run_ours(workdir, "--evaluate_dev", "--resume_model", "sr_back")
    block = metric_block(ours)
    assert all(np.isfinite(parse_losses(block[0])))


def test_reference_test_img_predicted_verb_matches(workdir, exported):
    """results() without a verb: both stacks predict the same verb via
    their own argmax and report a close softmax probability."""
    with open(os.path.join(workdir, "imSitu", "train.json")) as f:
        ann = json.load(f)
    name = sorted(ann)[0]
    img = os.path.join("resized_256", name)

    ref = run_reference(workdir, "--test_img", img, "--resume_model", exported)
    ours = run_ours(workdir, "--test_img", img, "--resume_model", "sr")

    assert "No ground truth verb found" in ref
    assert "No ground truth verb found" in ours
    rp, op = prediction_lines(ref), prediction_lines(ours)
    assert rp[0][0] == op[0][0] == "action"
    assert rp[0][2] == op[0][2]
    assert abs(rp[0][1] - op[0][1]) < 0.5
    assert [(r, v) for r, _, v in rp[1:]] == [(r, v) for r, _, v in op[1:]]
