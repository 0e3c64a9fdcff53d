"""End-to-end CLI tests: run ``sr.py`` as a subprocess against a synthetic
dataset folder, covering all five modes and stdout parity shapes."""

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


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    """A cwd with imSitu/{train,dev,test,imsitu_space}.json + images dir."""
    from PIL import Image

    root = tmp_path_factory.mktemp("cli")
    ds = root / "imSitu"
    ds.mkdir()
    with open(os.path.join(REPO, "imSitu", "overfitting.json")) as f:
        ann = json.load(f)
    for name in ("train.json", "dev.json", "test.json"):
        with open(ds / name, "w") as f:
            json.dump(ann, f)

    # synthetic imsitu_space: verbs with ordered roles, nouns with glosses
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
        arr = np.asarray(Image.fromarray(low).resize((256, 256), Image.BILINEAR))
        Image.fromarray(arr).save(imgs / name, quality=95)
    return str(root)


CACHE_DIR = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.environ.get("TMPDIR", "/tmp"), "srtpu_test_jax_cache"))


def run_cli(workdir, *extra, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env.pop("XLA_FLAGS", None)
    # share compiled executables across the subprocess runs
    env["JAX_COMPILATION_CACHE_DIR"] = CACHE_DIR
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    cmd = [sys.executable, os.path.join(REPO, "sr.py"),
           "--backbone", "mini", "--batch_size", "5", "--num_workers", "2",
           "--platform", "cpu",
           "--precision", "fp32", *extra]
    return subprocess.run(cmd, cwd=workdir, env=env, timeout=timeout,
                          capture_output=True, text=True)


def test_train_mode(workdir):
    r = run_cli(workdir, "--epochs", "1")
    assert r.returncode == 0, r.stderr[-3000:]
    out = r.stdout
    assert "train set stats: \n\t verb count: 5" in out
    assert "Model training started!" in out
    assert re.search(r"Epoch-0, lr: 0\.0020\n", out)
    assert re.search(r"training losses = \[v: \d+\.\d\d, n: \d+\.\d\d, gt: \d+\.\d\d\]", out)
    assert re.search(r"1-verb: \d+\.\d\d, 1-value: ", out)
    assert re.search(r"val losses = \[v: ", out)
    assert os.path.exists(os.path.join(workdir, "checkpoints", "sr"))
    assert os.path.exists(os.path.join(workdir, "checkpoints", "sr.png"))
    assert os.path.exists(os.path.join(workdir, "checkpoints", "encoder"))


def test_evaluate_dev_mode(workdir):
    r = run_cli(workdir, "--evaluate_dev")
    assert r.returncode == 0, r.stderr[-3000:]
    assert "Loading encoder file" in r.stdout  # cached by train run
    assert "=> evaluating model with dev-set..." in r.stdout
    assert re.search(r"gt-value: \d+\.\d\d, gt-value-all: \d+\.\d\d, mean = ", r.stdout)


def test_evaluate_test_mode(workdir):
    r = run_cli(workdir, "--evaluate_test")
    assert r.returncode == 0, r.stderr[-3000:]
    assert "=> evaluating model with test-set..." in r.stdout


def test_test_img_mode_with_verb(workdir):
    img = os.path.join(workdir, "resized_256", "glaring_215.jpg")
    r = run_cli(workdir, "--test_img", img, "--verb", "glaring")
    assert r.returncode == 0, r.stderr[-3000:]
    out = r.stdout
    assert "&" * 50 in out
    assert "Analizing: " in out
    assert re.search(r"action \(100\.00%\): glaring", out)
    # three roles of glaring printed with probabilities
    for role in ("place", "perceiver", "agent"):
        assert re.search(rf"{role} \(\d+\.\d\d%\): ", out), (role, out)


def test_test_img_mode_predicted_verb(workdir):
    img = os.path.join(workdir, "resized_256", "talking_90.jpg")
    r = run_cli(workdir, "--test_img", img)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "No ground truth verb found, calculating by myself..." in r.stdout
    assert re.search(r"action \(\d+\.\d\d%\): \w+", r.stdout)


def test_subset_mode(workdir):
    r = run_cli(workdir, "--subset", "2")
    assert r.returncode == 0, r.stderr[-3000:]
    out = r.stdout
    assert out.count("&" * 35) == 2
    assert "---- Ground truth ----" in out
    assert re.search(r"action: \w+", out)
    assert re.search(r"\w+ = \[.*, .*, .*\]", out)


def test_resume_mode(workdir):
    r = run_cli(workdir, "--epochs", "2", "--resume_model", "sr")
    assert r.returncode == 0, r.stderr[-3000:]
    assert "Resume training from: sr" in r.stdout
    assert "Epoch-1," in r.stdout
    assert "Epoch-0," not in r.stdout


def test_reference_pickle_encoder_cache_rebuilt(workdir):
    """Migrate-in-place workflow: a reference checkpoints/ dir contains an
    'encoder' file written by torch.save (pickle bytes, sr.py:444-447).
    The CLI must sniff it, print the reference's 'Loading encoder file'
    line, and rebuild the (identical, derived) vocab from train.json
    instead of crashing in json.load."""
    import shutil

    folder = os.path.join(workdir, "ckpt_refpickle")
    os.makedirs(folder, exist_ok=True)
    with open(os.path.join(folder, "encoder"), "wb") as f:
        f.write(b"\x80\x02" + b"\x00" * 64)   # legacy pickle magic
    try:
        r = run_cli(workdir, "--saving_folder", "ckpt_refpickle",
                    "--evaluate_dev")
        assert r.returncode == 0, r.stderr[-2000:]
        assert "Loading encoder file" in r.stdout
        assert "reference torch pickle" in r.stderr
        # the reference's torch.load prints NO stats block — neither must
        # the rebuild (stdout byte-compatibility)
        assert "train set stats" not in r.stdout
        assert "=> evaluating model with dev-set..." in r.stdout
    finally:
        shutil.rmtree(folder, ignore_errors=True)


def test_cache_device_scopes_to_the_mode_splits(tmp_path):
    """`--cache_device --evaluate_dev` on a dataset whose TRAIN images are
    non-square (the standard resized_256 layout) must work: the window
    cache applies to the split the mode iterates (dev), not eagerly to
    all three (the round-2 bug: caching the train split first tripped its
    square-source gate before the dev loader existed)."""
    from PIL import Image

    with open(os.path.join(REPO, "imSitu", "overfitting.json")) as f:
        ann = json.load(f)
    ds = tmp_path / "imSitu"
    ds.mkdir()
    for name in ("train.json", "dev.json", "test.json"):
        with open(ds / name, "w") as f:
            json.dump(ann, f)
    imgs = tmp_path / "resized_256"
    imgs.mkdir()
    rng = np.random.default_rng(0)
    for name in ann:   # landscape 256x341: eval windows fine, train gate not
        arr = rng.integers(0, 255, (256, 341, 3), dtype=np.uint8)
        Image.fromarray(arr).save(imgs / name, quality=95)

    r = run_cli(str(tmp_path), "--cache_device", "--evaluate_dev")
    assert r.returncode == 0, r.stderr[-3000:]
    assert "=> evaluating model with dev-set..." in r.stdout


def test_cache_device_hbm_budget_falls_back_to_streaming(tmp_path):
    """When a split's window array exceeds the HBM budget (r4: probed
    device capacity minus the working-set reserve, overridable via
    SRTPU_HBM_BYTES), --cache_device must STREAM that split with a
    stderr note instead of OOMing mid-run — caching is an optimization,
    not a semantic."""
    from PIL import Image

    with open(os.path.join(REPO, "imSitu", "overfitting.json")) as f:
        ann = json.load(f)
    ds = tmp_path / "imSitu"
    ds.mkdir()
    for name in ("train.json", "dev.json", "test.json"):
        with open(ds / name, "w") as f:
            json.dump(ann, f)
    imgs = tmp_path / "resized_256"
    imgs.mkdir()
    rng = np.random.default_rng(0)
    for name in ann:
        arr = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
        Image.fromarray(arr).save(imgs / name, quality=95)

    env_budget = {"SRTPU_HBM_BYTES": "1"}    # reserve eats it -> stream
    old = os.environ.get("SRTPU_HBM_BYTES")
    os.environ.update(env_budget)
    try:
        r = run_cli(str(tmp_path), "--cache_device", "--evaluate_dev")
    finally:
        if old is None:
            os.environ.pop("SRTPU_HBM_BYTES", None)
        else:
            os.environ["SRTPU_HBM_BYTES"] = old
    assert r.returncode == 0, r.stderr[-3000:]
    assert "streaming it instead" in r.stderr
    assert "=> evaluating model with dev-set..." in r.stdout


def test_cache_device_and_cache_decoded_rejected(workdir):
    r = run_cli(workdir, "--cache_device", "--cache_decoded", "--epochs", "1")
    assert r.returncode == 2
    assert "alternatives" in r.stderr


def test_packed_with_exact_preproc_rejected(workdir):
    r = run_cli(workdir, "--packed_dir", "somewhere", "--preproc", "exact",
                "--evaluate_dev")
    assert r.returncode == 2
    assert "reference-exact parity" in r.stderr


def test_one_char_resume_name_still_warns_random_backbone(workdir):
    """--resume_model with a length-1 name never resumes (the reference's
    `len > 1` quirk); the random-backbone warning must use the SAME gate —
    it was previously suppressed by mere truthiness, silently training
    from scratch with no signal either way."""
    r = run_cli(workdir, "--epochs", "1", "--resume_model", "m",
                "--saving_folder", "ckpt_onechar")
    assert r.returncode == 0, r.stderr[-3000:]
    assert "Resume training from" not in r.stdout
    assert "no pretrained backbone found" in r.stderr


def test_subset_mode_works_from_packed_store(workdir, tmp_path):
    """--subset under --packed_dir with NO original JPEGs on disk: the
    display image must come from the dataset (the pack), not a re-open of
    the original file (which crashed the whole analysis mid-loop)."""
    pack = str(tmp_path / "pack")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "pack_dataset.py"),
         os.path.join(workdir, "resized_256"), pack],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    empty = tmp_path / "no_images"
    empty.mkdir()
    r = run_cli(workdir, "--subset", "2", "--packed_dir", pack,
                "--imgset_dir", str(empty))
    assert r.returncode == 0, r.stderr[-3000:]
    assert "Analizing: " in r.stdout


def test_sigterm_preemption_exits_clean_and_resumes(workdir):
    """Real-signal preemption drill: SIGTERM mid-training must produce a
    resumable checkpoint, the stderr notice, and exit code 0 (what a
    cluster scheduler's eviction sees); --resume_model then continues."""
    import signal
    import time

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["JAX_COMPILATION_CACHE_DIR"] = CACHE_DIR
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    folder = "checkpoints_preempt"
    cmd = [sys.executable, os.path.join(REPO, "sr.py"),
           "--backbone", "mini", "--batch_size", "2", "--num_workers", "2",
           "--platform", "cpu", "--precision", "fp32",
           "--epochs", "1000", "--saving_folder", folder]
    # stdout/stderr go to FILES, not pipes: an undrained PIPE caps the
    # child at 64 KB of output, and on this rig every warm-compile-cache
    # load emits a ~3 KB XLA cpu_aot_loader machine-feature warning to
    # stderr (~58 KB before epoch 0) — the child deadlocked mid-startup
    # blocked in write(2) and the test timed out having seen no
    # checkpoint.  Files decouple the drill from the child's verbosity.
    out_f = open(os.path.join(workdir, "preempt_out.log"), "w+")
    err_f = open(os.path.join(workdir, "preempt_err.log"), "w+")
    p = subprocess.Popen(cmd, cwd=workdir, env=env,
                         stdout=out_f, stderr=err_f, text=True)
    try:
        ckpt = os.path.join(workdir, folder, "sr")
        deadline = time.time() + 420
        while time.time() < deadline and not os.path.exists(ckpt):
            assert p.poll() is None, open(err_f.name).read()[-3000:]
            time.sleep(0.5)
        assert os.path.exists(ckpt), "no checkpoint within the deadline"
        time.sleep(1.0)  # get past the save into the next epoch's work
        p.send_signal(signal.SIGTERM)
        p.wait(timeout=180)
    finally:
        if p.poll() is None:
            p.kill()
            p.wait()
        out_f.close()
        err_f.close()
    err = open(err_f.name).read()
    assert p.returncode == 0, (p.returncode, err[-3000:])
    # two honest notices depending on where the signal lands: mid-epoch
    # stops write a fresh boundary snapshot ("saved resumable checkpoint");
    # between-epochs stops point at the end-of-epoch save already on disk
    # ("no new snapshot").  Either way the checkpoint below must resume.
    assert ("[srtpu] SIGTERM: saved resumable checkpoint" in err
            or "[srtpu] SIGTERM: exiting cleanly" in err), err[-3000:]

    from situation_recognition_tpu.utils.checkpoint import load_checkpoint

    state = load_checkpoint(ckpt)
    saved_epoch = int(state["epoch"])
    # resume finishes the preempted epoch (and trains through saved_epoch)
    r = run_cli(workdir, "--resume_model", "sr", "--saving_folder", folder,
                "--epochs", str(saved_epoch + 1))
    assert r.returncode == 0, r.stderr[-3000:]
    assert f"Epoch-{saved_epoch}, lr:" in r.stdout, r.stdout[-2000:]
