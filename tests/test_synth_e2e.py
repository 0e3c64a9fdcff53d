"""End-to-end GENERALIZATION evidence on the learnable synthetic dataset.

The reference's #1 build target (val mean ~= 65.7 at epoch 30 on real
imSitu, ``/root/reference/README.md:98-107``) cannot be demonstrated in
this environment — the dataset and the published checkpoint are absent.
The existing evidence chain covers math parity (differential + lockstep
trajectory tests vs a torch replica) and memorization
(``test_train.py::test_overfit_to_convergence``).  This module closes the
remaining gap that IS closable: *generalization* — train on one split of
a visually-coded synthetic imSitu dataset (``tools/make_synth_dataset.py``)
and verify accuracy on a HELD-OUT dev split of unseen images/label
combinations climbs from chance to near-ceiling, through the same
loader -> device-transform -> frozen-backbone -> GGNN -> heads -> scorer
stack the real training run uses.
"""

import json
import os
import sys

import jax.numpy as jnp
import pytest

from situation_recognition_tpu.data.dataset import ImsituDataset, ImsituLoader
from situation_recognition_tpu.data.encoder import ImsituEncoder
from situation_recognition_tpu.metrics.scorer import mean_of_eight
from situation_recognition_tpu.train import Trainer, TrainerConfig


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
    from tools.make_synth_dataset import main as make_synth

    root = tmp_path_factory.mktemp("synth")
    ann, img = str(root / "ann"), str(root / "img")
    make_synth(["--out", ann, "--img_dir", img,
                "--verbs", "6", "--nouns_per_role", "2",
                "--train", "96", "--dev", "48", "--test", "4",
                "--seed", "7"])
    return ann, img


def _dev_mean(trainer, dev_loader):
    top1, top5, _, _ = trainer.evaluate(dev_loader)
    return mean_of_eight(top1.get_average_results_both(),
                         top5.get_average_results_both())


def test_patch_label_coverage_never_erases_singletons():
    """Patching in a missing label must not overwrite the LAST occurrence
    of another (the round-2 bug: round-robin patching clobbered singleton
    nouns, leaving the train vocabulary incomplete so dev/test encoding
    crashed on the erased label).  Feasible sizes: full coverage after
    patching; infeasible sizes: an explicit ValueError, never silent
    erasure."""
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
    from tools.make_synth_dataset import (
        SynthSpec, _patch_label_coverage, sample_annotation)

    def build(n, seed):
        spec = SynthSpec(6, 2)
        rng = np.random.default_rng(seed)
        anns = {}
        for i in range(n):
            verb = spec.verbs[i % len(spec.verbs)]
            anns[f"{verb}_train_{i}.jpg"] = sample_annotation(
                spec, verb, rng, 0.08, 0.1)
        return spec, anns

    for seed in range(6):
        spec, anns = build(24, seed)
        _patch_label_coverage(spec, anns)
        seen = {}
        for ann in anns.values():
            for role, noun in ann["frames"][0].items():
                seen.setdefault(role, set()).add(noun)
        for role, nouns in seen.items():
            assert set(spec.role_nouns[role] + [""]) <= nouns, (seed, role)

    # 12 images leave rare roles on 2 images but needing 3 labels — must
    # refuse loudly (the old code 'succeeded' by erasing other labels)
    spec, anns = build(12, 0)
    with pytest.raises(ValueError, match="too small to cover"):
        _patch_label_coverage(spec, anns)


@pytest.mark.slow
def test_vit_generalizes_to_held_out_dev(synth):
    """Same generalization check through the ViT backbone family
    (attention feature path — patch embed, encoder blocks, CLS pooling —
    instead of the conv/GAP path): the full train stack must learn the
    visual code through a frozen random-init vit_tiny too.  Measured
    curve: dev mean 30.7 (init) -> 73.7 @ epoch 7 -> 91.4 @ epoch 19;
    10 epochs clear the bar with slack."""
    ann, img = synth
    with open(os.path.join(ann, "train.json")) as f:
        train_json = json.load(f)
    with open(os.path.join(ann, "dev.json")) as f:
        dev_json = json.load(f)
    enc = ImsituEncoder(train_json, verbose=False)

    train_ds = ImsituDataset(img, train_json, enc, train=True)
    dev_ds = ImsituDataset(img, dev_json, enc, train=False)
    train_ds.enable_decode_cache()
    dev_ds.enable_decode_cache()
    train = ImsituLoader(train_ds, batch_size=32, shuffle=True, seed=0)
    dev = ImsituLoader(dev_ds, batch_size=32, shuffle=False)

    cfg = TrainerConfig(hidden=64, batch_size=32, backbone="vit_tiny",
                        compute_dtype=jnp.float32, lr=0.01)
    tr = Trainer(enc, cfg)

    before = _dev_mean(tr, dev)
    for e in range(10):
        tr.train_epoch(train, epoch=e)
    after = _dev_mean(tr, dev)

    assert after > 0.5, (before, after)
    assert after > before + 0.2, (before, after)


@pytest.mark.slow
def test_generalizes_to_held_out_dev(synth):
    ann, img = synth
    with open(os.path.join(ann, "train.json")) as f:
        train_json = json.load(f)
    with open(os.path.join(ann, "dev.json")) as f:
        dev_json = json.load(f)
    enc = ImsituEncoder(train_json, verbose=False)
    assert enc.max_role_count == 6  # the real dataset's graph width

    train_ds = ImsituDataset(img, train_json, enc, train=True)
    dev_ds = ImsituDataset(img, dev_json, enc, train=False)
    train_ds.enable_decode_cache()
    dev_ds.enable_decode_cache()
    train = ImsituLoader(train_ds, batch_size=32, shuffle=True, seed=0)
    dev = ImsituLoader(dev_ds, batch_size=32, shuffle=False)

    cfg = TrainerConfig(hidden=64, batch_size=32, backbone="mini",
                        compute_dtype=jnp.float32, lr=0.01)
    tr = Trainer(enc, cfg)

    before = _dev_mean(tr, dev)
    for e in range(20):
        tr.train_epoch(train, epoch=e)
    after = _dev_mean(tr, dev)

    # chance-level mean on this vocab is ~0.2 (top-5 verb of 6 dominates);
    # a model that LEARNED the visual code clears 0.5 easily and a model
    # that merely memorized the train split cannot — dev images are unseen
    assert after > 0.5, (before, after)
    assert after > before + 0.2, (before, after)
