"""tools/validate_dataset.py: every class of data problem the reference
dies on mid-run must be reported up front with a clear message."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from tools.validate_dataset import main as validate


@pytest.fixture()
def good(tmp_path, overfitting_json):
    from tests.conftest import make_synth_images

    ds = tmp_path / "imSitu"
    ds.mkdir()
    for name in ("train.json", "dev.json", "test.json"):
        with open(ds / name, "w") as f:
            json.dump(overfitting_json, f)
    imgs = tmp_path / "resized_256"
    imgs.mkdir()
    make_synth_images(imgs, list(overfitting_json.keys()))
    return ds, imgs


def _args(ds, imgs, *extra):
    return ["--dataset_folder", str(ds), "--imgset_dir", str(imgs), *extra]


def test_clean_dataset_passes(good, capsys):
    ds, imgs = good
    assert validate(_args(ds, imgs)) == 0
    out = capsys.readouterr().out
    assert "validate_dataset: OK" in out
    assert "0 missing, 0 corrupt" in out


def test_missing_image_and_corrupt_image(good, capsys):
    ds, imgs = good
    names = sorted(os.listdir(imgs))
    os.remove(imgs / names[0])
    with open(imgs / names[1], "wb") as f:
        f.write(b"not a jpeg")
    assert validate(_args(ds, imgs)) == 1
    out = capsys.readouterr().out
    assert "image missing" in out and "image corrupt" in out


def test_unseen_dev_label_without_unk_is_an_error(good, capsys):
    ds, imgs = good
    # the fixture's train split contains a literal 'UNK' noun; strip it so
    # the no-escape-hatch crash case is actually exercised
    with open(ds / "train.json") as f:
        train = json.load(f)
    for rec in train.values():
        for frame in rec["frames"]:
            for role, noun in frame.items():
                if noun == "UNK":
                    frame[role] = ""
    with open(ds / "train.json", "w") as f:
        json.dump(train, f)
    with open(ds / "dev.json") as f:
        dev = json.load(f)
    name = next(iter(dev))
    role = next(iter(dev[name]["frames"][0]))
    for frame in dev[name]["frames"]:
        frame[role] = "n99999999"      # not in train, train has no UNK
    with open(ds / "dev.json", "w") as f:
        json.dump(dev, f)
    assert validate(_args(ds, imgs, "--skip_images")) == 1
    out = capsys.readouterr().out
    assert "NO 'UNK'" in out


def test_wrong_frame_count_and_alien_verb(good, capsys):
    ds, imgs = good
    with open(ds / "test.json") as f:
        test = json.load(f)
    names = sorted(test)
    test[names[0]]["frames"] = test[names[0]]["frames"][:2]   # 2 frames
    test[names[1]]["verb"] = "teleporting"                    # not in train
    with open(ds / "test.json", "w") as f:
        json.dump(test, f)
    assert validate(_args(ds, imgs, "--skip_images")) == 1
    out = capsys.readouterr().out
    assert "2 frames" in out and "absent from" in out


def test_strict_promotes_warnings(good, capsys):
    ds, imgs = good
    # add UNK to train so an unseen dev label is only a warning
    with open(ds / "train.json") as f:
        train = json.load(f)
    name = next(iter(train))
    role = next(iter(train[name]["frames"][0]))
    train[name]["frames"][0][role] = "UNK"
    with open(ds / "train.json", "w") as f:
        json.dump(train, f)
    with open(ds / "dev.json") as f:
        dev = json.load(f)
    dname = next(iter(dev))
    drole = next(iter(dev[dname]["frames"][0]))
    for frame in dev[dname]["frames"]:
        frame[drole] = "n99999999"
    with open(ds / "dev.json", "w") as f:
        json.dump(dev, f)
    assert validate(_args(ds, imgs, "--skip_images")) == 0
    capsys.readouterr()
    assert validate(_args(ds, imgs, "--skip_images", "--strict")) == 1
    assert "map to 'UNK'" in capsys.readouterr().out
