"""Unit tests for inference.results/analize_subset with a stubbed trainer:
pin down the dim=0 softmax quirk and label-gloss mapping without subprocess
overhead."""

import json
import os

import numpy as np
import pytest

from situation_recognition_tpu.inference import results, analize_subset


class StubTrainer:
    """Deterministic logits so expected outputs are hand-computable."""

    def __init__(self, encoder, verb_logits, noun_logits):
        self.encoder = encoder
        self._v = np.asarray(verb_logits, np.float32)
        self._n = np.asarray(noun_logits, np.float32)

    def infer_verb(self, images):
        return self._v[None]

    def infer_nouns(self, images, verb_ids):
        return self._n[None]


@pytest.fixture()
def workspace(tmp_path, encoder, overfitting_json, monkeypatch):
    from PIL import Image

    ds = tmp_path / "imSitu"
    ds.mkdir()
    verbs, nouns = {}, {}
    for img, rec in overfitting_json.items():
        roles = {}
        for frame in rec["frames"]:
            for role, label in frame.items():
                roles.setdefault(role, {})
                if label and label != "UNK":
                    nouns.setdefault(label, {"gloss": [label + "_g"]})
        verbs.setdefault(rec["verb"], {"roles": roles})
    with open(ds / "imsitu_space.json", "w") as f:
        json.dump({"nouns": nouns, "verbs": verbs}, f)
    img = tmp_path / "img.jpg"
    Image.fromarray(np.zeros((256, 256, 3), np.uint8)).save(img)
    monkeypatch.chdir(tmp_path)
    return str(img)


def test_results_with_gt_verb(workspace, encoder):
    R, L = encoder.max_role_count, encoder.get_num_labels()
    noun_logits = np.zeros((R, L), np.float32)
    # glaring roles: place, perceiver, agent; predict label ids 0, 3, 2
    noun_logits[0, 0] = 5.0
    noun_logits[1, 3] = 5.0
    noun_logits[2, 2] = 5.0
    tr = StubTrainer(encoder, np.zeros(encoder.get_num_verbs()), noun_logits)

    verb, prob, labels, labels_prob = results(tr, workspace, encoder, "glaring")
    assert verb == "glaring" and prob == 100.0
    assert labels == {"place": "n04215402_g", "perceiver": "n08613733_g",
                      "agent": "n10287213_g"}
    # quirk: probabilities are softmax over the ROLE axis (dim 0) then max
    want = np.exp(noun_logits - noun_logits.max(0)) / np.exp(
        noun_logits - noun_logits.max(0)).sum(0)
    np.testing.assert_allclose(labels_prob, want.max(axis=1)[:R] * 100,
                               rtol=1e-5)
    assert len(labels_prob) == R  # one per slot, incl. pad slots


def test_results_predicted_verb(workspace, encoder, capsys):
    v = np.zeros(encoder.get_num_verbs(), np.float32)
    v[1] = 3.0  # operating
    tr = StubTrainer(encoder, v,
                     np.zeros((encoder.max_role_count,
                               encoder.get_num_labels()), np.float32))
    verb, prob, labels, _ = results(tr, workspace, encoder, "not_a_verb")
    out = capsys.readouterr().out
    assert "No ground truth verb found, calculating by myself..." in out
    assert verb == "operating"
    want = float(np.exp(3.0) / (np.exp(3.0) + (len(v) - 1))) * 100
    assert abs(prob - want) < 1e-3


def test_results_empty_label_prints_dash(workspace, encoder):
    R, L = encoder.max_role_count, encoder.get_num_labels()
    noun_logits = np.zeros((R, L), np.float32)
    noun_logits[:, 1] = 5.0  # label id 1 is '' in the fixture vocab
    tr = StubTrainer(encoder, np.zeros(encoder.get_num_verbs()), noun_logits)
    _, _, labels, _ = results(tr, workspace, encoder, "glaring")
    assert set(labels.values()) == {"-"}
