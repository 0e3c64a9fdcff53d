"""Scorer bit-compatibility tests.

The oracle below is a clean-room per-example implementation of the documented
reference semantics (/root/reference/utils/imsitu_scorer.py:11-101), using
torch.topk for identical tie-breaking.  The vectorized scorer must agree
exactly on random logits, including the lenient value-all quirk.
"""

import numpy as np
import torch

from situation_recognition_tpu.metrics.scorer import ImsituScorer, mean_of_eight, topk_indices


def oracle_cards(encoder, topk, pred_verbs, verbs, pred_nouns, labels, gt_pred_nouns):
    """Per-example score cards, straight from the documented semantics."""
    cards = []
    B = len(verbs)
    for i in range(B):
        keys = ["verb", "value", "value-all"] + (
            ["gt-value", "gt-value-all"] if topk == 1 else [])
        card = {k: 0.0 for k in keys}
        _, pv = torch.topk(torch.from_numpy(pred_verbs[i]), topk)
        _, pn = torch.topk(torch.from_numpy(pred_nouns[i]), topk)  # (R, topk)
        rc = encoder.get_role_count(int(verbs[i]))
        for k in range(topk):
            found = 0
            if int(pv[k]) == verbs[i]:
                card["verb"] += 1
            for r in range(rc):
                for n in range(3):
                    if int(pn[r][k]) == labels[i][n][r]:
                        found += 1
            if found >= rc:
                card["value-all"] += 1
            if found > 0:
                card["value"] += 1
        if topk == 1:
            _, gt = torch.topk(torch.from_numpy(gt_pred_nouns[i]), 1)
            gt_found = 0
            for r in range(rc):
                for n in range(3):
                    if int(gt[r][0]) == labels[i][n][r]:
                        gt_found += 1
            if gt_found >= rc:
                card["gt-value-all"] += 1
            if gt_found > 0:
                card["gt-value"] += 1
        for k in card:
            card[k] = min(card[k], 1.0)
        cards.append(card)
    return cards


def oracle_means(cards):
    keys = cards[0].keys()
    return {k: sum(c[k] for c in cards) / len(cards) for k in keys}


def _random_batch(encoder, B, seed):
    rng = np.random.default_rng(seed)
    V, R, L = encoder.get_num_verbs(), encoder.max_role_count, encoder.get_num_labels()
    verbs = rng.integers(0, V, size=B)
    pred_verbs = rng.standard_normal((B, V)).astype(np.float32)
    pred_nouns = rng.standard_normal((B, R, L)).astype(np.float32)
    gt_pred_nouns = rng.standard_normal((B, R, L)).astype(np.float32)
    # labels: valid ids on real roles, pad id L on padding slots
    labels = rng.integers(0, L, size=(B, 3, R)).astype(np.int64)
    for i in range(B):
        rc = encoder.get_role_count(int(verbs[i]))
        labels[i, :, rc:] = L
    return pred_verbs, verbs, pred_nouns, labels, gt_pred_nouns


def test_scorer_matches_oracle_top1(encoder):
    batch = _random_batch(encoder, 64, seed=0)
    s = ImsituScorer(encoder, 1, 3)
    s.add_point_both(*batch)
    got = s.get_average_results_both()
    want = oracle_means(oracle_cards(encoder, 1, *batch))
    assert got == want


def test_scorer_matches_oracle_top5(encoder):
    batch = _random_batch(encoder, 64, seed=1)
    s = ImsituScorer(encoder, 5, 3)
    s.add_point_both(*batch[:4])  # top5 scorer ignores gt branch
    got = s.get_average_results_both()
    want = oracle_means(oracle_cards(encoder, 5, *batch))
    for k in got:
        assert got[k] == want[k]


def test_scorer_near_tie_logits(encoder):
    # tightly clustered but distinct logits: stresses top-k selection without
    # exact ties (reference tie order is unspecified/device-dependent)
    rng = np.random.default_rng(2)
    B = 32
    V, R, L = encoder.get_num_verbs(), encoder.max_role_count, encoder.get_num_labels()
    verbs = rng.integers(0, V, size=B)
    def jittered(shape):
        base = rng.integers(0, 3, size=shape).astype(np.float64)
        return base + rng.permutation(np.arange(np.prod(shape))).reshape(shape) * 1e-9
    pv = jittered((B, V))
    pn = jittered((B, R, L))
    gt = jittered((B, R, L))
    labels = rng.integers(0, L, size=(B, 3, R)).astype(np.int64)
    for topk in (1, 5):
        s = ImsituScorer(encoder, topk, 3)
        s.add_point_both(pv, verbs, pn, labels, gt)
        want = oracle_means(oracle_cards(encoder, topk, pv, verbs, pn, labels, gt))
        got = s.get_average_results_both()
        for k in want:
            assert got[k] == want[k], (topk, k)


def test_value_all_lenient_quirk(encoder):
    """A role matching 2 annotators while another role misses can still fire
    value-all — the reference quirk must be reproduced."""
    # verb 0 = glaring, 3 roles. Prediction: role0 matches annotations 0 and 1,
    # role1 matches annotation 0, role2 matches nothing => found = 3 >= 3.
    L = encoder.get_num_labels()
    R = encoder.max_role_count
    labels = np.full((1, 3, R), L, dtype=np.int64)
    labels[0, :, 0] = [5, 5, 6]
    labels[0, :, 1] = [7, 8, 9]
    labels[0, :, 2] = [10, 11, 12]
    pred = np.zeros((1, R, L), dtype=np.float32)
    pred[0, 0, 5] = 9.0    # matches ann 0 and 1
    pred[0, 1, 7] = 9.0    # matches ann 0
    pred[0, 2, 20] = 9.0   # matches nothing
    pv = np.zeros((1, encoder.get_num_verbs()), dtype=np.float32)
    s = ImsituScorer(encoder, 1, 3)
    s.add_point_both(pv, np.array([0]), pred, labels, pred)
    r = s.get_average_results_both()
    assert r["value-all"] == 1.0
    assert r["value"] == 1.0


def test_accumulation_across_batches(encoder):
    b1 = _random_batch(encoder, 16, seed=3)
    b2 = _random_batch(encoder, 48, seed=4)
    s = ImsituScorer(encoder, 1, 3)
    s.add_point_both(*b1)
    s.add_point_both(*b2)
    cards = oracle_cards(encoder, 1, *b1) + oracle_cards(encoder, 1, *b2)
    want = oracle_means(cards)
    got = s.get_average_results_both()
    assert len(s) == 64
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_topk_indices_deterministic_tiebreak():
    # our documented tie rule: equal values -> lower index first
    x = np.array([[1.0, 3.0, 3.0, 2.0, 3.0]])
    np.testing.assert_array_equal(topk_indices(x, 3), [[1, 2, 4]])
    # distinct values must match torch exactly
    y = np.array([[0.3, 0.9, 0.1, 0.8, 0.5]])
    _, want = torch.topk(torch.from_numpy(y), 3)
    np.testing.assert_array_equal(topk_indices(y, 3), want.numpy())


def test_mean_of_eight():
    t1 = {"verb": 0.5, "value": 0.5, "value-all": 0.5,
          "gt-value": 0.5, "gt-value-all": 0.5}
    t5 = {"verb": 0.5, "value": 0.5, "value-all": 0.5}
    assert mean_of_eight(t1, t5) == 50.0


def test_keep_cards_matches_oracle_cards(encoder):
    batch = _random_batch(encoder, 32, seed=9)
    s = ImsituScorer(encoder, 1, 3, keep_cards=True)
    s.add_point_both(*batch)
    want = oracle_cards(encoder, 1, *batch)
    assert s.score_cards == want
    # sums derived from cards match the vectorized averages
    means = s.get_average_results_both()
    for k in means:
        assert means[k] == sum(c[k] for c in want) / len(want)


def test_scorer_matches_oracle_at_flagship_vocab():
    """Exact oracle agreement at the REAL dataset's widths (504 verbs /
    6 roles / 2001 labels, role counts 1..6 across verbs) — the other
    differential tests run on the tiny fixture vocab, which never
    exercises wide top-k selections or the full role-count spread."""
    from situation_recognition_tpu.data.encoder import ImsituEncoder

    enc = ImsituEncoder.synthetic_full(seed=3)
    assert enc.get_num_labels() == 2001 and enc.max_role_count == 6
    for seed in (10, 11, 12):
        batch = _random_batch(enc, 24, seed=seed)
        for topk in (1, 5):
            s = ImsituScorer(enc, topk, 3)
            s.add_point_both(*(batch if topk == 1 else batch[:4]))
            got = s.get_average_results_both()
            want = oracle_means(oracle_cards(enc, topk, *batch))
            assert got == want, (seed, topk)


def test_add_point_indices_rejects_1d_verb_slice(encoder):
    """A (B,) verb slice (pv5[:, 0] instead of pv5[:, :1]) would broadcast
    to (B, B) and silently inflate the verb metric ~B-fold — reject it."""
    import pytest

    batch = _random_batch(encoder, 8, seed=3)
    pred_verbs, verbs, pred_nouns, labels, gt = batch
    s = ImsituScorer(encoder, 1, 3)
    pv = topk_indices(pred_verbs, 1)
    pn = topk_indices(pred_nouns, 1)
    g1 = topk_indices(gt, 1)
    with pytest.raises(ValueError, match="topk"):
        s.add_point_indices(pv[:, 0], verbs, pn, labels, g1)
    s.add_point_indices(pv, verbs, pn, labels, g1)   # 2-D form fine
    assert len(s) == 8


def test_load_state_dict_clears_stale_cards(encoder):
    batch = _random_batch(encoder, 8, seed=4)
    s = ImsituScorer(encoder, 1, 3, keep_cards=True)
    s.add_point_both(*batch)
    state = s.state_dict()
    s.load_state_dict(state)
    assert len(s) == 8 and s.score_cards == []
