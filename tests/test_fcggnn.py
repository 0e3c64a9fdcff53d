"""FCGGNN head + loss tests (losses differential vs torch CrossEntropyLoss)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import torch

from situation_recognition_tpu.data.encoder import ImsituEncoder
from situation_recognition_tpu.models.fcggnn import (
    FCGGNNHead, nouns_loss, verb_loss)


def _head(encoder, hidden=32):
    return FCGGNNHead(
        num_verbs=encoder.get_num_verbs(),
        num_roles=encoder.get_num_roles(),
        num_labels=encoder.get_num_labels(),
        max_role_count=encoder.max_role_count,
        hidden=hidden)


def _init(encoder, B=4, hidden=32, seed=0):
    head = _head(encoder, hidden)
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.standard_normal((B, hidden)), jnp.float32)
    verbs = jnp.asarray(rng.integers(0, encoder.get_num_verbs(), B))
    tables = (jnp.asarray(encoder.role_ids), jnp.asarray(encoder.role_mask))
    params = head.init(jax.random.PRNGKey(seed), feats, verbs, *tables)
    return head, params, feats, verbs, tables


def test_forward_shapes(encoder):
    head, params, feats, verbs, tables = _init(encoder)
    pv, pn, gt = head.apply(params, feats, verbs, *tables)
    B, R, L = 4, encoder.max_role_count, encoder.get_num_labels()
    assert pv.shape == (B, encoder.get_num_verbs())
    assert pn.shape == (B, R, L)
    assert gt.shape == (B, R, L)
    assert pv.dtype == jnp.float32


def test_stacked_branches_match_separate_calls(encoder):
    head, params, feats, verbs, tables = _init(encoder)
    pv, pn, gtn = head.apply(params, feats, verbs, *tables)
    pred_ids = jnp.argmax(pv, axis=1)
    pn_sep = head.apply(params, feats, pred_ids, *tables,
                        method=head.predict_nouns)
    gtn_sep = head.apply(params, feats, verbs, *tables,
                         method=head.predict_nouns)
    np.testing.assert_allclose(np.asarray(pn), np.asarray(pn_sep), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gtn), np.asarray(gtn_sep), rtol=1e-6)


def test_dropout_train_vs_eval(encoder):
    head, params, feats, verbs, tables = _init(encoder)
    out1 = head.apply(params, feats, verbs, *tables)
    out2 = head.apply(params, feats, verbs, *tables)
    np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out2[0]))

    t1 = head.apply(params, feats, verbs, *tables, train=True,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    t2 = head.apply(params, feats, verbs, *tables, train=True,
                    rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(t1[0]), np.asarray(t2[0]))


def test_role_emb_pad_row_zero_and_zero_grad(encoder):
    head, params, feats, verbs, tables = _init(encoder)
    emb = params["params"]["role_emb"]
    np.testing.assert_array_equal(np.asarray(emb[-1]), 0.0)

    def loss_fn(p):
        pv, pn, gtn = head.apply(p, feats, verbs, *tables)
        labels = jnp.zeros((4, 3, encoder.max_role_count), jnp.int32)
        return verb_loss(pv, verbs) + nouns_loss(pn, labels, encoder.get_num_labels())

    g = jax.grad(loss_fn)(params)
    np.testing.assert_array_equal(
        np.asarray(g["params"]["role_emb"][-1]), 0.0)


def test_verb_loss_matches_torch(encoder):
    rng = np.random.default_rng(0)
    B, V = 16, encoder.get_num_verbs()
    logits = rng.standard_normal((B, V)).astype(np.float32)
    labels = rng.integers(0, V, B)
    ours = float(verb_loss(jnp.asarray(logits), jnp.asarray(labels)))
    want = float(torch.nn.CrossEntropyLoss()(
        torch.from_numpy(logits), torch.from_numpy(labels)))
    assert abs(ours - want) < 1e-5


def test_nouns_loss_matches_torch(encoder):
    rng = np.random.default_rng(1)
    B, R, L = 16, encoder.max_role_count, encoder.get_num_labels()
    logits = rng.standard_normal((B, R, L)).astype(np.float32)
    labels = rng.integers(0, L, (B, 3, R)).astype(np.int64)
    # pad slots → ignore_index, like the encoder emits
    for i in range(B):
        rc = rng.integers(1, R + 1)
        labels[i, :, rc:] = L
    ours = float(nouns_loss(jnp.asarray(logits), jnp.asarray(labels), L))
    # torch oracle exactly as the reference computes it (model.py:189-201)
    lossfn = torch.nn.CrossEntropyLoss(ignore_index=L)
    t_logits = torch.from_numpy(logits).transpose(1, 2)  # (B, L, R)
    t_labels = torch.from_numpy(labels)
    want = sum(float(lossfn(t_logits, t_labels[:, n])) for n in range(3))
    assert abs(ours - want) < 1e-4


def test_nouns_loss_all_ignored_annotation_nan(encoder):
    """torch returns NaN when every position of an annotation is ignored;
    we reproduce rather than silently fix."""
    B, R, L = 2, encoder.max_role_count, encoder.get_num_labels()
    logits = jnp.zeros((B, R, L))
    labels = jnp.full((B, 3, R), L, dtype=jnp.int32)
    assert np.isnan(float(nouns_loss(logits, labels, L)))
