"""Explicit-SPMD training step via shard_map (alternative to the jit path).

The default Trainer step lets XLA infer collectives from NamedShardings.
This module spells them out with ``shard_map`` + ``psum`` — useful when you
want manual control of the communication pattern, and it is the closest
semantic twin of the reference's ``nn.DataParallel`` (sr.py:467-470):

* each shard computes on its local batch slice;
* BatchNorm batch-statistics are **per-shard** for the NORMALIZATION
  (exactly like per-GPU BN under DataParallel — the jit path computes
  global batch stats instead; at batch 768/shard the difference is
  negligible).  The persisted running-stat EMA, however, averages all
  shards' batch stats (pmean below) — a deliberate improvement over
  DataParallel, which silently keeps only GPU-0's buffer updates
  (non-primary replica buffers are discarded each forward), so exact
  running-stat parity with a multi-GPU reference run is NOT claimed;
* loss terms and gradients are combined with explicit ``psum`` over the
  ``data`` axis (the reference gathers outputs and reduces grads on GPU0;
  on TPU the all-reduce rides ICI);
* the parameter update runs replicated on every shard (identical inputs →
  identical results, like DataParallel's broadcast-free invariant).

Masked-mean losses need care under psum: each shard contributes its
numerator and denominator separately, both psum'd, so wrapped-padding rows
are excluded globally, not per-shard.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map


def make_shardmap_train_step(trainer):
    """Build a shard_map train step with the same signature/semantics as
    ``trainer._train_step`` (losses are globally masked-mean reduced).

    Data-parallel only: the in/out specs replicate head params and
    optimizer state (P()), which would silently all-gather model-axis
    tensor-parallel kernels and return them replicated — losing the TP
    placement and forcing a recompile of the jit step afterwards — so TP
    configurations are rejected outright."""
    if trainer.config.model_axis != 1:
        raise NotImplementedError(
            "the explicit shard_map step is data-parallel only; classifier "
            "tensor parallelism (model_axis > 1) is served by the jit path")
    mesh = trainer.mesh
    head = trainer.head
    tx = trainer.tx
    role_ids = trainer.role_ids
    role_mask = trainer.role_mask
    num_labels = trainer.encoder.get_num_labels()
    # the backbone/BN dispatch is Trainer._features itself (explicit-arg
    # method; per-SHARD batch stats fall out of shard_map tracing it on the
    # local slice) — one implementation for both train paths
    features = trainer._features

    from situation_recognition_tpu.models.fcggnn import (
        nouns_ce_terms, verb_ce_term)

    def local_nouns_terms(pred_nouns, labels, valid):
        """Per-shard (numerator, denominator) pairs of the masked mean —
        the SAME nouns_ce_terms the jit losses sum (one CE implementation;
        here num/den psum separately so padding is excluded globally)."""
        return nouns_ce_terms(pred_nouns, labels, num_labels,
                              valid[:, None].astype(bool))

    def global_mean(terms, guarded=True):
        """Local share of the global masked mean: local numerator over the
        psum'd (stop-gradient'd — counts only, no param path) global
        denominator.  Putting the psum'd loss itself under jax.grad would
        be wrong twice over: psum's shard_map transpose re-psums the
        replicated cotangent (an extra ×axis_size), and each shard would
        still hold only its partial gradient."""
        out = jnp.zeros((), jnp.float32)
        for num, den in terms:
            den = jax.lax.psum(jax.lax.stop_gradient(den), "data")
            out = out + num / (jnp.maximum(den, 1.0) if guarded else den)
        return out

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(),
                  P("data"), P("data"), P("data"), P("data"), P("data")),
        out_specs=(P(), P(), P(), P(), (P("data"), P("data"), P("data"))),
        check_vma=False,
    )
    def train_step(head_params, opt_state, backbone_params, backbone_stats,
                   dropout_key, images, flip, verbs, labels, valid):
        # decorrelate dropout across shards, like independent GPU RNGs
        shard_key = jax.random.fold_in(
            dropout_key, jax.lax.axis_index("data"))
        # frozen backbone + BN-stat update hoisted out of the grad closure
        # (nothing in it needs a gradient — same rule as the jit step)
        feats, new_stats = features(
            backbone_params, backbone_stats, images, flip, True)

        def loss_fn(hp):
            pred_verb, pred_nouns = head.apply(
                {"params": hp}, feats, role_ids, role_mask, train=True,
                rngs={"dropout": shard_key}, method=head.predict_train)
            v_l = global_mean([verb_ce_term(pred_verb, verbs, valid)],
                              guarded=False)
            n_l = global_mean(local_nouns_terms(pred_nouns, labels, valid))
            # backprop loss = verb + pred-nouns only (sr.py:76)
            return v_l + n_l, (pred_verb, pred_nouns, v_l, n_l)

        grads, (pred_verb, pred_nouns, v_l, n_l) = jax.grad(
            loss_fn, has_aux=True)(head_params)
        # gt noun branch OUTSIDE the grad closure — same rule (and dropout
        # fold) as the jit step: its loss is logged, never backpropagated,
        # and being undifferentiated it keeps the fused GGNN kernel primal
        # instead of the custom_vjp's masked fwd rule
        gt_pred_nouns = head.apply(
            {"params": head_params}, feats, verbs, role_ids, role_mask,
            train=True, rngs={"dropout": jax.random.fold_in(shard_key, 1)},
            method=head.predict_nouns)
        g_l = global_mean(local_nouns_terms(gt_pred_nouns, labels, valid))
        # DataParallel gradient all-reduce (the reference reduces on GPU0,
        # sr.py:469; on TPU the psum rides ICI); afterwards every shard
        # applies the identical update, preserving param replication
        grads = jax.tree.map(lambda g: jax.lax.psum(g, "data"), grads)
        # global logged losses = sum of the local shares
        vloss = jax.lax.psum(v_l, "data")
        nloss = jax.lax.psum(n_l, "data")
        gloss = jax.lax.psum(g_l, "data")
        updates, opt_state = tx.update(grads, opt_state, head_params)
        head_params = optax.apply_updates(head_params, updates)
        # per-shard BN stats → average across shards for the running state
        new_stats = jax.tree.map(
            lambda s: jax.lax.pmean(s, "data"), new_stats)
        pv5, pn5, gt1 = trainer._topk((pred_verb, pred_nouns, gt_pred_nouns))
        return (head_params, opt_state, new_stats,
                (vloss, nloss, gloss), (pv5, pn5, gt1))

    return jax.jit(train_step, donate_argnums=(0, 1, 3))
