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
    backbone = trainer.backbone
    has_bn = trainer._backbone_has_bn
    tx = trainer.tx
    role_ids = trainer.role_ids
    role_mask = trainer.role_mask
    num_labels = trainer.encoder.get_num_labels()
    dtype = trainer.config.compute_dtype

    from situation_recognition_tpu.data.transforms import device_transform

    # BN-only knob: non-BN backbones keep train=True (see train.py._forward)
    bb_train = not has_bn or trainer.config.frozen_backbone_bn != "eval"

    def local_forward(head_params, backbone_params, backbone_stats,
                      images, flip, verbs, dropout_key):
        x = device_transform(images, flip, dtype=dtype)
        if has_bn and bb_train:
            feats, updates = backbone.apply(
                {"params": backbone_params, "batch_stats": backbone_stats},
                x, train=True, mutable=["batch_stats"])
            new_stats = updates["batch_stats"]
        elif has_bn:
            feats = backbone.apply(
                {"params": backbone_params, "batch_stats": backbone_stats},
                x, train=False)
            new_stats = backbone_stats
        else:
            feats = backbone.apply({"params": backbone_params}, x,
                                   train=True)
            new_stats = backbone_stats
        feats = jax.lax.stop_gradient(feats.astype(jnp.float32))
        outs = head.apply({"params": head_params}, feats, verbs,
                          role_ids, role_mask, train=True,
                          rngs={"dropout": dropout_key})
        return outs, new_stats

    def local_loss_terms(outs, verbs, labels, valid):
        """Per-shard (numerator, denominator) pairs for the masked means."""
        pred_verb, pred_nouns, gt_pred_nouns = outs
        logp_v = jax.nn.log_softmax(pred_verb.astype(jnp.float32), axis=-1)
        nll_v = -jnp.take_along_axis(logp_v, verbs[:, None], axis=-1)[:, 0]
        terms = [(jnp.sum(nll_v * valid), jnp.sum(valid))]
        for pn in (pred_nouns, gt_pred_nouns):
            logp = jax.nn.log_softmax(pn.astype(jnp.float32), axis=-1)
            for n in range(3):
                lab = labels[:, n, :]
                ok = (lab != num_labels) & valid[:, None].astype(bool)
                safe = jnp.where(ok, lab, 0)
                nll = -jnp.take_along_axis(
                    logp, safe[:, :, None], axis=-1)[:, :, 0]
                terms.append((jnp.sum(jnp.where(ok, nll, 0.0)),
                              jnp.sum(ok).astype(jnp.float32)))
        return terms

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

        def loss_fn(hp):
            outs, new_stats = local_forward(
                hp, backbone_params, backbone_stats, images, flip, verbs,
                shard_key)
            terms = local_loss_terms(outs, verbs, labels, valid)
            # Differentiate each shard's LOCAL SHARE of the global masked
            # means: local numerator over the psum'd (stop-gradient'd —
            # counts only, no param path) global denominator.  Putting the
            # psum'd loss itself under jax.grad would be wrong twice over:
            # psum's shard_map transpose re-psums the replicated cotangent
            # (an extra ×axis_size), and each shard would still hold only
            # its partial gradient.  grads are all-reduced explicitly below.
            dens = [jax.lax.psum(jax.lax.stop_gradient(b), "data")
                    for _, b in terms]
            v_l = terms[0][0] / dens[0]
            n_l = sum(terms[i][0] / jnp.maximum(dens[i], 1) for i in (1, 2, 3))
            g_l = sum(terms[i][0] / jnp.maximum(dens[i], 1) for i in (4, 5, 6))
            return v_l + n_l, (outs, new_stats, v_l, n_l, g_l)

        grads, (outs, new_stats, v_l, n_l, g_l) = jax.grad(
            loss_fn, has_aux=True)(head_params)
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
        from situation_recognition_tpu.train import Trainer
        pv5, pn5, gt1 = Trainer._topk(outs)
        return (head_params, opt_state, new_stats,
                (vloss, nloss, gloss), (pv5, pn5, gt1))

    return jax.jit(train_step, donate_argnums=(0, 1, 3))
