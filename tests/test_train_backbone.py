"""Backbone fine-tuning (``--train_backbone`` / ``TrainerConfig.train_backbone``).

ADDITIVE capability — the reference CANNOT fine-tune: its backbones are
frozen at construction (``/root/reference/model.py:17-18``) and the
optimizer filters on ``requires_grad`` (``sr.py:472-473``); the resume-path
"unfreeze fc" (``sr.py:489-503``) toggles an ``nn.Identity`` — a no-op.
These tests pin the framework's fine-tuning semantics: gradients reach the
backbone, one global clip over head+backbone, exact decoupled backbone lr,
grad-accum exactness, remat equivalence, and checkpoint round trips
(including the frozen→fine-tune optimizer-tree mismatch path).
"""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from situation_recognition_tpu.data.dataset import ImsituDataset, ImsituLoader
from situation_recognition_tpu.train import Trainer, TrainerConfig


def _cfg(**kw):
    base = dict(hidden=64, batch_size=8, backbone="mini",
                compute_dtype=jnp.float32, lr=0.01, dropout_rate=0.0,
                train_backbone=True)
    base.update(kw)
    return TrainerConfig(**base)


def _batch(encoder, n=8, seed=0):
    rng = np.random.default_rng(seed)
    R = encoder.max_role_count
    return {
        "images": jnp.asarray(
            rng.integers(0, 255, (n, 256, 256, 3), dtype=np.uint8)),
        "flip": jnp.zeros((n,), bool),
        "verbs": jnp.asarray(
            rng.integers(0, encoder.get_num_verbs(), (n,)), jnp.int32),
        "labels": jnp.asarray(
            rng.integers(0, encoder.get_num_labels(), (n, 3, R)),
            jnp.int32),
        "valid": jnp.ones((n,), jnp.float32),
    }


def _ft_step(tr, b, key=1):
    tp, tr.opt_state, tr.backbone_stats, losses, _ = tr._train_step_ft(
        tr._trainable(), tr.opt_state, tr.backbone_stats,
        jax.random.PRNGKey(key), b["images"], b["flip"], b["verbs"],
        b["labels"], b["valid"])
    tr.head_params, tr.backbone_params = tp["head"], tp["backbone"]
    return losses


def _max_delta(a, b):
    return max(float(jnp.max(jnp.abs(x - y))) for x, y in
               zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def test_backbone_params_move_and_forward_matches_frozen(encoder):
    """One ft step: losses equal the frozen step's (same forward — the
    backbone is identical until the update lands) and the backbone params
    actually move (adamax's first update is exactly ±lr per weight)."""
    tr_ft = Trainer(encoder, _cfg())
    tr_fr = Trainer(encoder, _cfg(train_backbone=False))
    b = _batch(encoder)

    losses_ft = [float(x) for x in _ft_step(tr_ft, b)]
    (tr_fr.head_params, tr_fr.opt_state, tr_fr.backbone_stats, losses_fr,
     _) = tr_fr._train_step(
        tr_fr.head_params, tr_fr.opt_state, tr_fr.backbone_params,
        tr_fr.backbone_stats, jax.random.PRNGKey(1), b["images"],
        b["flip"], b["verbs"], b["labels"], b["valid"])
    np.testing.assert_allclose(
        losses_ft, [float(x) for x in losses_fr], rtol=1e-6)

    d = _max_delta(tr_ft.backbone_params, tr_fr.backbone_params)
    assert d > 1e-4, f"backbone params did not move ({d})"
    # adamax step magnitude: |update| <= lr (equality on the first step
    # wherever the gradient is nonzero)
    assert d <= 0.01 + 1e-6


def test_backbone_lr_zero_freezes_backbone_exactly(encoder):
    """backbone_lr=0 must leave the backbone bit-identical (the decoupled
    rate is an exact post-scale of the adamax update)."""
    tr = Trainer(encoder, _cfg(backbone_lr=0.0))
    before = jax.device_get(tr.backbone_params)
    _ft_step(tr, _batch(encoder))
    assert _max_delta(before, jax.device_get(tr.backbone_params)) == 0.0


def test_backbone_lr_is_exact_adamax_scaling(encoder):
    """backbone_lr=q*lr must equal running adamax at lr on the head and
    at q*lr on the backbone: on the FIRST step adamax moves every
    gradient-carrying weight by exactly ±rate, so the max |delta| of the
    backbone must be q*lr while the head's stays lr."""
    lr, q = 0.01, 0.25
    tr = Trainer(encoder, _cfg(lr=lr, backbone_lr=q * lr))
    bb0 = jax.device_get(tr.backbone_params)
    hp0 = jax.device_get(tr.head_params)
    _ft_step(tr, _batch(encoder))
    d_bb = _max_delta(bb0, jax.device_get(tr.backbone_params))
    d_hp = _max_delta(hp0, jax.device_get(tr.head_params))
    np.testing.assert_allclose(d_bb, q * lr, rtol=1e-4)
    np.testing.assert_allclose(d_hp, lr, rtol=1e-4)


@pytest.mark.slow
def test_remat_backbone_trajectory_matches_no_remat(encoder):
    """Per-block remat must not change the math: two chained ft steps with
    and without remat_backbone produce identical params (CPU f32 —
    rematerialized forwards recompute the same values)."""
    trs = [Trainer(encoder, _cfg(remat_backbone=r)) for r in (False, True)]
    for step in range(2):
        b = _batch(encoder, seed=step)
        for tr in trs:
            _ft_step(tr, b, key=step)
    assert _max_delta(trs[0].backbone_params, trs[1].backbone_params) < 1e-6
    assert _max_delta(trs[0].head_params, trs[1].head_params) < 1e-6


@pytest.mark.slow
def test_grad_accum_ft_matches_big_batch(encoder):
    """Two balanced microbatches through the ft accum path == one big-batch
    ft step (same rows, dropout 0, eval-mode BN so the stats are not a
    legitimate divergence — the same contract test_grad_accum pins for the
    frozen path)."""
    big = _batch(encoder, n=16, seed=3)
    # balanced: same verb/labels on every row so the microbatch means are
    # exactly the big-batch mean
    for k in ("verbs",):
        big[k] = jnp.broadcast_to(big[k][:1], big[k].shape)
    big["labels"] = jnp.broadcast_to(big["labels"][:1], big["labels"].shape)

    cfg_big = _cfg(frozen_backbone_bn="eval", batch_size=16)
    cfg_acc = _cfg(frozen_backbone_bn="eval", grad_accum=2)
    tr_big = Trainer(encoder, cfg_big)
    tr_acc = Trainer(encoder, cfg_acc)

    _ft_step(tr_big, big, key=7)

    acc = tr_acc._zero_grads(tr_acc._trainable())
    for i in range(2):
        micro = {k: v[8 * i: 8 * i + 8] for k, v in big.items()}
        acc, tr_acc.backbone_stats, _, _ = tr_acc._grad_accum_step_ft(
            tr_acc._trainable(), acc, tr_acc.backbone_stats,
            jax.random.PRNGKey(7), micro["images"], micro["flip"],
            micro["verbs"], micro["labels"], micro["valid"])
    tp, tr_acc.opt_state = tr_acc._apply_accum_step(
        tr_acc._trainable(), tr_acc.opt_state, acc, jnp.float32(2))
    tr_acc.head_params, tr_acc.backbone_params = tp["head"], tp["backbone"]

    assert _max_delta(tr_big.backbone_params, tr_acc.backbone_params) < 1e-5
    assert _max_delta(tr_big.head_params, tr_acc.head_params) < 1e-5

    # the FUSED group-final ft program (grads + accumulate + apply in one
    # jit — the r5 boundary-drain fix) must land on the same params
    tr_f = Trainer(encoder, cfg_acc)
    accf = tr_f._zero_grads(tr_f._trainable())
    m0 = {k: v[:8] for k, v in big.items()}
    m1 = {k: v[8:] for k, v in big.items()}
    accf, tr_f.backbone_stats, _, _ = tr_f._grad_accum_step_ft(
        tr_f._trainable(), accf, tr_f.backbone_stats,
        jax.random.PRNGKey(7), m0["images"], m0["flip"],
        m0["verbs"], m0["labels"], m0["valid"])
    (tpf, tr_f.opt_state, accf, tr_f.backbone_stats, _,
     _) = tr_f._grad_accum_final_ft(
        tr_f._trainable(), tr_f.opt_state, accf, tr_f.backbone_stats,
        jax.random.PRNGKey(7), m1["images"], m1["flip"],
        m1["verbs"], m1["labels"], m1["valid"])
    tr_f.head_params, tr_f.backbone_params = tpf["head"], tpf["backbone"]
    assert _max_delta(tr_big.backbone_params, tr_f.backbone_params) < 1e-5
    assert _max_delta(tr_big.head_params, tr_f.head_params) < 1e-5
    # the returned accumulator is ZEROED for the next group
    assert all(float(jnp.abs(x).max()) == 0.0
               for x in jax.tree.leaves(accf))


@pytest.mark.slow
def test_ft_checkpoint_roundtrip_continues_trajectory(encoder, tmp_path):
    """(step, save, load, step) == (step, step): the combined head+backbone
    adamax state round-trips through the msgpack checkpoint."""
    from situation_recognition_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint)

    tr_a = Trainer(encoder, _cfg())
    tr_b = Trainer(encoder, _cfg())
    b0, b1 = _batch(encoder, seed=0), _batch(encoder, seed=1)

    _ft_step(tr_a, b0, key=0)
    _ft_step(tr_a, b1, key=1)

    _ft_step(tr_b, b0, key=0)
    path = str(tmp_path / "ft_ckpt")
    save_checkpoint(path, {"model": tr_b.model_state_dict()})
    tr_c = Trainer(encoder, _cfg())
    tr_c.load_model_state(load_checkpoint(path)["model"])
    _ft_step(tr_c, b1, key=1)

    assert _max_delta(tr_a.backbone_params, tr_c.backbone_params) < 1e-6
    assert _max_delta(tr_a.head_params, tr_c.head_params) < 1e-6


def test_frozen_checkpoint_resumes_into_ft_with_opt_reinit(
        encoder, tmp_path, capsys):
    """A head-only checkpoint loaded into a train_backbone trainer keeps
    every param but reinitializes the optimizer tree, with the
    reference-style [Mismatch] warning — never a crash, never silence."""
    from situation_recognition_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint)

    tr_fr = Trainer(encoder, _cfg(train_backbone=False))
    path = str(tmp_path / "frozen_ckpt")
    save_checkpoint(path, {"model": tr_fr.model_state_dict()})

    tr_ft = Trainer(encoder, _cfg())
    tr_ft.load_model_state(load_checkpoint(path)["model"])
    out = capsys.readouterr().out
    assert "[Mismatch]" in out and "optimizer" in out
    assert _max_delta(tr_fr.head_params, tr_ft.head_params) == 0.0
    # and the reinitialized state still steps
    losses = _ft_step(tr_ft, _batch(encoder))
    assert all(np.isfinite(float(x)) for x in losses)


@pytest.mark.slow
def test_vit_ft_moves_pos_embed(encoder):
    """ViT fine-tuning: gradients reach the attention backbone (pos_embed
    and a block kernel move; the fused kernels' custom-VJP contract routes
    the differentiated backbone to XLA AD, so this exercises that path)."""
    cfg = _cfg(backbone="vit_tiny", remat_backbone=True)
    tr = Trainer(encoder, cfg)
    pos0 = np.asarray(tr.backbone_params["pos_embed"])
    k0 = np.asarray(tr.backbone_params["block0"]["mlp"]["fc1"]["kernel"])
    _ft_step(tr, _batch(encoder))
    assert float(np.max(np.abs(
        np.asarray(tr.backbone_params["pos_embed"]) - pos0))) > 1e-5
    assert float(np.max(np.abs(np.asarray(
        tr.backbone_params["block0"]["mlp"]["fc1"]["kernel"]) - k0))) > 1e-5


@pytest.mark.slow
def test_ft_epoch_through_cli_stack(encoder, overfitting_json,
                                    tmp_path_factory):
    """A full train_epoch + evaluate through the real loader with
    train_backbone: finite losses, scorer cards, moving backbone."""
    from tests.conftest import make_synth_images

    d = tmp_path_factory.mktemp("imgs_ft")
    names = list(overfitting_json.keys())
    make_synth_images(d, names)

    cfg = _cfg(remat_backbone=True)
    tr = Trainer(encoder, cfg)
    bb0 = jax.device_get(tr.backbone_params)
    ds = ImsituDataset(str(d), overfitting_json, encoder, train=True)
    loader = ImsituLoader(ds, batch_size=8, shuffle=True, seed=0)
    top1, _, losses = tr.train_epoch(loader, epoch=0)
    assert np.all(np.isfinite(losses))
    assert top1.get_average_results_both()
    assert _max_delta(bb0, jax.device_get(tr.backbone_params)) > 1e-5

    dev = ImsituLoader(ImsituDataset(str(d), overfitting_json, encoder,
                                     train=False), batch_size=8,
                       shuffle=False)
    _, _, val_losses, _ = tr.evaluate(dev)
    assert all(np.isfinite(v) for v in val_losses.values())


def test_cli_rejects_ft_flags_without_train_backbone(tmp_path):
    """--backbone_lr / --remat_backbone without --train_backbone must be
    parser errors (a silently-ignored rate flag would be worse)."""
    from situation_recognition_tpu.cli import main

    for flags in (["--backbone_lr", "0.001"], ["--remat_backbone"]):
        with pytest.raises(SystemExit) as e:
            main(["--saving_folder", str(tmp_path)] + flags)
        assert e.value.code == 2
