"""Trainer integration tests on the mini backbone + synthetic images:
overfit smoke, stdout parity, checkpoint roundtrip, Adamax parity vs torch."""

import io
import json
import os
import re
import contextlib

import numpy as np
import jax.numpy as jnp
import optax
import pytest
import torch

from situation_recognition_tpu.data.dataset import ImsituDataset, ImsituLoader
from situation_recognition_tpu.train import Trainer, TrainerConfig


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    from tests.conftest import make_synth_images

    d = tmp_path_factory.mktemp("imgs")
    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "overfitting.json")
    with open(fixture) as f:
        names = list(json.load(f).keys())
    make_synth_images(d, names)
    return str(d)


@pytest.fixture(scope="module")
def trainer(encoder):
    cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32, lr=0.01, epochs=2)
    return Trainer(encoder, cfg)


@pytest.fixture(scope="module")
def loaders(img_dir, encoder, overfitting_json):
    train_ds = ImsituDataset(img_dir, overfitting_json, encoder, train=True)
    dev_ds = ImsituDataset(img_dir, overfitting_json, encoder, train=False)
    train = ImsituLoader(train_ds, batch_size=8, shuffle=True, seed=0)
    dev = ImsituLoader(dev_ds, batch_size=8, shuffle=False)
    return train, dev


@pytest.mark.slow
def test_overfit_smoke(trainer, loaders):
    """BASELINE 'CPU smoke' config: loss must go down on the tiny fixture."""
    train_loader, _ = loaders
    _, _, first = trainer.train_epoch(train_loader, epoch=0)
    for e in range(1, 6):
        _, _, last = trainer.train_epoch(train_loader, epoch=e)
    assert last[0] + last[1] < first[0] + first[1], (first, last)


@pytest.mark.slow
def test_overfit_to_convergence(encoder, img_dir, overfitting_json):
    """Strong learning evidence (the closest accessible stand-in for the
    BASELINE accuracy target without the real dataset): the model must
    MEMORIZE the 5-image fixture — 100% train verb top-1 and gt-value —
    not merely reduce the loss.  Deterministic eval-mode windows (no
    augmentation) + dropout off so convergence is exact memorization."""
    import jax.numpy as jnp

    ds = ImsituDataset(img_dir, overfitting_json, encoder, train=False)
    loader = ImsituLoader(ds, batch_size=8, shuffle=False)
    cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32, lr=0.01,
                        dropout_rate=0.0, frozen_backbone_bn="eval")
    tr = Trainer(encoder, cfg)
    first = None
    for e in range(100):
        top1, _, losses = tr.train_epoch(loader, epoch=e)
        if first is None:
            first = losses
    avg = top1.get_average_results_both()
    assert avg["verb"] == 1.0, avg
    assert avg["gt-value"] == 1.0, avg
    assert losses[0] < 0.5 * first[0], (first, losses)
    assert losses[1] < 0.5 * first[1], (first, losses)


def test_evaluate_output_format(trainer, loaders, capsys):
    _, dev_loader = loaders
    top1, top5, val_losses, avg = trainer.evaluate(dev_loader, logging=True)
    out = capsys.readouterr().out
    assert re.match(
        r"val losses = \[v: \d+\.\d\d, n: \d+\.\d\d, gt: \d+\.\d\d\]\n"
        r"1-verb: \d+\.\d\d, 1-value: \d+\.\d\d, 1-value-all: \d+\.\d\d\n"
        r"5-verb: \d+\.\d\d, 5-value: \d+\.\d\d, 5-value-all: \d+\.\d\d\n"
        r"gt-value: \d+\.\d\d, gt-value-all: \d+\.\d\d, mean = \d+\.\d\d\n\n",
        out), out
    assert set(val_losses) == {"verb_loss", "nouns_loss", "gt_loss"}
    assert len(top1) == 5 and len(top5) == 5


@pytest.mark.slow
def test_fit_one_epoch_stdout_and_checkpoint(encoder, loaders, tmp_path, capsys):
    cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32, lr=0.01, epochs=1)
    tr = Trainer(encoder, cfg)
    train_loader, dev_loader = loaders
    tr.fit(train_loader, dev_loader, "sr_test", str(tmp_path), plot=True)
    out = capsys.readouterr().out
    assert out.startswith("Epoch-0, lr: 0.0100\n")
    assert "training losses = [v: " in out
    assert "-" * 50 in out
    assert os.path.exists(tmp_path / "sr_test")
    assert os.path.exists(tmp_path / "sr_test.png")

    from situation_recognition_tpu.utils.checkpoint import load_checkpoint
    ckpt = load_checkpoint(str(tmp_path / "sr_test"))
    assert ckpt["epoch"] == 1
    assert len(ckpt["avg_scores"]) == 1
    assert "head_params" in ckpt and "opt_state" in ckpt

    # resume: histories restored, epoch advanced
    cfg2 = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                         compute_dtype=jnp.float32, lr=0.01, epochs=2)
    tr2 = Trainer(encoder, cfg2)
    tr2.fit(train_loader, dev_loader, "sr_test", str(tmp_path),
            checkpoint=ckpt)
    out2 = capsys.readouterr().out
    assert "Epoch-1, lr:" in out2 and "Epoch-0" not in out2
    # histories restored as real lists (msgpack turns lists into index
    # dicts; load_checkpoint must canonicalize) and appended to
    ckpt2 = load_checkpoint(str(tmp_path / "sr_test"))
    assert ckpt2["epoch"] == 2
    assert isinstance(ckpt2["avg_scores"], list)
    assert len(ckpt2["avg_scores"]) == 2


def test_partial_batch_masking(trainer, loaders):
    """5 examples with batch_size 8: metrics must count exactly 5 points."""
    _, dev_loader = loaders
    top1, top5, _, _ = trainer.evaluate(dev_loader)
    assert len(top1) == 5
    assert len(top5) == 5


def test_optax_adamax_matches_torch():
    """The reference optimizer is torch.optim.Adamax (sr.py:472); optax's
    adamax must produce the same trajectory on a quadratic."""
    w0 = np.array([1.0, -2.0, 3.0], dtype=np.float32)
    tw = torch.tensor(w0.copy(), requires_grad=True)
    topt = torch.optim.Adamax([tw], lr=0.1)
    jw = jnp.asarray(w0.copy())
    jopt = optax.adamax(0.1)
    jstate = jopt.init(jw)
    for _ in range(10):
        topt.zero_grad()
        loss = (tw ** 2).sum()
        loss.backward()
        topt.step()
        g = 2 * jw
        upd, jstate = jopt.update(g, jstate, jw)
        jw = optax.apply_updates(jw, upd)
    np.testing.assert_allclose(np.asarray(jw), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_mid_epoch_checkpoint_resume(encoder, loaders, tmp_path):
    """save_every_steps snapshots let a new trainer finish the epoch with
    the full dataset counted exactly once."""
    import jax

    train_loader, _ = loaders
    train_loader = ImsituLoader(train_loader.dataset, batch_size=2,
                                shuffle=True, seed=1)  # 3 batches (2+2+1)
    cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32, lr=0.01)
    tr = Trainer(encoder, cfg)

    mids = []

    class StopAfterFirstSave(Exception):
        pass

    def cb(mid):
        mids.append(mid)
        raise StopAfterFirstSave()

    try:
        tr.train_epoch(train_loader, epoch=0, save_every=1, save_callback=cb)
    except StopAfterFirstSave:
        pass
    assert mids and mids[0]["batch_in_epoch"] == 1
    assert mids[0]["top1"]["count"] == 2

    # round-trip the snapshot through the REAL checkpoint path (fit()'s
    # save_mid writes it via save_checkpoint, whose to_state_dict turns
    # loss_sums into an index dict; load_checkpoint must canonicalize it)
    from situation_recognition_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint)

    path = str(tmp_path / "mid_ckpt")
    save_checkpoint(path, {"epoch": 0, "mid": mids[0],
                           **tr.model_state_dict()})
    mid = load_checkpoint(path)["mid"]
    assert isinstance(mid["loss_sums"], list)
    assert isinstance(mid["batch_in_epoch"], int)

    # fresh trainer resumes from the disk snapshot and completes the epoch
    tr2 = Trainer(encoder, cfg)
    top1, top5, losses = tr2.train_epoch(train_loader, epoch=0,
                                         mid_state=mid)
    assert len(top1) == 5  # 2 (from snapshot) + 3 remaining
    assert all(np.isfinite(losses))


@pytest.mark.slow
def test_frozen_bn_eval_stats_invariant(encoder, loaders):
    """--frozen_bn eval: a train step must not touch BN running stats and
    must normalize with them (train-mode stats change; eval-mode must not)."""
    import jax

    train_loader, _ = loaders
    cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32, lr=0.01,
                        frozen_backbone_bn="eval")
    tr = Trainer(encoder, cfg)
    before = jax.device_get(tr.backbone_stats)
    tr.train_epoch(train_loader, epoch=0)
    after = jax.device_get(tr.backbone_stats)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # parity mode on the same data DOES update the running stats
    cfg2 = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                         compute_dtype=jnp.float32, lr=0.01)
    tr2 = Trainer(encoder, cfg2)
    before2 = jax.device_get(tr2.backbone_stats)
    tr2.train_epoch(train_loader, epoch=0)
    after2 = jax.device_get(tr2.backbone_stats)
    changed = any(not np.array_equal(np.asarray(a), np.asarray(b))
                  for a, b in zip(jax.tree.leaves(before2),
                                  jax.tree.leaves(after2)))
    assert changed


def test_epoch_boundary_resume_continues_dropout_stream(encoder, loaders):
    """An epoch-boundary checkpoint must carry step_count so a resumed
    run CONTINUES the per-step dropout-key stream instead of replaying
    epoch 0's masks (the mid-epoch save path already preserved it; a
    resumed trajectory must match the uninterrupted one).  Verified by
    trajectory equality: train 2 epochs straight vs train 1 + resume 1
    — identical params require identical dropout keys in epoch 1."""
    import jax

    train_loader, _ = loaders
    cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32, lr=0.01)

    straight = Trainer(encoder, cfg)
    for e in range(2):
        straight.train_epoch(train_loader, epoch=e)

    first = Trainer(encoder, cfg)
    first.train_epoch(train_loader, epoch=0)
    assert first.step_count > 0

    # round-trip through the REAL checkpoint path (fit's save +
    # _load_resume's load), not a raw in-memory dict
    import tempfile

    from situation_recognition_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "sr_resume")
        save_checkpoint(path, {"epoch": 1, **first.model_state_dict()})
        state = load_checkpoint(path)
    assert state["step_count"] == first.step_count

    resumed = Trainer(encoder, cfg)
    resumed.load_model_state(state)
    assert resumed.step_count == first.step_count
    resumed.train_epoch(train_loader, epoch=1)

    for a, b in zip(jax.tree.leaves(straight.head_params),
                    jax.tree.leaves(resumed.head_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_preempt_event_snapshots_and_raises(encoder, loaders):
    """Preemption flag (fit(handle_sigterm=True)'s SIGTERM path): the epoch
    loop must save one resumable snapshot at the first optimizer-step
    boundary and raise Preempted — and the snapshot must resume exactly
    like a --save_steps one (same schema, same batch accounting)."""
    import threading

    from situation_recognition_tpu.train import Preempted

    train_loader, _ = loaders
    loader = ImsituLoader(train_loader.dataset, batch_size=2,
                          shuffle=True, seed=3)  # 3 batches (2+2+1)
    cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32, lr=0.01)
    tr = Trainer(encoder, cfg)

    ev = threading.Event()
    ev.set()  # "SIGTERM already delivered" — must stop after ONE step
    mids = []
    with pytest.raises(Preempted) as ei:
        tr.train_epoch(loader, epoch=0, save_callback=mids.append,
                       preempt=ev)
    assert len(mids) == 1
    assert mids[0]["batch_in_epoch"] == 1
    assert ei.value.batch_in_epoch == 1

    # the snapshot resumes the epoch with every example counted once
    tr2 = Trainer(encoder, cfg)
    top1, _, losses = tr2.train_epoch(loader, epoch=0, mid_state=mids[0])
    assert len(top1) == 5  # 2 (snapshot) + 3 remaining
    assert all(np.isfinite(losses))

    # without a save_callback (non-main ranks in multi-process DP) the
    # flag still stops the loop — no snapshot, clean raise
    tr3 = Trainer(encoder, cfg)
    with pytest.raises(Preempted):
        tr3.train_epoch(loader, epoch=0, preempt=ev)


def test_preempt_waits_for_accum_group_boundary(encoder, loaders):
    """With grad_accum, preemption must not snapshot mid-group (the
    accumulated gradients would be silently dropped on resume): the raise
    lands only after the group's optimizer step applies."""
    import threading

    from situation_recognition_tpu.train import Preempted

    train_loader, _ = loaders
    loader = ImsituLoader(train_loader.dataset, batch_size=2,
                          shuffle=True, seed=3)  # 3 batches
    cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32, lr=0.01, grad_accum=2)
    tr = Trainer(encoder, cfg)

    ev = threading.Event()
    ev.set()
    mids = []
    with pytest.raises(Preempted) as ei:
        tr.train_epoch(loader, epoch=0, save_callback=mids.append,
                       preempt=ev)
    # batch 1 is mid-group (micros=1, no stop); batch 2 completes the
    # 2-microbatch group -> snapshot + raise at batch_in_epoch == 2
    assert ei.value.batch_in_epoch == 2
    assert mids and mids[0]["batch_in_epoch"] == 2


def test_keep_best_and_metrics_jsonl(encoder, loaders, tmp_path, capsys):
    """--keep_best writes <name>_best at the best-val-mean epoch (the
    reference's own sr.py:144 comment flags this gap); --metrics_jsonl
    appends one structured record per epoch."""
    from situation_recognition_tpu.utils.checkpoint import load_checkpoint

    train_loader, dev_loader = loaders
    cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32, lr=0.01, epochs=2)
    tr = Trainer(encoder, cfg)
    mpath = str(tmp_path / "metrics.jsonl")
    tr.fit(train_loader, dev_loader, "sr_kb", str(tmp_path), plot=False,
           keep_best=True, metrics_jsonl=mpath)
    capsys.readouterr()

    with open(mpath) as f:
        recs = [json.loads(line) for line in f]
    assert [r["epoch"] for r in recs] == [0, 1]
    for r in recs:
        assert set(r) >= {"train_losses", "train_top1", "train_top5",
                          "train_mean", "val_losses", "val_mean",
                          "img_per_sec", "ms_per_step"}
        assert set(r["train_top1"]) == {"verb", "value", "value-all",
                                        "gt-value", "gt-value-all"}
        assert np.isfinite(r["val_losses"]["verb_loss"])

    best = load_checkpoint(str(tmp_path / "sr_kb_best"))
    final = load_checkpoint(str(tmp_path / "sr_kb"))
    vals = final["val_avg_scores"]
    b = int(best["epoch"]) - 1
    # the best file holds the (last) epoch achieving the max val mean
    assert vals[b] == max(vals), (vals, b)
    assert recs[b]["val_mean"] == pytest.approx(vals[b])

    # resume never demotes: a resumed history with a better past epoch
    # suppresses the best write entirely
    from situation_recognition_tpu.utils.checkpoint import save_checkpoint

    tr2 = Trainer(encoder, cfg)
    save_checkpoint(str(tmp_path / "sr_kb2_seed"), {
        "epoch": 1, "avg_scores": [1.0], "verb_losses": [1.0],
        "nouns_losses": [1.0], "val_avg_scores": [999.0],
        "val_verb_losses": [1.0], "val_nouns_losses": [1.0],
        **tr2.model_state_dict()})
    ck = load_checkpoint(str(tmp_path / "sr_kb2_seed"))
    tr2.fit(train_loader, dev_loader, "sr_kb2", str(tmp_path), plot=False,
            checkpoint=ck, keep_best=True)
    capsys.readouterr()
    assert os.path.exists(str(tmp_path / "sr_kb2"))
    assert not os.path.exists(str(tmp_path / "sr_kb2_best"))


def test_async_saver_serializes_and_reraises(tmp_path):
    """AsyncSaver: writes land before join returns; a failed background
    write re-raises on the next join instead of vanishing."""
    import time

    from situation_recognition_tpu.train import AsyncSaver
    from situation_recognition_tpu.utils.checkpoint import load_checkpoint

    saver = AsyncSaver()
    p = str(tmp_path / "ck")
    saver.save(p, {"epoch": 1, "x": np.arange(4.0)}, background=True)
    saver.save(p, {"epoch": 2, "x": np.arange(4.0)}, background=True)
    saver.join()
    assert load_checkpoint(p)["epoch"] == 2

    saver.save(str(tmp_path / "nodir" / "ck"), {"epoch": 3},
               background=True)
    time.sleep(0.2)
    with pytest.raises(OSError):
        saver.join()
    # the error is consumed — the saver is reusable afterwards
    saver.save(p, {"epoch": 4}, background=True)
    saver.join()
    assert load_checkpoint(p)["epoch"] == 4


def test_fit_async_save_checkpoints_and_resumes(encoder, loaders, tmp_path,
                                                capsys):
    """fit(async_save=True) produces the same durable artifacts as the
    sync path: final checkpoint (and _best) on disk, loadable, resumable."""
    from situation_recognition_tpu.utils.checkpoint import load_checkpoint

    train_loader, dev_loader = loaders
    cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32, lr=0.01, epochs=2)
    tr = Trainer(encoder, cfg)
    tr.fit(train_loader, dev_loader, "sr_async", str(tmp_path), plot=False,
           keep_best=True, async_save=True)
    capsys.readouterr()

    ck = load_checkpoint(str(tmp_path / "sr_async"))
    assert ck["epoch"] == 2
    assert len(ck["avg_scores"]) == 2
    assert os.path.exists(str(tmp_path / "sr_async_best"))

    tr2 = Trainer(encoder, cfg)
    tr2.load_model_state(ck)
    for a, b in zip(np.asarray(tr.head_params["role_emb"]),
                    np.asarray(tr2.head_params["role_emb"])):
        np.testing.assert_array_equal(a, b)


def test_evaluate_preempt_raises_between_batches(encoder, loaders):
    """VERDICT r4 weak #3: a SIGTERM during a long dev eval must stop
    between batches instead of deferring to the end of the split.
    evaluate(preempt=<set event>) raises Preempted after the first
    batch's dispatch; nothing in eval mutates trainer state, so the
    caller can checkpoint and redo the eval cleanly."""
    import threading

    from situation_recognition_tpu.train import Preempted

    _, dev_loader = loaders
    cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32, lr=0.01)
    tr = Trainer(encoder, cfg)
    loader = ImsituLoader(dev_loader.dataset, batch_size=8, shuffle=False)

    ev = threading.Event()
    ev.set()
    with pytest.raises(Preempted):
        tr.evaluate(loader, preempt=ev)
    # without the flag the same eval completes
    top1, _, losses, _ = tr.evaluate(loader)
    assert len(top1) == 5
    assert all(np.isfinite(v) for v in losses.values())


def test_sigterm_mid_eval_checkpoints_and_resume_catches_up(
        encoder, loaders, tmp_path, capsys):
    """The r4 full-scale drill's uncovered phase: SIGTERM landing during
    the per-epoch dev eval.  fit must (a) persist the COMPLETED epoch
    with the val histories one entry short and exit cleanly, and (b) on
    resume, complete the missing val record (catch-up eval) before
    training continues, leaving aligned histories."""
    import os as _os
    import signal

    from situation_recognition_tpu.utils.checkpoint import load_checkpoint

    train_loader, dev_loader = loaders
    cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32, lr=0.01, epochs=2)
    tr = Trainer(encoder, cfg)
    calls = []
    real = tr._eval_step

    def wrapped(*a, **k):
        calls.append(1)
        if len(calls) == 1:
            # delivered on the main thread: fit's SIGTERM handler sets
            # the preempt flag, checked after this batch's dispatch
            _os.kill(_os.getpid(), signal.SIGTERM)
        return real(*a, **k)

    tr._eval_step = wrapped
    tr.fit(train_loader, dev_loader, "mideval", folder=str(tmp_path),
           plot=False, handle_sigterm=True)
    capsys.readouterr()

    ck = load_checkpoint(str(tmp_path / "mideval"))
    assert ck["epoch"] == 1                      # epoch 0 training complete
    assert len(ck["avg_scores"]) == 1
    assert len(ck["val_avg_scores"]) == 0        # eval was interrupted

    # resume: catch-up eval completes epoch 0's val record, then epoch 1
    tr2 = Trainer(encoder, cfg)
    tr2.load_model_state(ck)
    fit_ckpt = {k: v for k, v in ck.items()
                if k not in ("head_params", "backbone_params",
                             "backbone_stats", "opt_state")}
    tr2.fit(train_loader, dev_loader, "mideval", folder=str(tmp_path),
            checkpoint=fit_ckpt, plot=False, keep_best=True)
    capsys.readouterr()
    final = load_checkpoint(str(tmp_path / "mideval"))
    assert final["epoch"] == 2
    assert len(final["avg_scores"]) == 2
    assert len(final["val_avg_scores"]) == 2     # catch-up + epoch 1
    assert os.path.exists(str(tmp_path / "mideval_best"))
