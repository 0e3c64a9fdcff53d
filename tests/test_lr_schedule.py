"""Learning-rate schedules (``--lr_schedule`` / ``--warmup_steps`` /
``--total_steps`` / ``--min_lr``).

ADDITIVE capability — the reference trains at a constant Adamax lr 0.002
forever (``/root/reference/sr.py:472``).  These tests pin: the default
('constant', no warmup) keeps the reference-exact optimizer tree
(``make_lr_fn`` → None, so pre-schedule checkpoints and goldens are
untouched); the schedule shapes (warmup ramp, cosine, linear, min_lr
clamp); the optimizer-step drive (adamax's first update is exactly
±rate, so the first-step max|delta| IS the schedule value); exact resume
through checkpoints (the counter rides in opt_state); and the CLI
validation surface.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from situation_recognition_tpu.train import (Trainer, TrainerConfig,
                                             make_lr_fn)


def _cfg(**kw):
    base = dict(hidden=64, batch_size=8, backbone="mini",
                compute_dtype=jnp.float32, lr=0.01, dropout_rate=0.0)
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


def _step(tr, b, key=1):
    (tr.head_params, tr.opt_state, tr.backbone_stats, losses,
     _) = tr._train_step(
        tr.head_params, tr.opt_state, tr.backbone_params,
        tr.backbone_stats, jax.random.PRNGKey(key), b["images"],
        b["flip"], b["verbs"], b["labels"], b["valid"])
    return losses


def _max_delta(a, b):
    return max(float(jnp.max(jnp.abs(x - y))) for x, y in
               zip(jax.tree.leaves(a), jax.tree.leaves(b)))


# ------------------------------------------------------------ shape math

def test_constant_no_warmup_is_reference_path():
    """The default must return None — optax.adamax(lr) keeps the optimizer
    state tree byte-identical to every pre-schedule checkpoint."""
    assert make_lr_fn(_cfg()) is None
    assert make_lr_fn(_cfg(lr_schedule="constant")) is None


def test_warmup_ramp_values():
    fn = make_lr_fn(_cfg(lr=0.01, warmup_steps=4))
    # step c < warmup runs at lr*(c+1)/warmup: the first step MOVES
    np.testing.assert_allclose(
        [float(fn(c)) for c in range(6)],
        [0.0025, 0.005, 0.0075, 0.01, 0.01, 0.01], rtol=1e-6)


def test_cosine_values_and_clamp():
    fn = make_lr_fn(_cfg(lr=0.01, lr_schedule="cosine", total_steps=10,
                         min_lr=0.002))
    lo, hi = 0.002, 0.01
    for c in (0, 3, 5, 9, 10, 25):
        t = min(c / 10, 1.0)
        want = lo + (hi - lo) * 0.5 * (1 + np.cos(np.pi * t))
        np.testing.assert_allclose(float(fn(c)), want, rtol=1e-6,
                                   err_msg=f"count {c}")
    # holds at min_lr past the horizon
    np.testing.assert_allclose(float(fn(1000)), lo, rtol=1e-6)


def test_linear_values_with_warmup():
    fn = make_lr_fn(_cfg(lr=0.01, lr_schedule="linear", total_steps=12,
                         warmup_steps=2))
    np.testing.assert_allclose(float(fn(0)), 0.005, rtol=1e-6)
    np.testing.assert_allclose(float(fn(1)), 0.01, rtol=1e-6)
    # decay over total_steps - warmup = 10 steps, starting AT warmup
    np.testing.assert_allclose(float(fn(2)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(fn(7)), 0.005, rtol=1e-6)
    np.testing.assert_allclose(float(fn(12)), 0.0, atol=1e-9)
    np.testing.assert_allclose(float(fn(99)), 0.0, atol=1e-9)


def test_validation_errors():
    with pytest.raises(ValueError, match="constant|cosine|linear"):
        make_lr_fn(_cfg(lr_schedule="step"))
    with pytest.raises(ValueError, match="total_steps"):
        make_lr_fn(_cfg(lr_schedule="cosine"))
    with pytest.raises(ValueError, match="exceed"):
        make_lr_fn(_cfg(lr_schedule="linear", total_steps=4,
                        warmup_steps=4))
    with pytest.raises(ValueError, match="min_lr"):
        make_lr_fn(_cfg(lr_schedule="cosine", total_steps=10, min_lr=0.5))
    with pytest.raises(ValueError, match="warmup_steps"):
        make_lr_fn(_cfg(warmup_steps=-1))
    with pytest.raises(ValueError, match="no meaning"):
        make_lr_fn(_cfg(total_steps=10))


# ---------------------------------------------------------- trainer drive

def test_first_steps_move_at_schedule_rate(encoder):
    """Adamax's update is exactly ±rate on the first step wherever the
    gradient is nonzero, so max|param delta| of step k must equal the
    schedule at count k while mu/nu are fresh... step 0 gives an exact
    equality; later steps bound above by the rate."""
    tr = Trainer(encoder, _cfg(warmup_steps=4))
    b = _batch(encoder)
    hp0 = jax.device_get(tr.head_params)
    _step(tr, b)
    d0 = _max_delta(hp0, jax.device_get(tr.head_params))
    np.testing.assert_allclose(d0, 0.01 / 4, rtol=1e-4)
    # steps 1..3: |update| tracks rate(c) (the bias-corrected mu/nu ratio
    # can exceed 1 by ~|g_prev/g - 1| once history accumulates, so the
    # bound is loose — the point is the ramp, not adamax's internals)
    for c in (1, 2, 3):
        hp = jax.device_get(tr.head_params)
        _step(tr, b, key=c + 1)
        d = _max_delta(hp, jax.device_get(tr.head_params))
        rate = 0.01 * (c + 1) / 4
        assert d <= rate * 1.05, (c, d, rate)
        assert d >= rate * 0.5, (c, d, rate)


def test_current_lr_tracks_optimizer_count(encoder):
    tr = Trainer(encoder, _cfg(lr=0.01, lr_schedule="linear",
                               total_steps=10))
    fn = make_lr_fn(tr.config)
    b = _batch(encoder)
    for c in range(3):
        np.testing.assert_allclose(tr.current_lr(), float(fn(c)),
                                   rtol=1e-6)
        _step(tr, b, key=c)
    # constant path reports the configured lr
    assert Trainer(encoder, _cfg()).current_lr() == 0.01


@pytest.mark.slow
def test_schedule_resumes_exactly_through_checkpoint(encoder, tmp_path):
    """(2 steps, save, load, 1 step) == (3 steps): the schedule counter
    rides in opt_state, so a resumed run continues the decay instead of
    restarting it."""
    from situation_recognition_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint)

    cfg = _cfg(lr=0.01, lr_schedule="cosine", total_steps=6,
               warmup_steps=2)
    batches = [_batch(encoder, seed=s) for s in range(3)]

    tr_a = Trainer(encoder, cfg)
    for i, b in enumerate(batches):
        _step(tr_a, b, key=i)

    tr_b = Trainer(encoder, cfg)
    for i, b in enumerate(batches[:2]):
        _step(tr_b, b, key=i)
    path = str(tmp_path / "sched_ckpt")
    save_checkpoint(path, {"model": tr_b.model_state_dict()})
    tr_c = Trainer(encoder, cfg)
    tr_c.load_model_state(load_checkpoint(path)["model"])
    np.testing.assert_allclose(tr_c.current_lr(), tr_b.current_lr(),
                               rtol=1e-6)
    _step(tr_c, batches[2], key=2)

    assert _max_delta(tr_a.head_params, tr_c.head_params) < 1e-7


@pytest.mark.slow
def test_backbone_lr_scales_the_schedule(encoder):
    """train_backbone + backbone_lr + schedule: the backbone's first-step
    magnitude is (backbone_lr/lr) * schedule(0) — the post-scale is
    schedule-invariant."""
    lr, q = 0.01, 0.25
    tr = Trainer(encoder, _cfg(lr=lr, warmup_steps=2, train_backbone=True,
                               backbone_lr=q * lr))
    b = _batch(encoder)
    bb0 = jax.device_get(tr.backbone_params)
    hp0 = jax.device_get(tr.head_params)
    tp, tr.opt_state, tr.backbone_stats, _, _ = tr._train_step_ft(
        tr._trainable(), tr.opt_state, tr.backbone_stats,
        jax.random.PRNGKey(1), b["images"], b["flip"], b["verbs"],
        b["labels"], b["valid"])
    rate0 = lr / 2   # warmup step 0
    np.testing.assert_allclose(
        _max_delta(hp0, jax.device_get(tp["head"])), rate0, rtol=1e-4)
    np.testing.assert_allclose(
        _max_delta(bb0, jax.device_get(tp["backbone"])), q * rate0,
        rtol=1e-4)


# ----------------------------------------------------------------- CLI

def test_cli_rejects_inconsistent_schedule_flags(tmp_path):
    from situation_recognition_tpu.cli import main

    bad = (
        ["--lr_schedule", "cosine"],                      # no horizon
        ["--lr_schedule", "linear", "--total_steps", "4",
         "--warmup_steps", "4"],                          # horizon <= warmup
        ["--total_steps", "10"],                          # constant + horizon
        ["--min_lr", "0.001"],                            # constant + floor
        ["--lr_schedule", "cosine", "--total_steps", "10",
         "--min_lr", "0.5"],                              # floor > lr
    )
    for flags in bad:
        with pytest.raises(SystemExit) as e:
            main(["--saving_folder", str(tmp_path)] + flags)
        assert e.value.code == 2, flags
