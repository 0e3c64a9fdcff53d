"""shard_map explicit-SPMD step: runs on the 8-device mesh and agrees with
the jit/NamedSharding step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from situation_recognition_tpu.parallel.mesh import make_mesh
from situation_recognition_tpu.parallel.spmd import make_shardmap_train_step
from situation_recognition_tpu.train import Trainer, TrainerConfig

# Integration tier (~20 s/test: full shard_map train-step compiles over the
# 8-device mesh); excluded from the fast unit tier (pytest -m 'not slow').
pytestmark = pytest.mark.slow



def _batch(encoder, B, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "images": rng.integers(0, 255, (B, 256, 256, 3), dtype=np.uint8),
        "flip": np.zeros((B,), bool),
        "verbs": rng.integers(0, encoder.get_num_verbs(), B).astype(np.int32),
        "labels": rng.integers(0, encoder.get_num_labels(),
                               (B, 3, encoder.max_role_count)).astype(np.int32),
    }


def test_shardmap_step_matches_jit_step_exact(encoder):
    """With the two legitimate divergence sources removed — dropout off
    (the paths use different per-shard keys) and frozen-backbone eval BN
    (the jit path computes global batch stats, shard_map per-shard) — the
    explicit-psum step must agree with the jit/NamedSharding step to float
    tolerance.  A substantially wrong psum cannot pass this."""
    mesh = make_mesh()  # 8-way data parallel
    import optax

    cfg = TrainerConfig(hidden=64, batch_size=16, backbone="mini",
                        compute_dtype=jnp.float32, seed=3,
                        dropout_rate=0.0, frozen_backbone_bn="eval")

    def sgd_trainer():
        # plain SGD so the param delta IS lr*grad: adamax's g/(|g|+eps)
        # normalization amplifies fp-reassociation noise on tiny grads and
        # would force a loose comparison
        t = Trainer(encoder, cfg, mesh=mesh)
        t.tx = optax.sgd(0.1)
        t.opt_state = jax.jit(t.tx.init)(t.head_params)
        t._build_steps()
        return t

    tr = sgd_trainer()
    step_sm = make_shardmap_train_step(tr)

    batch = _batch(encoder, 16)
    arrays, valid, n = tr._pad_batch(batch)
    key = jax.random.PRNGKey(0)
    args = (key, arrays["images"], arrays["flip"], arrays["verbs"],
            arrays["labels"], valid)

    hp_j, opt_j, bs_j, losses_j, topk_j = tr._train_step(
        tr.head_params, tr.opt_state, tr.backbone_params, tr.backbone_stats,
        *args)

    tr2 = sgd_trainer()  # fresh identical params
    hp_s, opt_s, bs_s, losses_s, topk_s = step_sm(
        tr2.head_params, tr2.opt_state, tr2.backbone_params,
        tr2.backbone_stats, *args)

    lj = [float(x) for x in losses_j]
    ls = [float(x) for x in losses_s]
    np.testing.assert_allclose(ls, lj, rtol=1e-5, atol=1e-6)

    # updated params agree leaf-by-leaf (grad psum == global grad)
    for a, b in zip(jax.tree.leaves(hp_j), jax.tree.leaves(hp_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    # and the top-k predictions are identical
    for a, b in zip(topk_j, topk_s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # second invocation composes (donated buffers handled)
    out2 = step_sm(hp_s, opt_s, tr2.backbone_params, bs_s, *args)
    assert np.isfinite(float(out2[3][0]))


def test_shardmap_step_dropout_on_same_scale(encoder):
    """Parity config (dropout on, train-mode BN): shard-decorrelated dropout
    and per-shard batch stats make the paths differ slightly; the contract
    is same scale + finite."""
    mesh = make_mesh()
    cfg = TrainerConfig(hidden=64, batch_size=16, backbone="mini",
                        compute_dtype=jnp.float32, seed=3)
    tr = Trainer(encoder, cfg, mesh=mesh)
    step_sm = make_shardmap_train_step(tr)
    batch = _batch(encoder, 16)
    arrays, valid, _ = tr._pad_batch(batch)
    key = jax.random.PRNGKey(0)
    args = (key, arrays["images"], arrays["flip"], arrays["verbs"],
            arrays["labels"], valid)
    losses_j = tr._train_step(
        tr.head_params, tr.opt_state, tr.backbone_params, tr.backbone_stats,
        *args)[3]
    tr2 = Trainer(encoder, cfg, mesh=mesh)
    losses_s = step_sm(tr2.head_params, tr2.opt_state, tr2.backbone_params,
                       tr2.backbone_stats, *args)[3]
    np.testing.assert_allclose([float(x) for x in losses_s],
                               [float(x) for x in losses_j], rtol=0.2)


def test_shardmap_deterministic(encoder):
    mesh = make_mesh()
    cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32, seed=1)
    results = []
    for _ in range(2):
        tr = Trainer(encoder, cfg, mesh=mesh)
        step = make_shardmap_train_step(tr)
        batch = _batch(encoder, 8, seed=2)
        arrays, valid, _ = tr._pad_batch(batch)
        out = step(tr.head_params, tr.opt_state, tr.backbone_params,
                   tr.backbone_stats, jax.random.PRNGKey(5),
                   arrays["images"], arrays["flip"], arrays["verbs"],
                   arrays["labels"], valid)
        results.append([float(x) for x in out[3]])
    assert results[0] == results[1]


def test_shardmap_rejects_tensor_parallel(encoder):
    """The explicit step's P() specs would silently all-gather model-axis
    kernels and return them replicated; TP configs must be rejected."""
    import pytest

    mesh = make_mesh(num_devices=8, model=2)
    cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32, model_axis=2)
    tr = Trainer(encoder, cfg, mesh=mesh)
    with pytest.raises(NotImplementedError, match="data-parallel only"):
        make_shardmap_train_step(tr)
