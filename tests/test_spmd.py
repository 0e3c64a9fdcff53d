"""shard_map explicit-SPMD step: runs on the 8-device mesh and agrees with
the jit/NamedSharding step."""

import jax
import jax.numpy as jnp
import numpy as np

from situation_recognition_tpu.parallel.mesh import make_mesh
from situation_recognition_tpu.parallel.spmd import make_shardmap_train_step
from situation_recognition_tpu.train import Trainer, TrainerConfig


def _batch(encoder, B, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "images": rng.integers(0, 255, (B, 256, 256, 3), dtype=np.uint8),
        "flip": np.zeros((B,), bool),
        "verbs": rng.integers(0, encoder.get_num_verbs(), B).astype(np.int32),
        "labels": rng.integers(0, encoder.get_num_labels(),
                               (B, 3, encoder.max_role_count)).astype(np.int32),
    }


def test_shardmap_step_matches_jit_step(encoder):
    mesh = make_mesh()  # 8-way data parallel
    cfg = TrainerConfig(hidden=64, batch_size=16, backbone="mini",
                        compute_dtype=jnp.float32, seed=3)
    tr = Trainer(encoder, cfg, mesh=mesh)
    step_sm = make_shardmap_train_step(tr)

    batch = _batch(encoder, 16)
    arrays, valid, n = tr._pad_batch(batch)
    key = jax.random.PRNGKey(0)
    args = (key, arrays["images"], arrays["flip"], arrays["verbs"],
            arrays["labels"], valid)

    hp_j, opt_j, bs_j, losses_j, topk_j = tr._train_step(
        tr.head_params, tr.opt_state, tr.backbone_params, tr.backbone_stats,
        *args)

    tr2 = Trainer(encoder, cfg, mesh=mesh)  # fresh identical params
    hp_s, opt_s, bs_s, losses_s, topk_s = step_sm(
        tr2.head_params, tr2.opt_state, tr2.backbone_params,
        tr2.backbone_stats, *args)

    # losses agree up to (a) per-shard vs global BN batch-stats and
    # (b) shard-decorrelated dropout — both tiny on this config but nonzero,
    # so compare loosely; finiteness + same scale is the contract
    lj = [float(x) for x in losses_j]
    ls = [float(x) for x in losses_s]
    np.testing.assert_allclose(ls, lj, rtol=0.2)

    # updated params stay replicated and finite
    for leaf in jax.tree.leaves(hp_s):
        assert np.isfinite(np.asarray(leaf)).all()
    # second invocation composes (donated buffers handled)
    out2 = step_sm(hp_s, opt_s, tr2.backbone_params, bs_s, *args)
    assert np.isfinite(float(out2[3][0]))


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
