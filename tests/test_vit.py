"""ViT backbone tests: shapes, trainer integration, hidden-width contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from situation_recognition_tpu.models.vit import ViT, vit_tiny
from situation_recognition_tpu.train import Trainer, TrainerConfig, build_backbone


def test_vit_tiny_forward_shape():
    m = vit_tiny()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False)
    out = m.apply(v, jnp.zeros((2, 224, 224, 3)), train=False)
    assert out.shape == (2, 64)
    assert "batch_stats" not in v


def test_vit_token_count():
    m = ViT(patch=32, width=64, depth=1, heads=2)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    assert v["params"]["pos_embed"].shape == (1, 50, 64)  # 7*7 + CLS


def test_build_backbone_contract():
    m, has_bn = build_backbone("vit_tiny", jnp.float32, 64)
    assert not has_bn
    m, has_bn = build_backbone("mini", jnp.float32, 64)
    assert has_bn
    with pytest.raises(ValueError):
        build_backbone("vit_tiny", jnp.float32, 2048)
    with pytest.raises(ValueError):
        build_backbone("nope", jnp.float32, 64)


def test_vit_trainer_step(encoder):
    cfg = TrainerConfig(hidden=64, batch_size=8, backbone="vit_tiny",
                        compute_dtype=jnp.float32)
    tr = Trainer(encoder, cfg)
    rng = np.random.default_rng(0)
    batch = {
        "images": rng.integers(0, 255, (8, 256, 256, 3), dtype=np.uint8),
        "flip": np.zeros((8,), bool),
        "verbs": rng.integers(0, encoder.get_num_verbs(), 8).astype(np.int32),
        "labels": rng.integers(0, encoder.get_num_labels(),
                               (8, 3, encoder.max_role_count)).astype(np.int32),
    }
    arrays, valid, n = tr._pad_batch(batch)
    out = tr._train_step(tr.head_params, tr.opt_state, tr.backbone_params,
                         tr.backbone_stats, jax.random.PRNGKey(0),
                         arrays["images"], arrays["flip"], arrays["verbs"],
                         arrays["labels"], valid)
    losses = [float(x) for x in out[3]]
    assert all(np.isfinite(losses)), losses
    # eval path (no batch_stats collection) works too
    losses2, _ = tr._eval_step(out[0], tr.backbone_params, tr.backbone_stats,
                               arrays["images"], arrays["verbs"],
                               arrays["labels"], valid)
    assert np.isfinite(float(losses2[0]))
