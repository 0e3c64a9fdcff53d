"""End-to-end converter tests: synthetic reference-style torch checkpoint →
framework checkpoint → loaded into a Trainer with exact value match."""

import os
import subprocess
import sys

import numpy as np
import pytest
import torch
import torch.nn as nn

from tests.test_resnet import TorchResNet

# Integration tier: every test here shells out / runs full epochs;
# excluded from the fast unit tier (pytest -m 'not slow').
pytestmark = pytest.mark.slow


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_reference_checkpoint(path, encoder, d=2048):
    """Synthetic checkpoint with the reference's exact key layout
    (model.py:89-111, sr.py:145-162)."""
    g = torch.Generator().manual_seed(0)

    class Head(nn.Module):
        def __init__(self):
            super().__init__()
            V, Rn, L = (encoder.get_num_verbs(), encoder.get_num_roles(),
                        encoder.get_num_labels())
            self.role_emb = nn.Embedding(Rn + 1, d, padding_idx=Rn)
            self.verb_emb = nn.Embedding(V, d)
            self.convnet_verbs = nn.Module()
            self.convnet_verbs.model = TorchResNet((1, 1, 1, 1))
            self.convnet_nouns = nn.Module()
            self.convnet_nouns.model = TorchResNet((1, 1, 1, 1))
            # identical frozen twins, like the reference
            self.convnet_nouns.model.load_state_dict(
                self.convnet_verbs.model.state_dict())
            self.ggsnn = nn.Module()
            for w in ["W_p", "W_z", "U_z", "W_r", "U_r", "W_h", "U_h"]:
                setattr(self.ggsnn, w, nn.Linear(d, d))
            self.verb_classifier = nn.Sequential(
                nn.Dropout(0.5), nn.Linear(d, V))
            self.nouns_classifier = nn.Sequential(
                nn.Dropout(0.5), nn.Linear(d, L))

    head = Head()
    ckpt = {
        "epoch": 7,
        "avg_scores": [1.0, 2.0], "verb_losses": [3.0], "nouns_losses": [4.0],
        "val_avg_scores": [5.0], "val_verb_losses": [6.0],
        "val_nouns_losses": [7.0],
        "model_state_dict": head.state_dict(),
        "optimizer_state_dict": {},
    }
    torch.save(ckpt, path)
    return head


@pytest.mark.slow
def test_convert_checkpoint_roundtrip(tmp_path, encoder):
    import jax.numpy as jnp

    from situation_recognition_tpu.train import Trainer, TrainerConfig
    from situation_recognition_tpu.utils.checkpoint import load_checkpoint

    src = str(tmp_path / "resnet152_sr")
    dst = str(tmp_path / "sr_converted")
    head = _make_reference_checkpoint(src, encoder)

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_torch.py"),
         "checkpoint", src, dst],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "epoch 7" in r.stdout

    ckpt = load_checkpoint(dst)
    assert ckpt["epoch"] == 7
    assert ckpt["avg_scores"] == [1.0, 2.0]

    cfg = TrainerConfig(hidden=2048, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32)
    tr = Trainer(encoder, cfg)
    tr.load_model_state(ckpt)

    # exact value checks across the conversion
    np.testing.assert_allclose(
        np.asarray(tr.head_params["role_emb"]),
        head.role_emb.weight.detach().numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(tr.head_params["ggnn"]["w_p"]),
        head.ggsnn.W_p.weight.detach().numpy().T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(tr.head_params["nouns_classifier"]["kernel"]),
        head.nouns_classifier[1].weight.detach().numpy().T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(tr.backbone_params["conv1"]["kernel"]),
        head.convnet_nouns.model.conv1.weight.detach().numpy()
        .transpose(2, 3, 1, 0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(tr.backbone_stats["bn1"]["mean"]),
        head.convnet_nouns.model.bn1.running_mean.numpy(), rtol=1e-6)


def test_convert_divergent_twins_rejected(tmp_path, encoder):
    from situation_recognition_tpu.utils.torch_convert import (
        convert_reference_checkpoint)

    src = str(tmp_path / "ckpt")
    head = _make_reference_checkpoint(src, encoder)
    sd = {k: v.numpy() for k, v in head.state_dict().items()}
    sd["convnet_verbs.model.conv1.weight"] = (
        sd["convnet_verbs.model.conv1.weight"] + 1.0)
    with pytest.raises(ValueError, match="diverge"):
        convert_reference_checkpoint(sd)


def test_cli_resume_from_torch_checkpoint(tmp_path, encoder):
    """--resume_model pointed at an original torch checkpoint converts on
    the fly and restores epoch + histories."""
    import jax.numpy as jnp

    from situation_recognition_tpu.cli import _load_resume
    from situation_recognition_tpu.train import Trainer, TrainerConfig

    src = str(tmp_path / "resnet152_sr")
    _make_reference_checkpoint(src, encoder)
    cfg = TrainerConfig(hidden=2048, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32)
    tr = Trainer(encoder, cfg)
    ckpt = _load_resume(tr, src)
    assert ckpt["epoch"] == 7
    assert ckpt["avg_scores"] == [1.0, 2.0]
    assert ckpt["opt_state"] is None


def test_corrupt_checkpoint_raises_real_error(tmp_path, encoder):
    """A corrupt framework checkpoint must surface its msgpack error, not
    fall through to the torch loader and die with a baffling unpickling
    message (round-1 advisor finding: _load_resume swallowed everything)."""
    import jax.numpy as jnp
    import pytest

    from situation_recognition_tpu.cli import _load_resume, _is_torch_checkpoint
    from situation_recognition_tpu.train import Trainer, TrainerConfig

    path = tmp_path / "corrupt"
    path.write_bytes(b"\x85garbage-not-a-real-msgpack-checkpoint" * 3)
    assert not _is_torch_checkpoint(str(path))

    cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32)
    trainer = Trainer(encoder, cfg)
    with pytest.raises(Exception) as ei:
        _load_resume(trainer, str(path))
    msg = (str(ei.value) + type(ei.value).__name__).lower()
    assert "pickle" not in msg and "torch" not in msg, ei.value


def test_torch_magic_bytes_detected(tmp_path):
    import torch

    from situation_recognition_tpu.cli import _is_torch_checkpoint

    p = tmp_path / "t.pth"
    torch.save({"x": torch.zeros(2)}, str(p))
    assert _is_torch_checkpoint(str(p))


def test_basicblock_resnet_converts():
    """resnet18/34 (BasicBlock: conv1/conv2 only) converts to the basic=True
    flax layout — conv1/conv2/bn1/bn2 per block, no conv3 entries."""
    from situation_recognition_tpu.utils.torch_convert import convert_resnet

    def bn(prefix):
        return {f"{prefix}.weight": np.ones(4, np.float32),
                f"{prefix}.bias": np.zeros(4, np.float32),
                f"{prefix}.running_mean": np.zeros(4, np.float32),
                f"{prefix}.running_var": np.ones(4, np.float32)}

    state = {"conv1.weight": np.zeros((4, 3, 7, 7), np.float32), **bn("bn1"),
             "layer1.0.conv1.weight": np.zeros((4, 4, 3, 3), np.float32),
             **bn("layer1.0.bn1"),
             "layer1.0.conv2.weight": np.zeros((4, 4, 3, 3), np.float32),
             **bn("layer1.0.bn2")}
    params, stats = convert_resnet(state)
    blk = params["layer1_0"]
    assert set(blk) == {"conv1", "conv2", "bn1", "bn2"}
    assert blk["conv1"]["kernel"].shape == (3, 3, 4, 4)
    assert set(stats["layer1_0"]) == {"bn1", "bn2"}
