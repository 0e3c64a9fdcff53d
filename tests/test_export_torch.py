"""Reverse-exporter tests: framework state → reference-shaped torch
checkpoint (utils/torch_export.py, tools/export_torch.py).

The oracle is torch itself: the exported ``model_state_dict`` must load
into the clean-room reference replica with ``strict=True`` and reproduce
its logits, the key ORDER must match a native ``state_dict()`` save (the
reference's optimizer indices zip onto registration order,
/root/reference/sr.py:472-473), and the exported Adamax state must be
byte-equal to what ``torch.optim.Adamax.state_dict()`` produced before
the torch→optax→torch round trip.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import torch

from situation_recognition_tpu.utils import torch_convert
from situation_recognition_tpu.utils.torch_export import (
    export_adamax_state, export_reference_checkpoint,
    export_reference_state_dict)
from tests.test_resnet import _randomize_bn_stats
from tests.torch_refmodel import RefFCGGNN

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
D = 64


@pytest.fixture(scope="module")
def ref_model(encoder):
    torch.manual_seed(21)
    model = RefFCGGNN(encoder, d=D)
    _randomize_bn_stats(model, seed=5)
    # keep the frozen twins identical (like the published checkpoints)
    model.convnet_nouns.load_state_dict(model.convnet_verbs.state_dict())
    model.eval()
    return model


@pytest.fixture(scope="module")
def converted(ref_model):
    sd = {k: np.asarray(v.detach().numpy())
          for k, v in ref_model.state_dict().items()}
    return torch_convert.convert_reference_checkpoint(sd)


def test_export_matches_native_state_dict(ref_model, converted):
    """torch → JAX → torch must be the identity: same keys, same ORDER
    (registration order — what optimizer param indices zip onto), same
    values bit-for-bit (pure transposes both ways)."""
    bparams, bstats, head = converted
    exported = export_reference_state_dict(bparams, bstats, head)
    native = ref_model.state_dict()
    assert list(exported) == list(native)
    for k in native:
        np.testing.assert_array_equal(
            exported[k], np.asarray(native[k].detach().numpy()),
            err_msg=k)


def test_export_loads_strict_and_reproduces_logits(encoder, ref_model,
                                                   converted):
    bparams, bstats, head = converted
    exported = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in export_reference_state_dict(
                    bparams, bstats, head).items()}
    torch.manual_seed(99)  # different init — the load must overwrite all
    fresh = RefFCGGNN(encoder, d=D)
    fresh.load_state_dict(exported, strict=True)
    fresh.eval()

    rng = np.random.default_rng(3)
    img = torch.from_numpy(
        rng.standard_normal((2, 3, 224, 224)).astype(np.float32))
    verbs = torch.from_numpy(
        rng.integers(0, encoder.get_num_verbs(), 2).astype(np.int64))
    with torch.no_grad():
        a = ref_model(img, verbs)
        b = fresh(img, verbs)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.numpy(), y.numpy())


def _torch_adamax_after_steps(ref_model, steps=3, lr=0.002):
    """Run a few real Adamax steps on the replica's trainables (synthetic
    deterministic grads) and return the optimizer."""
    params = [p for p in ref_model.parameters() if p.requires_grad]
    opt = torch.optim.Adamax(params, lr=lr)
    g = torch.Generator().manual_seed(17)
    for _ in range(steps):
        opt.zero_grad()
        for p in params:
            p.grad = torch.randn(p.shape, generator=g) * 1e-3
        opt.step()
    return opt


def test_export_adamax_roundtrip_exact(ref_model, converted):
    """torch Adamax state → optax (convert_adamax_state) → torch
    (export_adamax_state) reproduces exp_avg/exp_inf/step exactly, with
    the param indices back on registration order."""
    import optax
    from flax import serialization

    _, _, head = converted
    opt = _torch_adamax_after_steps(ref_model)
    osd = opt.state_dict()

    model_keys = list(ref_model.state_dict())
    mu, nu, count = torch_convert.convert_adamax_state(osd, model_keys)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamax(0.002))
    template = serialization.to_state_dict(
        tx.init(serialization.from_state_dict(head, head)))
    filled = torch_convert.fill_adamax_opt_state(template, mu, nu, count)

    back = export_adamax_state(filled)
    assert back["param_groups"][0]["params"] == \
        osd["param_groups"][0]["params"]
    assert back["param_groups"][0]["lr"] == osd["param_groups"][0]["lr"]
    for idx in osd["param_groups"][0]["params"]:
        src, dst = osd["state"][idx], back["state"][idx]
        np.testing.assert_array_equal(
            dst["exp_avg"], src["exp_avg"].numpy(), err_msg=f"param {idx}")
        np.testing.assert_array_equal(
            dst["exp_inf"], src["exp_inf"].numpy(), err_msg=f"param {idx}")
        assert float(dst["step"]) == float(
            src["step"].item() if hasattr(src["step"], "item")
            else src["step"])

    # and torch accepts the exported dict on a fresh optimizer
    fresh_opt = torch.optim.Adamax(
        [p for p in ref_model.parameters() if p.requires_grad], lr=0.002)
    as_torch = {
        "state": {i: {k: (torch.from_numpy(np.ascontiguousarray(v))
                          if isinstance(v, np.ndarray) else torch.tensor(v))
                      for k, v in s.items()}
                  for i, s in back["state"].items()},
        "param_groups": back["param_groups"],
    }
    fresh_opt.load_state_dict(as_torch)
    got = fresh_opt.state_dict()
    for idx in osd["param_groups"][0]["params"]:
        np.testing.assert_array_equal(
            got["state"][idx]["exp_avg"].numpy(),
            osd["state"][idx]["exp_avg"].numpy())


@pytest.mark.slow
def test_export_tool_roundtrip(tmp_path, encoder, ref_model, converted):
    """Full tool path: framework msgpack checkpoint → tools/export_torch.py
    → torch.load → reference-style resume (load_state_dict + optimizer
    load + epoch/histories), then converting BACK through convert_torch
    reproduces the framework trees."""
    import optax
    from flax import serialization

    from situation_recognition_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint)

    bparams, bstats, head = converted
    opt = _torch_adamax_after_steps(ref_model)
    mu, nu, count = torch_convert.convert_adamax_state(
        opt.state_dict(), list(ref_model.state_dict()))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamax(0.002))
    template = serialization.to_state_dict(tx.init(head))
    opt_state = torch_convert.fill_adamax_opt_state(template, mu, nu, count)

    src = str(tmp_path / "model_tpu")
    dst = str(tmp_path / "model_torch.pth")
    save_checkpoint(src, {
        "epoch": 12,
        "avg_scores": [1.5, 2.5], "verb_losses": [3.5],
        "nouns_losses": [4.5], "val_avg_scores": [5.5],
        "val_verb_losses": [6.5], "val_nouns_losses": [7.5],
        "head_params": head, "backbone_params": bparams,
        "backbone_stats": bstats, "opt_state": opt_state,
    })

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_torch.py"),
         "checkpoint", src, dst],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "epoch 12" in r.stdout

    raw = torch.load(dst, map_location="cpu", weights_only=True)
    assert raw["epoch"] == 12
    assert raw["avg_scores"] == [1.5, 2.5]
    assert raw["val_nouns_losses"] == [7.5]

    # the reference resume path: load_state_dict + optimizer restore
    torch.manual_seed(4)
    model = RefFCGGNN(encoder, d=D)
    model.load_state_dict(raw["model_state_dict"], strict=True)
    fresh_opt = torch.optim.Adamax(
        [p for p in model.parameters() if p.requires_grad], lr=0.002)
    fresh_opt.load_state_dict(raw["optimizer_state_dict"])
    assert float(fresh_opt.state_dict()["state"][0]["step"]) == 3.0

    # converting the export BACK reproduces the framework trees exactly
    sd = torch_convert.state_dict_numpy(raw["model_state_dict"])
    b2, s2, h2 = torch_convert.convert_reference_checkpoint(sd)
    ck = load_checkpoint(src)
    for orig, back in ((ck["head_params"], h2),
                       (ck["backbone_params"], b2),
                       (ck["backbone_stats"], s2)):
        flat_o = _flatten(orig)
        flat_b = _flatten(back)
        assert set(flat_o) == set(flat_b)
        for k in flat_o:
            np.testing.assert_array_equal(flat_o[k], flat_b[k], err_msg=k)


def test_export_checkpoint_dict_shape(converted):
    bparams, bstats, head = converted
    out = export_reference_checkpoint({
        "epoch": 3, "avg_scores": [1.0], "verb_losses": [],
        "nouns_losses": [], "val_avg_scores": [], "val_verb_losses": [],
        "val_nouns_losses": [], "head_params": head,
        "backbone_params": bparams, "backbone_stats": bstats,
        "opt_state": None,
    })
    assert out["epoch"] == 3
    assert out["avg_scores"] == [1.0]
    assert "optimizer_state_dict" not in out
    assert "role_emb.weight" in out["model_state_dict"]


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = np.asarray(v)
    return out


def test_export_vit_backbone_roundtrip_exact(encoder):
    """torchvision-layout ViT: convert_vit -> export_vit_state is the
    identity against the clean-room torchvision replica's state_dict."""
    from situation_recognition_tpu.utils.torch_export import export_vit_state
    from tests.test_vit import _make_torchvision_vit

    torch.manual_seed(11)
    tv = _make_torchvision_vit(patch=8, width=32, depth=2, heads=4, img=32)
    sd = {k: np.asarray(v.detach().numpy())
          for k, v in tv.state_dict().items()}
    params = torch_convert.convert_vit(sd, num_heads=4)
    back = export_vit_state(params)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)

    # CLIP-variant trees are rejected (import-only layout)
    clip_like = dict(params)
    clip_like["ln_pre"] = {"scale": np.ones(32), "bias": np.zeros(32)}
    with pytest.raises(ValueError, match="CLIP"):
        export_vit_state(clip_like)


@pytest.mark.slow
def test_export_backbone_tool_resnet_and_vit(tmp_path, converted):
    """tools/export_torch.py backbone: msgpack -> torchvision .pth for
    both backbone families, values matching the source trees exactly."""
    from flax import serialization

    from situation_recognition_tpu.utils.torch_export import (
        export_resnet_state, export_vit_state)
    from tests.test_vit import _make_torchvision_vit

    bparams, bstats, _ = converted
    src_r = str(tmp_path / "bb_resnet.msgpack")
    with open(src_r, "wb") as f:
        f.write(serialization.msgpack_serialize(
            {"params": bparams, "batch_stats": bstats}))

    torch.manual_seed(13)
    tv = _make_torchvision_vit(patch=8, width=32, depth=1, heads=4, img=32)
    vit_params = torch_convert.convert_vit(
        {k: np.asarray(v.detach().numpy())
         for k, v in tv.state_dict().items()}, num_heads=4)
    src_v = str(tmp_path / "bb_vit.msgpack")
    with open(src_v, "wb") as f:
        f.write(serialization.msgpack_serialize(
            {"params": vit_params, "batch_stats": {}}))

    for src, dst, oracle in (
            (src_r, str(tmp_path / "bb_resnet.pth"),
             export_resnet_state(bparams, bstats)),
            (src_v, str(tmp_path / "bb_vit.pth"),
             export_vit_state(vit_params))):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "export_torch.py"),
             "backbone", src, dst],
            capture_output=True, text=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"})
        assert r.returncode == 0, r.stderr[-2000:]
        assert "torchvision-layout backbone" in r.stdout
        got = torch.load(dst, map_location="cpu", weights_only=True)
        assert set(got) == set(oracle)
        for k in oracle:
            np.testing.assert_array_equal(got[k].numpy(),
                                          np.asarray(oracle[k]), err_msg=k)
