"""JAX → torch checkpoint export (the reverse of ``torch_convert``).

Turns this framework's checkpoint state back into a checkpoint the
REFERENCE implementation can consume (``/root/reference/sr.py:478-505``
resume path and ``sr.py:24-41`` in-train restore): a ``model_state_dict``
with the reference's exact key names and registration order
(``/root/reference/model.py:89-111`` — role_emb, verb_emb,
convnet_verbs.model.*, convnet_nouns.model.*, ggsnn.{W,U}_{p,z,r,h}.*,
{verb,nouns}_classifier.1.*), an ``optimizer_state_dict`` in
``torch.optim.Adamax`` layout (per-index ``exp_avg``/``exp_inf``/``step``,
``/root/reference/sr.py:472-473``), and the epoch + six history lists
(``sr.py:145-162``).

This closes the migration loop in BOTH directions: reference users can
bring their torch checkpoints here (``torch_convert``), train on TPU, and
take the result back to the reference stack (or any torch tooling) without
retraining.

Layout transforms (exact inverses of ``torch_convert``):
* conv kernel  flax (kH, kW, I, O) → torch (O, I, kH, kW)
* linear kernel flax (I, O)        → torch (O, I)
* BatchNorm scale/bias → weight/bias; mean/var → running_mean/running_var;
  ``num_batches_tracked`` (which this framework does not keep — optax/EMA
  BN needs no counter) is emitted as int64 0 so torch ``load_state_dict``
  is satisfied in strict mode.

The shared backbone is written to BOTH ``convnet_verbs`` and
``convnet_nouns`` — the reference's twins are frozen identical copies
(``model.py:100-101``); only their BN running stats ever diverge in a real
reference run (DIVERGENCES #16), and on export both twins receive the
shared stat tree.

Everything here is numpy-only (like ``torch_convert``); actual
``torch.save`` serialization lives in ``tools/export_torch.py``.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from situation_recognition_tpu.utils.torch_convert import _GGSNN_NAMES


def _conv_back(k: np.ndarray) -> np.ndarray:
    """flax (kH, kW, I, O) → torch (O, I, kH, kW)."""
    return np.transpose(np.asarray(k), (3, 2, 0, 1))


def _linear_back(k: np.ndarray) -> np.ndarray:
    """flax (I, O) → torch (O, I)."""
    return np.transpose(np.asarray(k), (1, 0))


def _f32(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def export_resnet_state(params: Mapping, stats: Mapping,
                        prefix: str = "") -> Dict[str, np.ndarray]:
    """flax (params, batch_stats) trees of ``models/resnet.py`` →
    torchvision ResNet ``state_dict`` (numpy values), keys in torch's
    registration order so an exported ``model_state_dict`` zips onto
    optimizer param indices exactly like a native torch save."""
    out: Dict[str, np.ndarray] = {}

    def bn(dst: str, p: Mapping, s: Mapping) -> None:
        out[dst + ".weight"] = _f32(p["scale"])
        out[dst + ".bias"] = _f32(p["bias"])
        out[dst + ".running_mean"] = _f32(s["mean"])
        out[dst + ".running_var"] = _f32(s["var"])
        out[dst + ".num_batches_tracked"] = np.asarray(0, np.int64)

    out[prefix + "conv1.weight"] = _conv_back(params["conv1"]["kernel"])
    bn(prefix + "bn1", params["bn1"], stats["bn1"])

    blocks = sorted(
        (tuple(int(x) for x in k[len("layer"):].split("_")), k)
        for k in params if k.startswith("layer"))
    if not blocks:
        raise ValueError("no ResNet layers in the params tree "
                         "(not a models/resnet.py backbone?)")
    for (stage, block), key in blocks:
        bp, bs = params[key], stats[key]
        dst = f"{prefix}layer{stage}.{block}"
        convs = (1, 2, 3) if "conv3" in bp else (1, 2)
        for c in convs:
            out[f"{dst}.conv{c}.weight"] = _conv_back(bp[f"conv{c}"]["kernel"])
            bn(f"{dst}.bn{c}", bp[f"bn{c}"], bs[f"bn{c}"])
        if "downsample_conv" in bp:
            out[f"{dst}.downsample.0.weight"] = _conv_back(
                bp["downsample_conv"]["kernel"])
            bn(f"{dst}.downsample.1", bp["downsample_bn"],
               bs["downsample_bn"])
    return out


def export_vit_state(params: Mapping) -> Dict[str, np.ndarray]:
    """flax params tree of ``models/vit.py:ViT`` → torchvision
    VisionTransformer ``state_dict`` (numpy values) — the inverse of
    ``torch_convert.convert_vit`` (modern ``mlp.linear_{1,2}`` spelling).

    The export is the BACKBONE state (fc-less, like the reference's
    Identity-fc ResNet); torchvision's classifier ``heads.*`` keys are
    absent, so consumers load with ``strict=False`` (or into a headless
    module).  CLIP-variant trees (``ln_pre`` present) are rejected —
    CLIP's visual-tower layout is an import-only format here."""
    if "ln_pre" in params:
        raise ValueError("CLIP-variant ViT trees have no torchvision "
                         "equivalent; export supports the torchvision "
                         "layout only")
    out: Dict[str, np.ndarray] = {}
    out["class_token"] = _f32(params["cls_token"])
    out["conv_proj.weight"] = _conv_back(params["patch_embed"]["kernel"])
    out["conv_proj.bias"] = _f32(params["patch_embed"]["bias"])
    out["encoder.pos_embedding"] = _f32(params["pos_embed"])

    blocks = sorted((int(k[len("block"):]), k)
                    for k in params if k.startswith("block"))
    if not blocks:
        raise ValueError("no encoder blocks in the params tree "
                         "(not a models/vit.py backbone?)")
    D = int(np.asarray(params["cls_token"]).shape[-1])
    for i, key in blocks:
        blk = params[key]
        dst = f"encoder.layers.encoder_layer_{i}"
        for ours, theirs in (("ln1", "ln_1"), ("ln2", "ln_2")):
            out[f"{dst}.{theirs}.weight"] = _f32(blk[ours]["scale"])
            out[f"{dst}.{theirs}.bias"] = _f32(blk[ours]["bias"])
        attn = blk["attn"]
        # flax DenseGeneral kernels (D, H, Dh) pack back into torch's
        # (3D, D) in_proj rows (q, k, v stacked; y = x @ W.T)
        out[f"{dst}.self_attention.in_proj_weight"] = np.concatenate(
            [_linear_back(np.asarray(attn[n]["kernel"]).reshape(D, D))
             for n in ("query", "key", "value")], axis=0)
        out[f"{dst}.self_attention.in_proj_bias"] = np.concatenate(
            [_f32(attn[n]["bias"]).reshape(D)
             for n in ("query", "key", "value")], axis=0)
        out[f"{dst}.self_attention.out_proj.weight"] = _linear_back(
            np.asarray(attn["out"]["kernel"]).reshape(D, D))
        out[f"{dst}.self_attention.out_proj.bias"] = _f32(
            attn["out"]["bias"])
        out[f"{dst}.mlp.linear_1.weight"] = _linear_back(
            blk["mlp"]["fc1"]["kernel"])
        out[f"{dst}.mlp.linear_1.bias"] = _f32(blk["mlp"]["fc1"]["bias"])
        out[f"{dst}.mlp.linear_2.weight"] = _linear_back(
            blk["mlp"]["fc2"]["kernel"])
        out[f"{dst}.mlp.linear_2.bias"] = _f32(blk["mlp"]["fc2"]["bias"])

    out["encoder.ln.weight"] = _f32(params["ln_final"]["scale"])
    out["encoder.ln.bias"] = _f32(params["ln_final"]["bias"])
    return out


def export_reference_state_dict(
    backbone_params: Mapping, backbone_stats: Mapping,
    head_params: Mapping,
) -> Dict[str, np.ndarray]:
    """(backbone_params, backbone_stats, head_params) → the reference
    ``model_state_dict`` (numpy values), keys in the reference FCGGNN's
    registration order (``/root/reference/model.py:89-111``)."""
    out: Dict[str, np.ndarray] = {}
    out["role_emb.weight"] = _f32(head_params["role_emb"])
    out["verb_emb.weight"] = _f32(head_params["verb_emb"])
    # the reference's two convnets are frozen identical copies
    # (model.py:100-101); both receive the shared backbone + stat tree
    for twin in ("convnet_verbs", "convnet_nouns"):
        out.update(export_resnet_state(
            backbone_params, backbone_stats, prefix=f"{twin}.model."))
    g = head_params["ggnn"]
    for ours, theirs in _GGSNN_NAMES:
        out[f"ggsnn.{theirs}.weight"] = _linear_back(g[ours])
        out[f"ggsnn.{theirs}.bias"] = _f32(g["b_" + ours])
    for name in ("verb_classifier", "nouns_classifier"):
        # reference classifiers are Sequential(Dropout, Linear) → index 1
        out[f"{name}.1.weight"] = _linear_back(head_params[name]["kernel"])
        out[f"{name}.1.bias"] = _f32(head_params[name]["bias"])
    return out


# reference trainable params in registration order = torch optimizer param
# indices (sr.py:472-473 builds Adamax over filter(requires_grad), which
# preserves registration order; the two frozen convnets contribute nothing)
def _trainable_order():
    order = [("role_emb.weight", ("role_emb",), False),
             ("verb_emb.weight", ("verb_emb",), False)]
    for ours, theirs in _GGSNN_NAMES:
        order.append((f"ggsnn.{theirs}.weight", ("ggnn", ours), True))
        order.append((f"ggsnn.{theirs}.bias", ("ggnn", "b_" + ours), False))
    for name in ("verb_classifier", "nouns_classifier"):
        order.append((f"{name}.1.weight", (name, "kernel"), True))
        order.append((f"{name}.1.bias", (name, "bias"), False))
    return order


def _find_adamax_node(opt_state_dict: Mapping) -> Mapping:
    """Locate the single {count, mu, nu} node in a ``to_state_dict``
    snapshot of the optax chain (same search ``fill_adamax_opt_state``
    uses, so the chain nesting stays an optax implementation detail)."""
    hits = []

    def visit(node):
        if isinstance(node, Mapping):
            if {"count", "mu", "nu"} <= set(node):
                hits.append(node)
            else:
                for v in node.values():
                    visit(v)

    visit(opt_state_dict)
    if len(hits) != 1:
        raise ValueError(
            f"expected exactly one adamax state node, found {len(hits)}")
    return hits[0]


def _tree_get(tree: Mapping, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def export_adamax_state(opt_state_dict: Mapping, lr: float = 0.002) -> dict:
    """optax chain state snapshot (``flax.serialization.to_state_dict`` of
    clip_by_global_norm + adamax, as saved by ``Trainer.model_state_dict``)
    → ``torch.optim.Adamax.state_dict()`` layout (numpy values).

    optax's ``mu``/``nu``/``count`` are the identical quantities torch
    Adamax calls ``exp_avg``/``exp_inf``/``step`` (trajectory equality is
    asserted by tests/test_train.py::test_optax_adamax_matches_torch), so
    the reference can resume the exact optimizer trajectory.  Hyperparams
    mirror the reference's construction (``sr.py:472-473``: lr only, torch
    defaults for the rest)."""
    node = _find_adamax_node(opt_state_dict)
    mu, nu = node["mu"], node["nu"]
    step = int(np.asarray(node["count"]))

    state: Dict[int, dict] = {}
    order = _trainable_order()
    for idx, (_, path, transpose) in enumerate(order):
        t = _linear_back if transpose else _f32
        state[idx] = {
            "step": np.asarray(float(step), np.float32),
            "exp_avg": t(_tree_get(mu, path)),
            "exp_inf": t(_tree_get(nu, path)),
        }
    return {
        "state": state,
        "param_groups": [{
            "lr": float(lr), "betas": (0.9, 0.999), "eps": 1e-8,
            "weight_decay": 0, "foreach": None, "maximize": False,
            "differentiable": False, "capturable": False,
            "params": list(range(len(order))),
        }],
    }


def export_reference_checkpoint(ckpt: Mapping, lr: float = 0.002) -> dict:
    """A loaded framework checkpoint (``utils.checkpoint.load_checkpoint``:
    epoch, six history lists, head/backbone params + stats, opt_state) →
    the reference checkpoint dict (``sr.py:145-162``), numpy values."""
    from situation_recognition_tpu.utils.checkpoint import (
        HISTORY_KEYS, history_list)

    out: dict = {"epoch": int(ckpt["epoch"])}
    for k in HISTORY_KEYS:
        out[k] = history_list(ckpt.get(k, []))
    out["model_state_dict"] = export_reference_state_dict(
        ckpt["backbone_params"], ckpt["backbone_stats"],
        ckpt["head_params"])
    if ckpt.get("opt_state") is not None:
        out["optimizer_state_dict"] = export_adamax_state(
            ckpt["opt_state"], lr=lr)
    return out
