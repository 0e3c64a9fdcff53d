"""torch → JAX weight conversion.

Converts (a) torchvision-style ResNet ``state_dict``s to the flax parameter /
batch-stats trees of ``models/resnet.py``, and (b) full reference checkpoints
(``/root/reference/sr.py:145-162``: ``{'model_state_dict': ...}`` with
``convnet_{verbs,nouns}.model.*``, ``role_emb``, ``verb_emb``, ``ggsnn.*``,
``{verb,nouns}_classifier.1.*`` keys) to this framework's
``(backbone_params, head_params)`` trees.

Layout transforms:
* conv weight  torch (O, I, kH, kW) → flax (kH, kW, I, O)
* linear weight torch (O, I)        → flax kernel (I, O)
* BatchNorm: weight/bias → scale/bias (params); running_mean/var → mean/var
  (batch_stats)

Everything operates on mappings of numpy arrays; ``torch.load`` is only
touched in ``load_torch_file`` so the converter stays usable without torch.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Tuple

import numpy as np


def load_torch_pickle(path: str):
    """torch.load with code execution disabled (weights_only).  Reference
    checkpoints contain only tensors, ints and float lists (sr.py:145-162),
    which weights_only handles; a legacy file that genuinely needs full
    unpickling fails loudly rather than silently executing pickle code."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=True)


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.pt file into a flat dict of numpy arrays."""
    obj = load_torch_pickle(path)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    return state_dict_numpy(obj)


def state_dict_numpy(mapping) -> Dict[str, np.ndarray]:
    """Flat torch mapping → {key: np.ndarray} (the single conversion
    expression shared by load_torch_file and the checkpoint-mode callers
    that also need the RAW checkpoint dict around it)."""
    return {k: np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)
            for k, v in mapping.items()}


def _put(tree: dict, path, leaf) -> None:
    """Insert leaf at a nested path, creating intermediate dicts."""
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = leaf


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def convert_resnet(
    state: Mapping[str, np.ndarray], prefix: str = ""
) -> Tuple[dict, dict]:
    """torchvision ResNet state_dict → (params, batch_stats) flax trees.

    ``prefix`` strips a leading path (e.g. ``"convnet_nouns.model."`` for the
    reference checkpoint layout, model.py:16).  ``fc.*`` keys are ignored —
    the reference replaces fc with Identity (model.py:31) and our backbone is
    fc-less.
    """
    params: dict = {}
    stats: dict = {}
    put = _put

    def bn(dst_path, src):
        put(params, dst_path + ("scale",), state[src + ".weight"])
        put(params, dst_path + ("bias",), state[src + ".bias"])
        put(stats, dst_path + ("mean",), state[src + ".running_mean"])
        put(stats, dst_path + ("var",), state[src + ".running_var"])

    p = prefix
    put(params, ("conv1", "kernel"), _conv(state[p + "conv1.weight"]))
    bn(("bn1",), p + "bn1")

    layer_re = re.compile(re.escape(p) + r"layer(\d+)\.(\d+)\.conv1\.weight$")
    blocks = sorted(
        {(int(m.group(1)), int(m.group(2)))
         for k in state if (m := layer_re.match(k))})
    if not blocks:
        raise ValueError(f"no ResNet layers found under prefix {prefix!r}")
    first = f"{p}layer{blocks[0][0]}.{blocks[0][1]}"
    # Bottleneck blocks (50/101/152) carry conv1..3; BasicBlock (18/34)
    # carries conv1..2 — both map onto models/resnet.py (basic=True for
    # the latter)
    convs = (1, 2, 3) if f"{first}.conv3.weight" in state else (1, 2)

    for stage, block in blocks:
        src = f"{p}layer{stage}.{block}"
        dst = f"layer{stage}_{block}"
        for c in convs:
            put(params, (dst, f"conv{c}", "kernel"),
                _conv(state[f"{src}.conv{c}.weight"]))
            bn((dst, f"bn{c}"), f"{src}.bn{c}")
        if f"{src}.downsample.0.weight" in state:
            put(params, (dst, "downsample_conv", "kernel"),
                _conv(state[f"{src}.downsample.0.weight"]))
            bn((dst, "downsample_bn"), f"{src}.downsample.1")

    return params, stats


def interpolate_pos_embed(pos: np.ndarray, target_tokens: int) -> np.ndarray:
    """Adapt a ViT position embedding ``(1, N_src, D)`` to a different
    patch-grid size → ``(1, target_tokens, D)``.

    The standard checkpoint-adaptation recipe for running a pretrained ViT
    at another resolution (e.g. a 224-grid CLIP ViT-L/14 at 336): the CLS
    row is kept verbatim and the square patch grid is resampled with
    bicubic interpolation (``jax.image.resize('cubic')``, Catmull-Rom).
    There is no reference behavior to match here (the reference is
    224-only, ``/root/reference/utils/imsitu_encoder.py:21-36``), so the
    Keys-kernel a = −0.5 vs torch ``F.interpolate``'s a = −0.75 difference
    is a non-goal; identical grids return the input bit-exactly with no
    resampling."""
    pos = np.asarray(pos)
    if pos.ndim != 3 or pos.shape[0] != 1:
        raise ValueError(f"pos_embed must be (1, N, D), got {pos.shape}")
    n_src = pos.shape[1]
    if target_tokens == n_src:
        return pos
    g_src = int(round((n_src - 1) ** 0.5))
    g_tgt = int(round((target_tokens - 1) ** 0.5))
    if g_src * g_src + 1 != n_src or g_tgt * g_tgt + 1 != target_tokens:
        raise ValueError(
            f"pos_embed grids must be square+CLS: {n_src} -> "
            f"{target_tokens} tokens do not factor as g*g+1")
    import jax

    cls_row = pos[:, :1]
    grid = pos[0, 1:].reshape(g_src, g_src, pos.shape[-1]).astype(np.float32)
    resized = np.asarray(jax.image.resize(
        grid, (g_tgt, g_tgt, grid.shape[-1]), method="cubic"))
    return np.concatenate(
        [cls_row.astype(np.float32),
         resized.reshape(1, g_tgt * g_tgt, -1)], axis=1)


def _vit_target_tokens(patch_kernel: np.ndarray, image_size: int) -> int:
    """Token count a (kH, kW, I, O)-converted patch conv produces at
    ``image_size`` (+1 CLS), validating divisibility."""
    p = int(np.asarray(patch_kernel).shape[0])
    if image_size % p:
        raise ValueError(
            f"image_size {image_size} not divisible by patch {p}")
    return (image_size // p) ** 2 + 1


def convert_vit(state: Mapping[str, np.ndarray],
                num_heads: int, image_size: int | None = None) -> dict:
    """torchvision VisionTransformer ``state_dict`` → params tree of
    ``models/vit.py:ViT``.

    Layout handled (torchvision ``vision_transformer.py``): ``class_token``,
    ``conv_proj.*``, ``encoder.pos_embedding``,
    ``encoder.layers.encoder_layer_{i}.{ln_1,self_attention,ln_2,mlp}``,
    ``encoder.ln`` — with both MLP key spellings torchvision has shipped
    (``mlp.linear_{1,2}`` and the Sequential ``mlp.{0,3}``).  ``heads.*``
    (the classification head) is ignored: the backbone contract is pooled
    CLS features (like the reference's fc-less ResNet, model.py:31).

    Attention packing: torch ``in_proj_weight`` is (3D, D) packed q/k/v
    rows with ``y = x @ W.T``; flax ``MultiHeadDotProductAttention`` keeps
    per-projection DenseGeneral kernels (D, H, Dh) with bias (H, Dh), and
    an out kernel (H, Dh, D).

    ``image_size``: adapt the checkpoint to another input resolution by
    bicubic pos-embed interpolation (:func:`interpolate_pos_embed`);
    ``None`` keeps the checkpoint's grid.
    """
    params: dict = {}

    def _get(*names):
        for n in names:
            if n in state:
                return np.asarray(state[n])
        raise KeyError(f"none of {names} in state dict")

    D = int(np.asarray(state["class_token"]).shape[-1])
    if D % num_heads:
        raise ValueError(f"width {D} not divisible by {num_heads} heads")
    Dh = D // num_heads

    params["cls_token"] = np.asarray(state["class_token"])
    params["patch_embed"] = {
        "kernel": _conv(np.asarray(state["conv_proj.weight"])),
        "bias": np.asarray(state["conv_proj.bias"]),
    }
    pos = np.asarray(state["encoder.pos_embedding"])
    if image_size is not None:
        # run the pretrained grid at another resolution (``image_size``)
        pos = interpolate_pos_embed(pos, _vit_target_tokens(
            params["patch_embed"]["kernel"], image_size))
    params["pos_embed"] = pos
    params["ln_final"] = {"scale": _get("encoder.ln.weight"),
                          "bias": _get("encoder.ln.bias")}

    layer_re = re.compile(r"encoder\.layers\.encoder_layer_(\d+)\.ln_1\.weight$")
    layers = sorted(int(m.group(1)) for k in state if (m := layer_re.match(k)))
    if not layers:
        raise ValueError("no encoder layers found (not a torchvision ViT?)")

    for i in layers:
        src = f"encoder.layers.encoder_layer_{i}"
        blk: dict = {}
        blk["ln1"] = {"scale": _get(f"{src}.ln_1.weight"),
                      "bias": _get(f"{src}.ln_1.bias")}
        blk["ln2"] = {"scale": _get(f"{src}.ln_2.weight"),
                      "bias": _get(f"{src}.ln_2.bias")}
        w = _get(f"{src}.self_attention.in_proj_weight")      # (3D, D)
        b = _get(f"{src}.self_attention.in_proj_bias")        # (3D,)
        attn: dict = {}
        for j, name in enumerate(("query", "key", "value")):
            wj = w[j * D:(j + 1) * D]                          # (D, D)
            attn[name] = {
                "kernel": _linear(wj).reshape(D, num_heads, Dh),
                "bias": b[j * D:(j + 1) * D].reshape(num_heads, Dh),
            }
        wo = _get(f"{src}.self_attention.out_proj.weight")     # (D, D)
        attn["out"] = {
            "kernel": _linear(wo).reshape(num_heads, Dh, D),
            "bias": _get(f"{src}.self_attention.out_proj.bias"),
        }
        blk["attn"] = attn
        blk["mlp"] = {
            "fc1": {"kernel": _linear(_get(f"{src}.mlp.linear_1.weight",
                                           f"{src}.mlp.0.weight")),
                    "bias": _get(f"{src}.mlp.linear_1.bias",
                                 f"{src}.mlp.0.bias")},
            "fc2": {"kernel": _linear(_get(f"{src}.mlp.linear_2.weight",
                                           f"{src}.mlp.3.weight")),
                    "bias": _get(f"{src}.mlp.linear_2.bias",
                                 f"{src}.mlp.3.bias")},
        }
        params[f"block{i}"] = blk

    return params


def convert_clip_vit(state: Mapping[str, np.ndarray],
                     num_heads: int, image_size: int | None = None) -> dict:
    """CLIP visual-tower ``state_dict`` → params tree of ``models/vit.py:ViT``
    built with ``clip_variant=True`` (ln_pre, bias-free patch conv,
    QuickGELU — see models/vit.py).

    Accepts keys with or without the ``visual.`` prefix (a full CLIP
    checkpoint vs an extracted visual tower).  The final ``proj`` matrix
    (CLS → shared embedding space) is NOT applied: the backbone contract
    is the 1024-d (L/14) ``ln_post`` CLS features, matching the head
    hidden width.
    """
    pre = "visual." if any(k.startswith("visual.") for k in state) else ""

    def g(name):
        return np.asarray(state[pre + name])

    D = int(g("class_embedding").shape[-1])
    if D % num_heads:
        raise ValueError(f"width {D} not divisible by {num_heads} heads")
    Dh = D // num_heads

    patch_kernel = _conv(g("conv1.weight"))
    pos = g("positional_embedding")[None]
    if image_size is not None:
        # e.g. the published 224-grid CLIP ViT-L/14 served at 336
        pos = interpolate_pos_embed(
            pos, _vit_target_tokens(patch_kernel, image_size))
    params: dict = {
        # CLIP keeps (D,) / (N, D); our module uses (1, 1, D) / (1, N, D)
        "cls_token": g("class_embedding").reshape(1, 1, D),
        "pos_embed": pos,
        "patch_embed": {"kernel": patch_kernel},               # no bias
        "ln_pre": {"scale": g("ln_pre.weight"), "bias": g("ln_pre.bias")},
        "ln_final": {"scale": g("ln_post.weight"), "bias": g("ln_post.bias")},
    }

    layer_re = re.compile(re.escape(pre)
                          + r"transformer\.resblocks\.(\d+)\.ln_1\.weight$")
    layers = sorted(int(m.group(1)) for k in state if (m := layer_re.match(k)))
    if not layers:
        raise ValueError("no resblocks found (not a CLIP visual tower?)")

    for i in layers:
        src = f"transformer.resblocks.{i}"
        w = g(f"{src}.attn.in_proj_weight")
        b = g(f"{src}.attn.in_proj_bias")
        attn: dict = {}
        for j, name in enumerate(("query", "key", "value")):
            attn[name] = {
                "kernel": _linear(w[j * D:(j + 1) * D]).reshape(D, num_heads, Dh),
                "bias": b[j * D:(j + 1) * D].reshape(num_heads, Dh),
            }
        attn["out"] = {
            "kernel": _linear(g(f"{src}.attn.out_proj.weight")
                              ).reshape(num_heads, Dh, D),
            "bias": g(f"{src}.attn.out_proj.bias"),
        }
        params[f"block{i}"] = {
            "ln1": {"scale": g(f"{src}.ln_1.weight"),
                    "bias": g(f"{src}.ln_1.bias")},
            "ln2": {"scale": g(f"{src}.ln_2.weight"),
                    "bias": g(f"{src}.ln_2.bias")},
            "attn": attn,
            "mlp": {
                "fc1": {"kernel": _linear(g(f"{src}.mlp.c_fc.weight")),
                        "bias": g(f"{src}.mlp.c_fc.bias")},
                "fc2": {"kernel": _linear(g(f"{src}.mlp.c_proj.weight")),
                        "bias": g(f"{src}.mlp.c_proj.bias")},
            },
        }

    return params


_GGSNN_NAMES = [
    ("w_p", "W_p"), ("w_z", "W_z"), ("u_z", "U_z"),
    ("w_r", "W_r"), ("u_r", "U_r"), ("w_h", "W_h"), ("u_h", "U_h"),
]


def _head_param_map() -> Dict[str, Tuple[tuple, bool]]:
    """reference trainable-param name → (head_params tree path, transpose?)."""
    m = {
        "role_emb.weight": (("role_emb",), False),
        "verb_emb.weight": (("verb_emb",), False),
        "verb_classifier.1.weight": (("verb_classifier", "kernel"), True),
        "verb_classifier.1.bias": (("verb_classifier", "bias"), False),
        "nouns_classifier.1.weight": (("nouns_classifier", "kernel"), True),
        "nouns_classifier.1.bias": (("nouns_classifier", "bias"), False),
    }
    for ours, theirs in _GGSNN_NAMES:
        m[f"ggsnn.{theirs}.weight"] = (("ggnn", ours), True)
        m[f"ggsnn.{theirs}.bias"] = (("ggnn", "b_" + ours), False)
    return m


def convert_adamax_state(
    optimizer_state: Mapping, model_state_keys
) -> Tuple[dict, dict, int]:
    """torch.optim.Adamax ``state_dict`` → (mu_tree, nu_tree, count) shaped
    like our head_params.

    torch Adamax keeps per-param ``exp_avg`` (first moment) and ``exp_inf``
    (infinity-norm moment) plus a shared ``step`` counter; optax's adamax
    keeps the identical quantities as ``mu``/``nu``/``count`` (trajectory
    equality is asserted by tests/test_train.py::test_optax_adamax_matches_torch),
    so resuming a torch checkpoint can continue the exact optimizer
    trajectory instead of restarting it.

    The reference builds the optimizer over
    ``filter(requires_grad, model.parameters())`` (sr.py:472-473) — i.e. the
    registration-ordered trainable params with the two frozen convnets
    excluded.  ``model_state_dict`` keys preserve registration order, so the
    torch param indices map onto the non-convnet keys in order.
    """
    trainable = [k for k in model_state_keys
                 if not k.startswith(("convnet_verbs.", "convnet_nouns."))]
    indices = list(optimizer_state["param_groups"][0]["params"])
    if len(indices) != len(trainable):
        raise ValueError(
            f"optimizer has {len(indices)} params but the checkpoint has "
            f"{len(trainable)} trainable tensors: {trainable}")
    pstate = optimizer_state["state"]
    path_map = _head_param_map()
    put = _put

    mu: dict = {}
    nu: dict = {}
    count = 0
    for idx, name in zip(indices, trainable):
        s = pstate[idx] if idx in pstate else pstate[str(idx)]
        path, transpose = path_map[name]
        t = _linear if transpose else (lambda a: a)

        def arr(v):
            return np.asarray(v.detach().cpu().numpy()
                              if hasattr(v, "detach") else v, np.float32)

        put(mu, path, t(arr(s["exp_avg"])))
        put(nu, path, t(arr(s["exp_inf"])))
        count = max(count, int(np.asarray(
            s["step"].item() if hasattr(s["step"], "item") else s["step"])))
    return mu, nu, count


def fill_adamax_opt_state(template_state_dict: dict, mu: dict, nu: dict,
                          count: int) -> dict:
    """Graft converted (mu, nu, count) into a ``to_state_dict`` snapshot of
    our optax chain state (clip_by_global_norm + adamax).  Searches the
    serialized tree for the node carrying {count, mu, nu} so the exact chain
    nesting stays an optax implementation detail.

    The copy is structural only (dicts re-created, array leaves shared) —
    a deepcopy would duplicate the template's ~320 MB of mu/nu arrays just
    to throw them away."""

    def copy_tree(t):
        return ({k: copy_tree(v) for k, v in t.items()}
                if isinstance(t, dict) else t)

    out = copy_tree(template_state_dict)
    hits = []

    def visit(node):
        if isinstance(node, dict):
            if {"count", "mu", "nu"} <= set(node):
                hits.append(node)
            else:
                for v in node.values():
                    visit(v)

    visit(out)
    if len(hits) != 1:
        raise ValueError(
            f"expected exactly one adamax state node, found {len(hits)}")
    hits[0]["count"] = np.asarray(count, np.int32)
    hits[0]["mu"] = mu
    hits[0]["nu"] = nu
    return out


def convert_reference_checkpoint(
    state: Mapping[str, np.ndarray],
    check_backbones_equal: bool = True,
) -> Tuple[dict, dict, dict]:
    """Full reference FCGGNN checkpoint → (backbone_params, backbone_stats,
    head_params).

    The backbone comes from ``convnet_nouns`` (the reference's two convnets
    are frozen identical copies, model.py:100-101).  ``check_backbones_equal``
    verifies the twin WEIGHTS match and raises on divergence — frozen params
    cannot legitimately differ, so a mismatch means the checkpoint is not a
    reference-shaped one.  BN RUNNING STATS (and num_batches_tracked) are
    exempt: in any genuinely trained reference checkpoint they NECESSARILY
    diverge, because model.train() keeps both frozen convnets in train-mode
    BN and each step EMA-updates convnet_verbs once (predict_verb) but
    convnet_nouns twice (both predict_nouns branches, model.py:171-180).
    The conversion adopts convnet_nouns' stats for the shared backbone —
    the noun branches carry 2 of the 3 losses (DIVERGENCES #16).
    """
    if check_backbones_equal:
        for k in state:
            if k.startswith("convnet_nouns."):
                twin = "convnet_verbs." + k[len("convnet_nouns."):]
                if twin in state and not np.array_equal(state[k], state[twin]):
                    if ("num_batches_tracked" in k or "running_mean" in k
                            or "running_var" in k):
                        continue
                    raise ValueError(
                        f"backbone copies diverge at {k}; cannot share backbone")

    backbone_params, backbone_stats = convert_resnet(
        state, prefix="convnet_nouns.model.")

    g = {}
    for ours, theirs in _GGSNN_NAMES:
        g[ours] = _linear(state[f"ggsnn.{theirs}.weight"])
        g["b_" + ours] = state[f"ggsnn.{theirs}.bias"]

    head_params = {
        "role_emb": state["role_emb.weight"],
        "verb_emb": state["verb_emb.weight"],
        "ggnn": g,
        # reference classifiers are Sequential(Dropout, Linear) → index 1
        "verb_classifier": {
            "kernel": _linear(state["verb_classifier.1.weight"]),
            "bias": state["verb_classifier.1.bias"],
        },
        "nouns_classifier": {
            "kernel": _linear(state["nouns_classifier.1.weight"]),
            "bias": state["nouns_classifier.1.bias"],
        },
    }
    return backbone_params, backbone_stats, head_params
