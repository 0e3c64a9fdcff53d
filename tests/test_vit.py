"""ViT backbone tests: shapes, trainer integration, hidden-width contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from situation_recognition_tpu.models.vit import ViT, vit_tiny
from situation_recognition_tpu.train import Trainer, TrainerConfig, build_backbone


@pytest.mark.slow
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


@pytest.mark.slow
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


# -------------------------------------------------- pretrained converters


class _TvMLP(__import__("torch").nn.Module):
    """torchvision MLPBlock key layout (mlp.linear_1 / mlp.linear_2)."""

    def __init__(self, dim, hidden):
        import torch.nn as nn

        super().__init__()
        self.linear_1 = nn.Linear(dim, hidden)
        self.linear_2 = nn.Linear(hidden, dim)

    def forward(self, x):
        import torch.nn.functional as F

        return self.linear_2(F.gelu(self.linear_1(x)))


def _make_torchvision_vit(patch, width, depth, heads, img):
    """Clean-room torch replica of torchvision VisionTransformer with its
    exact state_dict key layout and op order (pre-LN, eps=1e-6, packed
    qkv nn.MultiheadAttention) — the differential oracle for convert_vit."""
    import collections

    import torch
    import torch.nn as nn

    n_tokens = (img // patch) ** 2 + 1

    class Layer(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = nn.LayerNorm(width, eps=1e-6)
            self.self_attention = nn.MultiheadAttention(
                width, heads, batch_first=True)
            self.ln_2 = nn.LayerNorm(width, eps=1e-6)
            self.mlp = _TvMLP(width, width * 4)

        def forward(self, x):
            y = self.ln_1(x)
            y, _ = self.self_attention(y, y, y, need_weights=False)
            x = x + y
            return x + self.mlp(self.ln_2(x))

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.pos_embedding = nn.Parameter(
                torch.randn(1, n_tokens, width) * 0.02)
            self.layers = nn.Sequential(collections.OrderedDict(
                (f"encoder_layer_{i}", Layer()) for i in range(depth)))
            self.ln = nn.LayerNorm(width, eps=1e-6)

        def forward(self, x):
            return self.ln(self.layers(x + self.pos_embedding))

    class TvViT(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_proj = nn.Conv2d(3, width, patch, stride=patch)
            self.class_token = nn.Parameter(torch.randn(1, 1, width) * 0.02)
            self.encoder = Encoder()

        def forward(self, x):                       # NCHW
            b = x.shape[0]
            x = self.conv_proj(x)                   # (B, D, H', W')
            x = x.reshape(b, width, -1).permute(0, 2, 1)
            x = torch.cat(
                [self.class_token.expand(b, -1, -1), x], dim=1)
            return self.encoder(x)[:, 0]

    return TvViT()


def _make_clip_visual(patch, width, depth, heads, img):
    """Clean-room CLIP visual tower (ln_pre, bias-free conv, QuickGELU,
    CLIP's key layout) — the oracle for convert_clip_vit."""
    import torch
    import torch.nn as nn

    n_tokens = (img // patch) ** 2 + 1

    class ClipMLP(nn.Module):
        def __init__(self):
            super().__init__()
            self.c_fc = nn.Linear(width, width * 4)
            self.c_proj = nn.Linear(width * 4, width)

        def forward(self, x):
            x = self.c_fc(x)
            return self.c_proj(x * torch.sigmoid(1.702 * x))

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = nn.LayerNorm(width)
            self.attn = nn.MultiheadAttention(width, heads, batch_first=True)
            self.ln_2 = nn.LayerNorm(width)
            self.mlp = ClipMLP()

        def forward(self, x):
            y = self.ln_1(x)
            y, _ = self.attn(y, y, y, need_weights=False)
            x = x + y
            return x + self.mlp(self.ln_2(x))

    class Transformer(nn.Module):
        def __init__(self):
            super().__init__()
            self.resblocks = nn.Sequential(*[Block() for _ in range(depth)])

        def forward(self, x):
            return self.resblocks(x)

    class Visual(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, width, patch, stride=patch, bias=False)
            self.class_embedding = nn.Parameter(torch.randn(width) * 0.02)
            self.positional_embedding = nn.Parameter(
                torch.randn(n_tokens, width) * 0.02)
            self.ln_pre = nn.LayerNorm(width)
            self.transformer = Transformer()
            self.ln_post = nn.LayerNorm(width)

        def forward(self, x):
            b = x.shape[0]
            x = self.conv1(x)
            x = x.reshape(b, width, -1).permute(0, 2, 1)
            x = torch.cat([self.class_embedding.expand(b, 1, -1), x], dim=1)
            x = x + self.positional_embedding
            x = self.ln_pre(x)
            x = self.transformer(x)
            return self.ln_post(x[:, 0])

    return Visual()


def test_convert_vit_features_match_torch():
    """convert_vit on a torchvision-layout checkpoint: features ≤1e-4 vs
    the torch oracle (fp32) — the VERDICT 'converted ViT features' bar."""
    import torch
    from flax import serialization

    from situation_recognition_tpu.utils.torch_convert import convert_vit

    patch, width, depth, heads, img = 16, 64, 2, 2, 64
    torch.manual_seed(0)
    tm = _make_torchvision_vit(patch, width, depth, heads, img)
    tm.eval()
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}

    m = ViT(patch=patch, width=width, depth=depth, heads=heads)
    template = m.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, img, img, 3)))["params"]
    params = serialization.from_state_dict(template, convert_vit(sd, heads))

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, img, img, 3)).astype(np.float32)
    got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_convert_vit_mlp_sequential_key_spelling():
    """The Sequential MLP spelling (mlp.0 / mlp.3) torchvision also ships
    must convert identically to the linear_1/linear_2 spelling."""
    import torch

    from situation_recognition_tpu.utils.torch_convert import convert_vit

    torch.manual_seed(1)
    tm = _make_torchvision_vit(16, 64, 1, 2, 64)
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    sd2 = {k.replace(".mlp.linear_1.", ".mlp.0.")
            .replace(".mlp.linear_2.", ".mlp.3."): v for k, v in sd.items()}
    a = convert_vit(sd, 2)
    b = convert_vit(sd2, 2)
    for pa, pb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(pa, pb)


def test_convert_clip_vit_features_match_torch():
    """convert_clip_vit + the clip_variant module (ln_pre, bias-free conv,
    QuickGELU): features ≤1e-4 vs the CLIP-layout torch oracle; the
    'visual.'-prefixed full-checkpoint spelling converts identically."""
    import torch
    from flax import serialization

    from situation_recognition_tpu.utils.torch_convert import convert_clip_vit

    patch, width, depth, heads, img = 16, 64, 2, 2, 64
    torch.manual_seed(2)
    tm = _make_clip_visual(patch, width, depth, heads, img)
    tm.eval()
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}

    m = ViT(patch=patch, width=width, depth=depth, heads=heads,
            clip_variant=True)
    template = m.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, img, img, 3)))["params"]
    assert "ln_pre" in template and "bias" not in template["patch_embed"]
    params = serialization.from_state_dict(template,
                                           convert_clip_vit(sd, heads))

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, img, img, 3)).astype(np.float32)
    got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    prefixed = {"visual." + k: v for k, v in sd.items()}
    for pa, pb in zip(jax.tree.leaves(convert_clip_vit(sd, heads)),
                      jax.tree.leaves(convert_clip_vit(prefixed, heads))):
        np.testing.assert_array_equal(pa, pb)
