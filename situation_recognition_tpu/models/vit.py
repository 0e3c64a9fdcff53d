"""Vision Transformer backbones (stretch config, BASELINE.json: "ViT-L/14
backbone swap feeding the same GGNN role graph").

Drop-in alternative to the ResNet feature extractor: ``__call__(x, train)``
returns pooled features (the CLS token), consumed by the same FCGGNN head.
The head's hidden size equals the backbone feature width (1024 for ViT-L),
mirroring how the reference ties D_hidden_state to its backbone's 2048-d
features (model.py:90-101).

TPU notes: seq len 257 (16x16 patches + CLS) at width 1024.  bf16
compute, fp32 params, LayerNorm in fp32 for stability.  On TPU at bf16
the encoder block runs through fused Pallas kernels (``block_impl="auto"``
→ ops/vit_pallas.py): XLA's layout assignment hands the 257-token
residual stream a token-major layout that collapses the MLP matmul
emitter to 8-lane tiles (8.4 ms for a 2.8 ms-at-peak matmul — measured,
see PERF.md), and no jnp-level reformulation recovers it.  The kernels
cut the block 18.3 -> 15.2 ms at the parity shape.  No flash/CP
machinery beyond that is warranted at N=257 (SURVEY §5g).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class MlpBlock(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.float32
    quick_gelu: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        if self.quick_gelu:
            # CLIP's QuickGELU: x * sigmoid(1.702 x) — converted CLIP
            # weights diverge per-layer under either true GELU variant
            x = x * nn.sigmoid(1.702 * x)
        else:
            # exact GELU (torch nn.GELU default) — flax's default is the
            # tanh approximation, which would diverge per-layer on
            # converted torchvision weights
            x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class EncoderBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32
    quick_gelu: bool = False
    # torchvision ViTs build their LayerNorms with eps=1e-6; CLIP keeps
    # torch's default 1e-5 — converted weights drift ~6e-3 under the wrong one
    ln_eps: float = 1e-6
    # auto | pallas | flax — auto resolves to the fused Pallas block
    # kernels on TPU at bf16 for supported widths (see ops/vit_pallas.py
    # for the measured XLA layout pathology they bypass: 18.3 ->
    # 15.2 ms/block at the ViT-L/14 parity shape); everywhere else the
    # plain flax composition runs.  `interpret` exercises the kernels on
    # CPU for tests.
    block_impl: str = "auto"
    interpret: bool = False

    def _use_pallas(self, x) -> bool:
        if self.block_impl not in ("auto", "pallas", "flax"):
            raise ValueError(
                f"block_impl must be auto|pallas|flax, got "
                f"{self.block_impl!r}")
        if self.block_impl == "flax":
            return False
        from situation_recognition_tpu.ops.vit_pallas import (
            fused_block_supported)
        b, n, _ = x.shape
        ok = (self.dtype == jnp.bfloat16
              and fused_block_supported(self.dim, self.heads, n, b,
                                        self.mlp_ratio))
        if self.block_impl == "pallas":
            # an explicit force must fail loudly: a silent flax fallback
            # lets a benchmark or kernel test believe the kernels ran when
            # they didn't (numerically invisible — that's why the structural
            # trace-count tests exist).  'auto' is the gated-fallback mode.
            if not (ok and (self.interpret
                            or jax.default_backend() == "tpu")):
                raise ValueError(
                    f"block_impl='pallas' forced but the fused kernels "
                    f"cannot run this call: dtype={self.dtype}, tokens "
                    f"{x.shape}, backend={jax.default_backend()!r}, "
                    f"interpret={self.interpret} (needs bf16, d%128==0, "
                    f"dh%64==0, batch*tokens>={1024}, and TPU or "
                    f"interpret) — use block_impl='auto' for fallback")
            return True
        return ok and jax.default_backend() == "tpu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        ln1 = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32,
                           name="ln1")
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="attn")
        ln2 = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32,
                           name="ln2")
        mlp = MlpBlock(self.dim, self.dim * self.mlp_ratio,
                       dtype=self.dtype, quick_gelu=self.quick_gelu,
                       name="mlp")
        # init ALWAYS runs the flax composition: the submodule calls
        # create the parameter tree (byte-identical for the
        # torchvision/CLIP converters and checkpoints) and the fused path
        # below needs no module calls at apply time — it reads
        # self.variables directly, so the kernels never pay the dead
        # flax compute and nothing relies on XLA DCE
        if self.is_initializing() or not self._use_pallas(x):
            y = ln1(x)
            y = attn(y, y)
            xa = x + y
            return xa + mlp(ln2(xa))
        # Fused TPU path (ops/vit_pallas.py)
        from situation_recognition_tpu.ops.vit_pallas import (
            fused_encoder_block)
        d = self.dim
        p = self.variables["params"]
        a = p["attn"]
        return fused_encoder_block(
            x,
            a["query"]["kernel"].reshape(d, d),
            a["query"]["bias"].reshape(d),
            a["key"]["kernel"].reshape(d, d),
            a["key"]["bias"].reshape(d),
            a["value"]["kernel"].reshape(d, d),
            a["value"]["bias"].reshape(d),
            a["out"]["kernel"].reshape(d, d),
            a["out"]["bias"],
            p["ln1"]["scale"], p["ln1"]["bias"],
            p["ln2"]["scale"], p["ln2"]["bias"],
            p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"],
            p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"],
            heads=self.heads, eps=self.ln_eps,
            quick_gelu=self.quick_gelu, interpret=self.interpret)


class ViT(nn.Module):
    """Pre-LN ViT returning the final-LN CLS token as pooled features.

    ``clip_variant=True`` reproduces the CLIP visual tower's three
    architectural deltas vs torchvision (weights convert via
    ``torch_convert.convert_clip_vit``): bias-free patch conv, an ``ln_pre``
    LayerNorm between position embedding and the encoder stack, and
    QuickGELU MLP activations.  The CLS projection to CLIP's shared
    embedding space is intentionally NOT part of the backbone — features
    are the ``ln_post`` CLS token at full width, matching the head hidden.
    """

    patch: int
    width: int
    depth: int
    heads: int
    dtype: Any = jnp.float32
    clip_variant: bool = False
    block_impl: str = "auto"       # auto | pallas | flax (EncoderBlock)
    interpret: bool = False        # CPU interpret mode for kernel tests
    #: rematerialize each encoder block on the backward pass.  Only
    #: meaningful when the backbone is differentiated
    #: (``--train_backbone``).  On the stream path this threads into the
    #: ft stream's per-block ``jax.checkpoint``
    #: (ops/vit_pallas.py::_ft_cls_stack); on the per-block flax path it
    #: is ``nn.remat`` (see models/resnet.py ResNet.remat).  Param tree
    #: unchanged either way.
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, _ = x.shape
        x = x.astype(self.dtype)
        x = nn.Conv(self.width, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    use_bias=not self.clip_variant,
                    dtype=self.dtype, name="patch_embed")(x)
        x = x.reshape(B, -1, self.width)                    # (B, N, D)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.width))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.width)).astype(self.dtype), x],
            axis=1)
        n_tokens = x.shape[1]
        pos = self.param("pos_embed",
                         nn.initializers.normal(0.02),
                         (1, n_tokens, self.width))
        x = x + pos.astype(self.dtype)
        ln_eps = 1e-5 if self.clip_variant else 1e-6
        if self.clip_variant:
            x = nn.LayerNorm(epsilon=ln_eps, dtype=jnp.float32,
                             name="ln_pre")(x)
        if self._use_stream(x):
            # fused STREAM path: all blocks in one flattened 8-row-aligned
            # token domain (ops/vit_pallas.py _fused_stack_impl — deletes
            # the two per-block relayout reshapes the per-block kernels
            # pay at N % 8 != 0, ~84 ms/step at the ViT-L/14 parity
            # shape), returning pre-ln_final CLS rows directly.  ln_final
            # is row-local, so applying it to the CLS rows only is exact.
            from situation_recognition_tpu.ops.vit_pallas import (
                fused_encoder_cls_stack)
            d = self.width
            p = self.variables["params"]

            def wts(i):
                bp = p[f"block{i}"]
                a = bp["attn"]
                return (a["query"]["kernel"].reshape(d, d),
                        a["query"]["bias"].reshape(d),
                        a["key"]["kernel"].reshape(d, d),
                        a["key"]["bias"].reshape(d),
                        a["value"]["kernel"].reshape(d, d),
                        a["value"]["bias"].reshape(d),
                        a["out"]["kernel"].reshape(d, d),
                        a["out"]["bias"],
                        bp["ln1"]["scale"], bp["ln1"]["bias"],
                        bp["ln2"]["scale"], bp["ln2"]["bias"],
                        bp["mlp"]["fc1"]["kernel"], bp["mlp"]["fc1"]["bias"],
                        bp["mlp"]["fc2"]["kernel"], bp["mlp"]["fc2"]["bias"])

            cls_feats = fused_encoder_cls_stack(
                x, [wts(i) for i in range(self.depth)],
                heads=self.heads, eps=ln_eps,
                quick_gelu=self.clip_variant, interpret=self.interpret,
                remat=self.remat)
            out = nn.LayerNorm(epsilon=ln_eps, dtype=jnp.float32,
                               name="ln_final")(cls_feats)
            return out.astype(self.dtype)
        block_cls = EncoderBlock
        if self.remat:
            # static_argnums counts (self, x, train); train positional
            # (kwargs are invisible to static_argnums)
            block_cls = nn.remat(EncoderBlock, static_argnums=(2,))
        for i in range(self.depth):
            x = block_cls(self.width, self.heads, dtype=self.dtype,
                          quick_gelu=self.clip_variant, ln_eps=ln_eps,
                          block_impl=self.block_impl,
                          interpret=self.interpret,
                          name=f"block{i}")(x, train)
        x = nn.LayerNorm(epsilon=ln_eps, dtype=jnp.float32,
                         name="ln_final")(x)
        return x[:, 0, :].astype(self.dtype)                # CLS token

    def _use_stream(self, x) -> bool:
        """Stream-stack gate: the per-block kernel gate (EncoderBlock's
        auto/pallas resolution) with the attention VMEM term checked at
        the PADDED token count, plus the ``SRTPU_VIT_STREAM`` escape
        hatch (default on; =0 restores the per-block kernels for A/B).
        Never during init — the EncoderBlock loop creates the parameter
        tree the converters and checkpoints expect."""
        import os

        if self.block_impl not in ("auto", "pallas", "flax"):
            # same loud rejection as EncoderBlock._use_pallas — a typo'd
            # value must not silently select the kernel path
            raise ValueError(
                f"block_impl must be auto|pallas|flax, got "
                f"{self.block_impl!r}")
        if self.is_initializing() or self.block_impl == "flax":
            return False
        if os.environ.get("SRTPU_VIT_STREAM", "1") == "0":
            return False
        from situation_recognition_tpu.ops.vit_pallas import (
            fused_block_supported)
        b, n, _ = x.shape
        n8 = -(-n // 8) * 8
        ok = (self.dtype == jnp.bfloat16
              and fused_block_supported(self.width, self.heads, n8, b)
              and (self.interpret or jax.default_backend() == "tpu"))
        return ok


def vit_l14(dtype=jnp.float32) -> ViT:
    return ViT(patch=14, width=1024, depth=24, heads=16, dtype=dtype)


def vit_l14_clip(dtype=jnp.float32) -> ViT:
    """CLIP ViT-L/14 visual tower (the published ViT-L/14 checkpoints are
    CLIP-trained; torchvision has no L/14)."""
    return ViT(patch=14, width=1024, depth=24, heads=16, dtype=dtype,
               clip_variant=True)


def vit_b16(dtype=jnp.float32) -> ViT:
    return ViT(patch=16, width=768, depth=12, heads=12, dtype=dtype)


def vit_tiny(dtype=jnp.float32) -> ViT:
    """Test-sized ViT (width 64 matches the mini head hidden)."""
    return ViT(patch=32, width=64, depth=2, heads=2, dtype=dtype)


VIT_WIDTHS = {"vit_l14": 1024, "vit_l14_clip": 1024, "vit_b16": 768,
              "vit_tiny": 64}
