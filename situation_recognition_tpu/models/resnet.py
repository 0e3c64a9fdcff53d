"""ResNet v1.5 backbones in flax, NHWC, lowered to XLA convolutions on the MXU.

TPU-native replacement for the reference's torchvision ResNet-152 feature
extractor (``/root/reference/model.py:8-35``): the reference freezes all
backbone params and replaces ``fc`` with Identity, returning 2048-d pooled
features.  Here the backbone is a standalone flax module returning pooled
features directly (no fc at all); weights come from the torchvision
checkpoint via ``tools/convert_torch.py``.

Faithfulness notes:

* torchvision's Bottleneck is v1.5 — the stride sits on the 3x3 conv — and BN
  uses eps 1e-5, momentum 0.1 (flax momentum 0.9).  One residual BN
  difference (DIVERGENCES #7): flax EMAs the BIASED batch variance into
  running_var while torch stores the Bessel-corrected one — relative error
  1/(n-1) per update (~1e-7 at n = B*H*W), so long torch-parity runs drift
  in running_var at that order; the normalization math itself matches.
* The reference calls ``model.train()`` during training, so its "frozen"
  backbone still normalizes with **batch** statistics and updates running
  stats; only the affine/conv params are frozen.  ``train=True`` reproduces
  that (mutable ``batch_stats``); ``train=False`` uses running averages like
  the reference's ``model.eval()``.
* Layout is NHWC (TPU-preferred); the converter transposes torch's NCHW/OIHW.
* Module names mirror torchvision keys (``layer3_17 / conv2 / bn2``) so the
  converter is a mechanical rename.

Compute dtype: pass ``dtype=jnp.bfloat16`` for MXU-friendly mixed precision
(params stay fp32; flax casts per-op), mirroring the reference's AMP autocast
(model.py:33-35) without loss scaling (unneeded on TPU — documented
divergence).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


class Bottleneck(nn.Module):
    """torchvision-style bottleneck block (expansion 4, stride on the 3x3)."""

    features: int
    strides: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        bn = partial(
            nn.BatchNorm, use_running_average=not train,
            momentum=0.9, epsilon=1e-5, dtype=self.dtype)

        residual = x
        y = conv(self.features, (1, 1), name="conv1")(x)
        y = bn(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.features, (3, 3), strides=(self.strides, self.strides),
                 padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = bn(name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.features * 4, (1, 1), name="conv3")(y)
        y = bn(name="bn3")(y)

        if self.has_downsample:
            residual = conv(self.features * 4, (1, 1),
                            strides=(self.strides, self.strides),
                            name="downsample_conv")(x)
            residual = bn(name="downsample_bn")(residual)

        return nn.relu(y + residual)


class BasicBlock(nn.Module):
    """torchvision-style basic block (two 3x3 convs, expansion 1) — the
    resnet18/34 building block.  Stride sits on the FIRST conv
    (torchvision ``BasicBlock.conv1``), unlike the Bottleneck's 3x3."""

    features: int
    strides: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        bn = partial(
            nn.BatchNorm, use_running_average=not train,
            momentum=0.9, epsilon=1e-5, dtype=self.dtype)

        residual = x
        y = conv(self.features, (3, 3), strides=(self.strides, self.strides),
                 padding=[(1, 1), (1, 1)], name="conv1")(x)
        y = bn(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                 name="conv2")(y)
        y = bn(name="bn2")(y)

        if self.has_downsample:
            residual = conv(self.features, (1, 1),
                            strides=(self.strides, self.strides),
                            name="downsample_conv")(x)
            residual = bn(name="downsample_bn")(residual)

        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet v1.5 returning pooled features (fc-less, like the reference's
    Identity-fc backbone): (B, base_width*32) for Bottleneck stacks
    (resnet50/101/152 → 2048), (B, base_width*8) for BasicBlock stacks
    (resnet18/34 → 512)."""

    stage_sizes: Sequence[int]
    dtype: Any = jnp.float32
    base_width: int = 64   # stem width
    basic: bool = False    # BasicBlock (18/34) instead of Bottleneck
    #: rematerialize each residual block on the backward pass
    #: (``jax.checkpoint`` via ``nn.remat``): backward-pass activation
    #: memory drops from every conv output to the block-boundary residual
    #: stream, at the cost of one extra block forward.  Only meaningful
    #: when the backbone is being DIFFERENTIATED (``--train_backbone``) —
    #: the frozen/forward-only paths store nothing either way, so the
    #: default stays off and the param tree/name layout is unchanged
    #: (``nn.remat`` preserves module names: converters and checkpoints
    #: see the same keys).
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(self.base_width, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(kernel=3, stride=2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        block_cls = BasicBlock if self.basic else Bottleneck
        if self.remat:
            # static_argnums counts (self, x, train) and only sees
            # POSITIONAL args: ``train`` must be static — it selects the
            # BN branch, not an array input
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        features = self.base_width
        for stage, num_blocks in enumerate(self.stage_sizes):
            for block in range(num_blocks):
                strides = 2 if (stage > 0 and block == 0) else 1
                # torchvision adds a downsample when stride != 1 or the
                # channel count changes: every stage-0 block for Bottleneck
                # (64 -> 256 even at stride 1), but NOT stage 1 of a
                # BasicBlock stack (64 -> 64, stride 1)
                has_ds = (block == 0) and (not self.basic or stage > 0)
                x = block_cls(
                    features=features,
                    strides=strides,
                    has_downsample=has_ds,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x, train)   # positional: static_argnums can't see kwargs
            features *= 2

        # global average pool == torch AdaptiveAvgPool2d(1) + flatten
        return jnp.mean(x, axis=(1, 2))


def resnet18(dtype=jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), dtype=dtype, basic=True)


def resnet34(dtype=jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), dtype=dtype, basic=True)


def resnet50(dtype=jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), dtype=dtype)


def resnet101(dtype=jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3), dtype=dtype)


def resnet152(dtype=jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(3, 8, 36, 3), dtype=dtype)
