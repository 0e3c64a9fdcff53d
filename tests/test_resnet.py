"""ResNet backbone differential tests vs a clean-room torch oracle.

The oracle builds the standard ResNet v1.5 bottleneck architecture in plain
torch with torchvision-compatible parameter naming, so the converter's rename
logic is exercised on realistic keys (torchvision itself is not installed).
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

from situation_recognition_tpu.models.resnet import ResNet, resnet18, resnet152
from situation_recognition_tpu.utils.torch_convert import convert_resnet


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchBasicBlock(nn.Module):
    """torchvision-style BasicBlock (resnet18/34): two 3x3 convs,
    expansion 1, stride on conv1."""

    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet(nn.Module):
    def __init__(self, stage_sizes, width=64, block=TorchBottleneck):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.inplanes = width
        planes = width
        for i, blocks in enumerate(stage_sizes):
            stride = 1 if i == 0 else 2
            layers = []
            # torchvision: downsample iff stride != 1 or channels change
            if stride != 1 or self.inplanes != planes * block.expansion:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * block.expansion, 1,
                              stride=stride, bias=False),
                    nn.BatchNorm2d(planes * block.expansion))
            else:
                downsample = None
            layers.append(block(self.inplanes, planes, stride, downsample))
            self.inplanes = planes * block.expansion
            for _ in range(1, blocks):
                layers.append(block(self.inplanes, planes))
            setattr(self, f"layer{i + 1}", nn.Sequential(*layers))
            planes *= 2
        self.avgpool = nn.AdaptiveAvgPool2d(1)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return torch.flatten(self.avgpool(x), 1)


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


def test_mini_resnet_matches_torch_eval():
    stage_sizes = (1, 1, 1, 1)
    tmodel = TorchResNet(stage_sizes).eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel)
    state = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, stats = convert_resnet(state)

    fmodel = ResNet(stage_sizes=stage_sizes)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)

    out = fmodel.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), train=False)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)


def test_mini_resnet_matches_torch_train_mode():
    """Reference backbones run under model.train(): BN normalizes with batch
    statistics even though params are frozen (SURVEY §2a).  Outputs must
    match torch train-mode normalization."""
    stage_sizes = (1, 1, 1, 1)
    tmodel = TorchResNet(stage_sizes).train()
    state = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, stats = convert_resnet(state)

    fmodel = ResNet(stage_sizes=stage_sizes)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 64, 64, 3)).astype(np.float32)

    out, _ = fmodel.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(x), train=True, mutable=["batch_stats"])
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-3, atol=1e-3)


def test_resnet152_conversion_is_complete():
    """Converter must consume every torchvision-style resnet152 key (except
    fc and num_batches_tracked) and produce the exact flax tree."""
    tmodel = TorchResNet((3, 8, 36, 3))
    state = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, stats = convert_resnet(state)

    fmodel = resnet152()
    var_shapes = jax.eval_shape(
        lambda: fmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 224, 224, 3)), train=False))

    def paths(tree):
        out = set()
        def rec(node, pre):
            if isinstance(node, dict):
                for k, v in node.items():
                    rec(v, pre + (k,))
            else:
                out.add((pre, tuple(node.shape)))
        rec(tree, ())
        return out

    assert paths(params) == paths(var_shapes["params"])
    assert paths(stats) == paths(var_shapes["batch_stats"])


def test_feature_dim():
    fmodel = ResNet(stage_sizes=(1, 1, 1, 1))
    v = fmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    out = fmodel.apply(v, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 2048)


def test_basicblock_resnet_matches_torch_eval():
    """resnet18-style BasicBlock stack: converted weights produce identical
    features to the torch oracle (eval-mode BN), incl. the stage-1
    no-downsample layout that differs from Bottleneck stacks."""
    stage_sizes = (1, 1, 1, 1)
    tmodel = TorchResNet(stage_sizes, block=TorchBasicBlock).eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel)
    state = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, stats = convert_resnet(state)

    fmodel = ResNet(stage_sizes=stage_sizes, basic=True)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)

    out = fmodel.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), train=False)
    assert out.shape == (2, 512)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)


def test_resnet18_conversion_is_complete():
    """Converter consumes the full resnet18 layout and produces exactly the
    flax tree resnet18() initializes (same paths, same shapes)."""
    tmodel = TorchResNet((2, 2, 2, 2), block=TorchBasicBlock)
    state = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, stats = convert_resnet(state)

    fmodel = resnet18()
    var_shapes = jax.eval_shape(
        lambda: fmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 224, 224, 3)), train=False))

    def paths(tree):
        out = set()
        def rec(node, pre):
            if isinstance(node, dict):
                for k, v in node.items():
                    rec(v, pre + (k,))
            else:
                out.add((pre, tuple(node.shape)))
        rec(tree, ())
        return out

    assert paths(params) == paths(var_shapes["params"])
    assert paths(stats) == paths(var_shapes["batch_stats"])
