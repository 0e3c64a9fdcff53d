"""Clean-room ``torchvision`` stand-in so the REAL reference code can run.

The differential oracle in ``tests/test_reference_differential.py`` executes
the actual ``/root/reference/sr.py`` + ``model.py`` as a subprocess against a
checkpoint exported by this framework.  torchvision is not installed in this
environment (and the reference's ``pretrained=True`` would need network
access anyway), so this module provides exactly the surface the reference
imports (``model.py:4,16``; ``utils/imsitu_encoder.py:2,18-36``):

* ``models.resnet152(pretrained=..., progress=...)`` — the standard ResNet
  v1.5 bottleneck architecture with torchvision's parameter naming
  (``conv1/bn1/layer{1..4}.{i}.conv{1..3}/bn{1..3}/downsample.{0,1}/fc``).
  Weights are randomly initialized: the reference immediately overwrites
  every parameter and buffer via ``utils.load_net`` from the checkpoint
  under test, and the test asserts zero ``[Missed]`` keys so nothing random
  survives into the comparison.
* ``transforms.{Compose, Resize, CenterCrop, RandomCrop,
  RandomHorizontalFlip, ToTensor, Normalize}`` with torchvision's documented
  geometry: ``Resize(int)`` maps the shorter side to ``size`` (long side
  ``int(size * long / short)``, no-op when the short side already equals
  ``size``) through PIL bilinear; ``CenterCrop`` offsets by
  ``int(round((dim - crop) / 2.))``.  This is the same geometry our
  framework's ``--preproc exact`` implements and pins with hand-derived
  tests (tests/test_data_pipeline.py), so both sides of the differential
  share one preprocessing definition.

Only what the reference actually calls is implemented — this is a test
fixture, not a torchvision replacement.
"""

import types

import numpy as np
import torch
import torch.nn as nn
from PIL import Image


# ---------------------------------------------------------------- models ---

class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
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


class _ResNet(nn.Module):
    """torchvision-layout ResNet (v1.5 bottleneck), including the ``fc``
    head the reference replaces with Identity (``model.py:21-31``)."""

    def __init__(self, stage_sizes, num_classes=1000):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        inplanes, planes = 64, 64
        for i, blocks in enumerate(stage_sizes):
            stride = 1 if i == 0 else 2
            layers = []
            if stride != 1 or inplanes != planes * _Bottleneck.expansion:
                downsample = nn.Sequential(
                    nn.Conv2d(inplanes, planes * _Bottleneck.expansion, 1,
                              stride=stride, bias=False),
                    nn.BatchNorm2d(planes * _Bottleneck.expansion))
            else:
                downsample = None
            layers.append(_Bottleneck(inplanes, planes, stride, downsample))
            inplanes = planes * _Bottleneck.expansion
            for _ in range(1, blocks):
                layers.append(_Bottleneck(inplanes, planes))
            setattr(self, f"layer{i + 1}", nn.Sequential(*layers))
            planes *= 2
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512 * _Bottleneck.expansion, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def _resnet152(pretrained=False, progress=True, **kwargs):
    # `pretrained` is accepted (the reference passes True) but ignored:
    # no weights are downloadable here, and the caller's utils.load_net
    # replaces the full state from the checkpoint under test.
    return _ResNet((3, 8, 36, 3), **kwargs)


models = types.SimpleNamespace(resnet152=_resnet152)


# ------------------------------------------------------------ transforms ---

class Compose:
    def __init__(self, transforms_list):
        self.transforms = transforms_list

    def __call__(self, img):
        for t in self.transforms:
            img = t(img)
        return img


class Resize:
    """Shorter side → ``size`` (int), PIL bilinear, torchvision geometry."""

    def __init__(self, size):
        assert isinstance(size, int), "shim supports int sizes only"
        self.size = size

    def __call__(self, img):
        w, h = img.size
        s = self.size
        if (w <= h and w == s) or (h <= w and h == s):
            return img
        if w < h:
            ow, oh = s, int(s * h / w)
        else:
            oh, ow = s, int(s * w / h)
        return img.resize((ow, oh), Image.BILINEAR)


class CenterCrop:
    def __init__(self, size):
        self.size = size

    def __call__(self, img):
        w, h = img.size
        c = self.size
        top = int(round((h - c) / 2.0))
        left = int(round((w - c) / 2.0))
        return img.crop((left, top, left + c, top + c))


class RandomCrop:
    def __init__(self, size):
        self.size = size

    def __call__(self, img):
        w, h = img.size
        c = self.size
        top = int(torch.randint(0, h - c + 1, ()).item()) if h > c else 0
        left = int(torch.randint(0, w - c + 1, ()).item()) if w > c else 0
        return img.crop((left, top, left + c, top + c))


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img):
        if torch.rand(()).item() < self.p:
            return img.transpose(Image.FLIP_LEFT_RIGHT)
        return img


class ToTensor:
    def __call__(self, img):
        arr = np.asarray(img, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(arr.copy()).permute(2, 0, 1).contiguous()
        return t.float().div(255.0)


class Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean).view(-1, 1, 1)
        self.std = torch.tensor(std).view(-1, 1, 1)

    def __call__(self, t):
        return (t - self.mean) / self.std


transforms = types.SimpleNamespace(
    Compose=Compose, Resize=Resize, CenterCrop=CenterCrop,
    RandomCrop=RandomCrop, RandomHorizontalFlip=RandomHorizontalFlip,
    ToTensor=ToTensor, Normalize=Normalize)
