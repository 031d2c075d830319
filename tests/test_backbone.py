"""Backbone parity vs an inline torch replica of the reference ResNet
(/root/reference/lib/model/framework/resnet.py: stride on Bottleneck conv1
:71, ceil-mode stem maxpool :113) — validates both the NHWC forward and
the torch state_dict converter."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from dana_tpu.models import resnet  # noqa: E402


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, stride=stride, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + r)


def _make_torch_base(layers=(2, 2, 2)):
    """conv1..layer3 with reference quirks, small block counts for speed."""
    mods = {}
    model = nn.Module()
    model.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
    model.bn1 = nn.BatchNorm2d(64)
    model.relu = nn.ReLU()
    model.maxpool = nn.MaxPool2d(3, 2, padding=0, ceil_mode=True)
    inplanes = 64
    for li, (planes, blocks) in enumerate(zip([64, 128, 256], layers)):
        stride = 1 if li == 0 else 2
        seq = []
        for b in range(blocks):
            s = stride if b == 0 else 1
            down = None
            if s != 1 or inplanes != planes * 4:
                down = nn.Sequential(
                    nn.Conv2d(inplanes, planes * 4, 1, s, bias=False),
                    nn.BatchNorm2d(planes * 4))
            seq.append(TorchBottleneck(inplanes, planes, s, down))
            inplanes = planes * 4
        setattr(model, f'layer{li+1}', nn.Sequential(*seq))
    model.layer4 = nn.Sequential()  # unused here
    del mods
    return model


def _randomize_bn(model, gen):
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=gen) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=gen) + 0.5)
            m.weight.data.copy_(torch.randn(m.num_features, generator=gen) * 0.1 + 1)
            m.bias.data.copy_(torch.randn(m.num_features, generator=gen) * 0.1)


def test_base_forward_matches_torch():
    gen = torch.Generator().manual_seed(0)
    model = _make_torch_base()
    with torch.no_grad():
        _randomize_bn(model, gen)
    model.eval()

    params = resnet.convert_torch_state_dict(model.state_dict())

    x = torch.randn(1, 3, 65, 97, generator=gen)  # odd sizes: ceil-mode path
    with torch.no_grad():
        t = model.conv1(x)
        t = model.relu(model.bn1(t))
        t = model.maxpool(t)
        t = model.layer3(model.layer2(model.layer1(t)))
    ref = t.permute(0, 2, 3, 1).numpy()

    got = np.asarray(resnet.base_forward(
        jnp.asarray(x.permute(0, 2, 3, 1).numpy()), params))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_s2d_stem_matches_direct_conv():
    """The space-to-depth conv1 rewrite (resnet._conv7x7s2_s2d) is
    numerically identical to the direct 7x7/2 pad-3 convolution, on even
    and odd output parities."""
    from dana_tpu.models import layers as L
    rng = np.random.default_rng(0)
    for h, w in [(64, 96), (112, 80), (608, 800)][:2]:
        x = jnp.asarray(rng.normal(size=(2, h, w, 3)).astype(np.float32))
        p = {'weight': jnp.asarray(
            rng.normal(size=(7, 7, 3, 8)).astype(np.float32) * 0.1)}
        ref = L.conv2d(x, p, stride=2, padding=3)
        got = resnet._conv7x7s2_s2d(x, p)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_stem_ceil_mode_shape():
    # 600x1000 input -> conv1 stride2 -> 300x500 -> ceil maxpool -> 150x250
    params = {'conv1': {'weight': np.zeros((7, 7, 3, 4), np.float32)},
              'bn1': {'weight': np.ones(4, np.float32),
                      'bias': np.zeros(4, np.float32),
                      'running_mean': np.zeros(4, np.float32),
                      'running_var': np.ones(4, np.float32)}}
    out = resnet.stem(jnp.zeros((1, 600, 1000, 3)), params)
    tm = nn.MaxPool2d(3, 2, padding=0, ceil_mode=True)
    texp = tm(torch.zeros(1, 4, 300, 500)).shape
    assert out.shape == (1, texp[2], texp[3], 4)
