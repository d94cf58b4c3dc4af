"""I3D FVD backbone: flax model + torch-free converter vs a torch-side
construction of the pytorch-i3d module tree (same state-dict naming the
released `rgb_imagenet.pt` FVD weights use).

No pretrained weights exist in this image (zero egress), so parity is
random-weight: a torch network built to the pytorch-i3d layer spec
(TF-SAME conv/pool padding, BN eps 1e-3, avg-pool logits head) is saved
with `torch.save`, read back through the pure zip+pickle reader, converted,
and compared output-for-output. Channel widths are scaled down 8x for CPU
speed — the converter is name-driven, so the mapping logic is identical at
released scale.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

from dawn_tpu.evaluate.i3d import i3d_forward, INCEPTION_CFG
from dawn_tpu.weights.i3d_convert import convert_i3d

SCALE = 8  # divide every channel width by this for the CPU test


def _tf_same_pad(x, k, s, value=0.0):
    """TF 'SAME' for (B, C, T, H, W): pad_total split low/high with the
    extra element at the END (what pytorch-i3d's compute_pad replicates)."""
    pads = []
    for dim, (kk, ss) in enumerate(zip(k, s)):
        size = x.shape[2 + dim]
        out = math.ceil(size / ss)
        total = max((out - 1) * ss + kk - size, 0)
        pads.append((total // 2, total - total // 2))
    # F.pad takes (..., W_lo, W_hi, H_lo, H_hi, T_lo, T_hi)
    flat = [v for lohi in reversed(pads) for v in lohi]
    return F.pad(x, flat, value=value)


class Unit3D(nn.Module):
    def __init__(self, cin, cout, k=(1, 1, 1), stride=(1, 1, 1),
                 use_bn=True, use_bias=False, activation=True):
        super().__init__()
        self.k, self.stride = k, stride
        self.activation = activation
        self.conv3d = nn.Conv3d(cin, cout, k, stride, padding=0,
                                bias=use_bias)
        self.bn = nn.BatchNorm3d(cout, eps=1e-3) if use_bn else None

    def forward(self, x):
        x = self.conv3d(_tf_same_pad(x, self.k, self.stride))
        if self.bn is not None:
            x = self.bn(x)
        return F.relu(x) if self.activation else x


class MaxPool3dSame(nn.Module):
    def __init__(self, k, stride):
        super().__init__()
        self.k, self.stride = k, stride

    def forward(self, x):
        x = _tf_same_pad(x, self.k, self.stride, value=-float("inf"))
        return F.max_pool3d(x, self.k, self.stride)


class InceptionModule(nn.Module):
    def __init__(self, cin, cfg):
        super().__init__()
        b0, b1a, b1b, b2a, b2b, b3b = cfg
        self.b0 = Unit3D(cin, b0)
        self.b1a = Unit3D(cin, b1a)
        self.b1b = Unit3D(b1a, b1b, (3, 3, 3))
        self.b2a = Unit3D(cin, b2a)
        self.b2b = Unit3D(b2a, b2b, (3, 3, 3))
        self.pool = MaxPool3dSame((3, 3, 3), (1, 1, 1))
        self.b3b = Unit3D(cin, b3b)

    def forward(self, x):
        return torch.cat([
            self.b0(x), self.b1b(self.b1a(x)), self.b2b(self.b2a(x)),
            self.b3b(self.pool(x))], dim=1)


class InceptionI3d(nn.Module):
    def __init__(self, num_classes=400 // SCALE):
        super().__init__()
        s = lambda c: max(1, c // SCALE)
        self.Conv3d_1a_7x7 = Unit3D(3, s(64), (7, 7, 7), (2, 2, 2))
        self.pool2a = MaxPool3dSame((1, 3, 3), (1, 2, 2))
        self.Conv3d_2b_1x1 = Unit3D(s(64), s(64))
        self.Conv3d_2c_3x3 = Unit3D(s(64), s(192), (3, 3, 3))
        self.pool3a = MaxPool3dSame((1, 3, 3), (1, 2, 2))
        cin = s(192)
        for name, cfg in INCEPTION_CFG.items():
            cfg = [s(c) for c in cfg]
            setattr(self, name, InceptionModule(cin, cfg))
            cin = cfg[0] + cfg[2] + cfg[4] + cfg[5]
        self.pool4a = MaxPool3dSame((3, 3, 3), (2, 2, 2))
        self.pool5a = MaxPool3dSame((2, 2, 2), (2, 2, 2))
        self.logits = Unit3D(cin, num_classes, use_bn=False, use_bias=True,
                             activation=False)

    def forward(self, x, features=True):
        x = self.pool2a(self.Conv3d_1a_7x7(x))
        x = self.pool3a(self.Conv3d_2c_3x3(self.Conv3d_2b_1x1(x)))
        x = self.Mixed_3c(self.Mixed_3b(x))
        x = self.pool4a(x)
        for n in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = getattr(self, n)(x)
        x = self.pool5a(x)
        x = self.Mixed_5c(self.Mixed_5b(x))
        x = F.avg_pool3d(x, (2, 7, 7), stride=(1, 1, 1))
        if not features:
            x = self.logits(x)
        return x.mean(dim=(2, 3, 4))


@pytest.fixture(scope="module")
def nets(tmp_path_factory):
    torch.manual_seed(0)
    net = InceptionI3d().eval()
    # randomize BN stats so the bn folding is actually exercised
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.BatchNorm3d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    path = str(tmp_path_factory.mktemp("i3d") / "i3d_tiny.pt")
    torch.save(net.state_dict(), path)
    params = convert_i3d(path)     # exercises the torch-free zip reader
    return net, params


def test_i3d_features_parity(nets):
    net, params = nets
    rng = np.random.RandomState(0)
    vid = rng.rand(1, 10, 224, 224, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref = net(torch.from_numpy(vid.transpose(0, 4, 1, 2, 3)),
                  features=True).numpy()
    got = np.asarray(i3d_forward(params, vid, features=True))
    assert got.shape == ref.shape == (1, 1024 // SCALE)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_i3d_logits_parity(nets):
    net, params = nets
    rng = np.random.RandomState(1)
    vid = rng.rand(1, 10, 224, 224, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref = net(torch.from_numpy(vid.transpose(0, 4, 1, 2, 3)),
                  features=False).numpy()
    got = np.asarray(i3d_forward(params, vid, features=False))
    assert got.shape == ref.shape == (1, 400 // SCALE)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_fvd_i3d_self_distance_zero(nets):
    # Full fvd_i3d path (preprocess resize -> I3D -> Frechet): identical
    # sets must score ~0. Distribution SEPARATION is not testable with
    # random weights — a ~22-layer random ReLU/BN stack collapses pooled
    # features to near input-independence (measured std 2.5e-6 vs mean
    # 0.05), which trained Kinetics weights do not; the parity tests above
    # are what guarantee the released checkpoint reproduces.
    _, params = nets
    from dawn_tpu.evaluate.i3d import fvd_i3d
    rng = np.random.RandomState(2)
    real = rng.rand(4, 10, 64, 64, 3).astype(np.float32)
    d0 = fvd_i3d(params, real, real.copy(), batch=2)
    assert abs(d0) < 1e-4, d0
