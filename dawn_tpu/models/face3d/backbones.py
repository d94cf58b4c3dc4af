"""Alternate 3DMM-regressor backbones in flax (the 3DDFA model zoo).

Capability parity with extract_init_states/models/{mobilenet_v3,resnet}.py
and the arch factory at extract_init_states/utils/onnx.py:17 /
configs/*.yml:1 (``arch: mobilenet | resnet22``; mobilenet_v3 ships in the
reference's models/ package for the same zoo). Only mb1 is used by the
released DAWN checkpoints — these alternates exist so any 3DDFA-zoo
checkpoint (mb05, resnet22, v3-small/large) drops into the same pluggable
``backbone`` slot of pipeline/face_prep.py.

All modules are inference-mode (frozen BatchNorm running stats), NHWC
channels-last, and convert from the torch checkpoints via the
``convert_*`` functions below (parity-tested in
tests/test_parity_backbones.py).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np
import flax.linen as nn


def _make_divisible(x: float, by: int = 8) -> int:
    # extract_init_states/models/mobilenet_v3.py:71-73
    return int(math.ceil(x / by) * by)


def _hswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _hsigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


class SEModule(nn.Module):
    """Squeeze-excite with h-sigmoid gate (mobilenet_v3.py:44-60)."""

    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = x.mean(axis=(1, 2))
        y = nn.Dense(c // self.reduction, use_bias=False, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False, name="fc2")(y)
        return x * _hsigmoid(y)[:, None, None, :]


class MobileBottleneck(nn.Module):
    """pw-expand / dw / SE / pw-linear with optional residual
    (mobilenet_v3.py:76-119; note SE sits BEFORE the post-dw activation)."""

    oup: int
    kernel: int
    stride: int
    exp: int
    se: bool
    nl: str  # 'RE' | 'HS'

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        act = _hswish if self.nl == "HS" else nn.relu
        pad = (self.kernel - 1) // 2
        h = nn.Conv(self.exp, (1, 1), use_bias=False, name="pw")(x)
        h = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         name="pw_bn")(h)
        h = act(h)
        h = nn.Conv(self.exp, (self.kernel, self.kernel), strides=self.stride,
                    padding=pad, feature_group_count=self.exp, use_bias=False,
                    name="dw")(h)
        h = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         name="dw_bn")(h)
        if self.se:
            h = SEModule(name="se")(h)
        h = act(h)
        h = nn.Conv(self.oup, (1, 1), use_bias=False, name="pw_lin")(h)
        h = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         name="pw_lin_bn")(h)
        if self.stride == 1 and inp == self.oup:
            h = x + h
        return h


# (kernel, exp, out, se, nl, stride) — mobilenet_v3.py Tables 1/2
V3_SETTINGS = {
    "large": [
        (3, 16, 16, False, "RE", 1), (3, 64, 24, False, "RE", 2),
        (3, 72, 24, False, "RE", 1), (5, 72, 40, True, "RE", 2),
        (5, 120, 40, True, "RE", 1), (5, 120, 40, True, "RE", 1),
        (3, 240, 80, False, "HS", 2), (3, 200, 80, False, "HS", 1),
        (3, 184, 80, False, "HS", 1), (3, 184, 80, False, "HS", 1),
        (3, 480, 112, True, "HS", 1), (3, 672, 112, True, "HS", 1),
        (5, 672, 160, True, "HS", 2), (5, 960, 160, True, "HS", 1),
        (5, 960, 160, True, "HS", 1),
    ],
    "small": [
        (3, 16, 16, True, "RE", 2), (3, 72, 24, False, "RE", 2),
        (3, 88, 24, False, "RE", 1), (5, 96, 40, True, "HS", 2),
        (5, 240, 40, True, "HS", 1), (5, 240, 40, True, "HS", 1),
        (5, 120, 48, True, "HS", 1), (5, 144, 48, True, "HS", 1),
        (5, 288, 96, True, "HS", 2), (5, 576, 96, True, "HS", 1),
        (5, 576, 96, True, "HS", 1),
    ],
}


class MobileNetV3(nn.Module):
    """mobilenet_v3.py:122-230 (small/large, widen_factor)."""

    num_classes: int = 62
    widen_factor: float = 1.0
    mode: str = "small"

    @nn.compact
    def __call__(self, x):
        wf = self.widen_factor
        last_channel = _make_divisible(1280 * wf) if wf > 1.0 else 1280
        x = nn.Conv(16, (3, 3), strides=2, padding=1, use_bias=False,
                    name="stem")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         name="stem_bn")(x)
        x = _hswish(x)
        for i, (k, exp, c, se, nl, s) in enumerate(V3_SETTINGS[self.mode]):
            x = MobileBottleneck(_make_divisible(c * wf), k, s,
                                 _make_divisible(exp * wf), se, nl,
                                 name=f"b{i}")(x)
        last_conv = _make_divisible((960 if self.mode == "large" else 576) * wf)
        x = nn.Conv(last_conv, (1, 1), use_bias=False, name="tail")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         name="tail_bn")(x)
        x = _hswish(x)
        x = x.mean(axis=(1, 2), keepdims=True)      # AdaptiveAvgPool2d(1)
        x = nn.Conv(last_channel, (1, 1), name="head")(x)
        x = _hswish(x)
        x = x.reshape(x.shape[0], -1)               # .mean(3).mean(2) on 1x1
        return nn.Dense(self.num_classes, name="fc")(x)


class BasicBlock(nn.Module):
    """resnet.py:15-45 (3x3-3x3 residual, 1x1-conv downsample)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        h = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    name="conv2")(h)
        h = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         name="bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, name="down_conv")(x)
            residual = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                    name="down_bn")(residual)
        return nn.relu(h + residual)


RESNET22_LAYERS = ((128, 3), (256, 4), (512, 3))   # resnet.py:135-142


class ResNet22(nn.Module):
    """resnet.py:47-132 — the caffe-resnet25-style 62-param regressor:
    5x5/s2 + 3x3 stems, three stride-2 stages, 1x1 conv head + global pool."""

    num_classes: int = 62

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(32, (5, 5), strides=2, padding=2, use_bias=False,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), padding=1, use_bias=False, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         name="bn2")(x)
        x = nn.relu(x)
        for li, (planes, blocks) in enumerate(RESNET22_LAYERS):
            for bi in range(blocks):
                x = BasicBlock(planes, stride=2 if bi == 0 else 1,
                               name=f"layer{li + 1}_{bi}")(x)
        x = nn.Conv(self.num_classes, (1, 1), name="conv_param")(x)
        return x.mean(axis=(1, 2))                  # avgpool + flatten


# ---------------------------------------------------------------------------
# torch state_dict -> flax variables


def _np(t):
    from dawn_tpu.weights.torch_convert import _np as conv
    return conv(t)


def _conv(sd, key):
    w = _np(sd[f"{key}.weight"])                    # (O, I/g, kh, kw) -> HWIO
    out = {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
    if f"{key}.bias" in sd:
        out["bias"] = jnp.asarray(_np(sd[f"{key}.bias"]))
    return out


def _bn(sd, key):
    return ({"scale": jnp.asarray(_np(sd[f"{key}.weight"])),
             "bias": jnp.asarray(_np(sd[f"{key}.bias"]))},
            {"mean": jnp.asarray(_np(sd[f"{key}.running_mean"])),
             "var": jnp.asarray(_np(sd[f"{key}.running_var"]))})


def _dense(sd, key):
    return {"kernel": jnp.asarray(_np(sd[f"{key}.weight"]).T),
            "bias": jnp.asarray(_np(sd[f"{key}.bias"]))}


def convert_mobilenet_v3(sd: Mapping[str, Any],
                         mode: str = "small") -> Dict[str, Any]:
    """torch MobileNetV3 state_dict -> flax variables.

    torch layout: features.0.{0,1} stem, features.{1+i}.conv.{0,1,3,4,5,7,8}
    bottlenecks (conv.5 = SE fc.0/fc.2 when present), features.{t}.{0,1}
    tail conv_1x1_bn, features.{t+2} head 1x1 conv (with bias), fc.
    """
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    settings = V3_SETTINGS[mode]

    params: Dict[str, Any] = {"stem": _conv(sd, "features.0.0")}
    stats: Dict[str, Any] = {}
    params["stem_bn"], stats["stem_bn"] = _bn(sd, "features.0.1")

    for i, (_, _, _, se, _, _) in enumerate(settings):
        pre = f"features.{1 + i}.conv"
        bp: Dict[str, Any] = {"pw": _conv(sd, f"{pre}.0"),
                              "dw": _conv(sd, f"{pre}.3"),
                              "pw_lin": _conv(sd, f"{pre}.7")}
        bs: Dict[str, Any] = {}
        bp["pw_bn"], bs["pw_bn"] = _bn(sd, f"{pre}.1")
        bp["dw_bn"], bs["dw_bn"] = _bn(sd, f"{pre}.4")
        bp["pw_lin_bn"], bs["pw_lin_bn"] = _bn(sd, f"{pre}.8")
        if se:
            bp["se"] = {
                "fc1": {"kernel":
                        jnp.asarray(_np(sd[f"{pre}.5.fc.0.weight"]).T)},
                "fc2": {"kernel":
                        jnp.asarray(_np(sd[f"{pre}.5.fc.2.weight"]).T)}}
        params[f"b{i}"], stats[f"b{i}"] = bp, bs

    t = 1 + len(settings)
    params["tail"] = _conv(sd, f"features.{t}.0")
    params["tail_bn"], stats["tail_bn"] = _bn(sd, f"features.{t}.1")
    params["head"] = _conv(sd, f"features.{t + 2}")
    params["fc"] = _dense(sd, "fc")
    return {"params": params, "batch_stats": stats}


def convert_resnet22(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """torch ResNet22 state_dict -> flax variables."""
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    params: Dict[str, Any] = {"conv1": _conv(sd, "conv1"),
                              "conv2": _conv(sd, "conv2")}
    stats: Dict[str, Any] = {}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")
    params["bn2"], stats["bn2"] = _bn(sd, "bn2")
    for li, (_, blocks) in enumerate(RESNET22_LAYERS):
        for bi in range(blocks):
            pre = f"layer{li + 1}.{bi}"
            bp: Dict[str, Any] = {"conv1": _conv(sd, f"{pre}.conv1"),
                                  "conv2": _conv(sd, f"{pre}.conv2")}
            bs: Dict[str, Any] = {}
            bp["bn1"], bs["bn1"] = _bn(sd, f"{pre}.bn1")
            bp["bn2"], bs["bn2"] = _bn(sd, f"{pre}.bn2")
            if f"{pre}.downsample.0.weight" in sd:
                bp["down_conv"] = _conv(sd, f"{pre}.downsample.0")
                bp["down_bn"], bs["down_bn"] = _bn(sd, f"{pre}.downsample.1")
            params[f"layer{li + 1}_{bi}"], stats[f"layer{li + 1}_{bi}"] = \
                bp, bs
    params["conv_param"] = _conv(sd, "conv_param")
    return {"params": params, "batch_stats": stats}


def get_backbone(arch: str, **kw) -> Tuple[nn.Module, Any]:
    """(module, converter) for a 3DDFA-zoo arch name — the jax analogue of
    ``getattr(models, kvs['arch'])(...)`` (extract_init_states/utils/onnx.py:17).

    kw mirrors the reference configs: num_classes (num_params), widen_factor,
    mode.
    """
    if arch == "mobilenet":
        from dawn_tpu.models.face3d.mobilenet import (MobileNetV1,
                                                      convert_mobilenet)
        return (MobileNetV1(num_classes=kw.get("num_classes", 62),
                            widen_factor=kw.get("widen_factor", 1.0)),
                convert_mobilenet)
    if arch == "mobilenet_v3":
        mode = kw.get("mode", "small")
        return (MobileNetV3(num_classes=kw.get("num_classes", 62),
                            widen_factor=kw.get("widen_factor", 1.0),
                            mode=mode),
                lambda sd: convert_mobilenet_v3(sd, mode=mode))
    if arch == "resnet22":
        return (ResNet22(num_classes=kw.get("num_classes", 62)),
                convert_resnet22)
    raise ValueError(f"unknown 3DDFA backbone arch: {arch!r}")
