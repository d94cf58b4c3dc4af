"""MobileNet-V1 3DMM regressor in flax (the 3DDFA 'mb1_120x120' backbone).

Capability parity with extract_init_states/models/mobilenet_v1.py: conv1 +
13 depthwise-separable blocks + global average pool + fc to the 62-d 3DMM
parameter vector. Input is the (120, 120) face crop normalized
(x - 127.5) / 128 (TDDFA_ONNX.py:92-94). Weights convert from the shipped
mb1 .pth when the user supplies it.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

# (name, out_channels, stride) for widen_factor 1.0
DW_BLOCKS = [
    ("dw2_1", 64, 1), ("dw2_2", 128, 2),
    ("dw3_1", 128, 1), ("dw3_2", 256, 2),
    ("dw4_1", 256, 1), ("dw4_2", 512, 2),
    ("dw5_1", 512, 1), ("dw5_2", 512, 1), ("dw5_3", 512, 1),
    ("dw5_4", 512, 1), ("dw5_5", 512, 1), ("dw5_6", 1024, 2),
    ("dw6", 1024, 1),
]


class DepthWiseBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), strides=self.stride, padding=1,
                    feature_group_count=c, use_bias=False, name="conv_dw")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn_dw")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, name="conv_sep")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn_sep")(x)
        return nn.relu(x)


class MobileNetV1(nn.Module):
    num_classes: int = 62
    # mb05_120x120.yml:2 sets 0.5; channel widths scale by plain int()
    # truncation exactly as mobilenet_v1.py:67-84 does
    widen_factor: float = 1.0

    @nn.compact
    def __call__(self, x):
        wf = self.widen_factor
        x = nn.Conv(int(32 * wf), (3, 3), strides=2, padding=1,
                    use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        for name, feats, stride in DW_BLOCKS:
            x = DepthWiseBlock(int(feats * wf), stride, name=name)(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc")(x)


def convert_mobilenet(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """torch MobileNet state_dict -> flax variables (params + batch_stats).

    Accepts the mb1 checkpoint layout (possibly 'module.' prefixed).
    """
    from dawn_tpu.weights.torch_convert import _np

    sd = {k.replace("module.", ""): v for k, v in sd.items()}

    def conv(name, groups=False):
        w = _np(sd[f"{name}.weight"])            # (O, I/g, kh, kw)
        if groups:
            # torch depthwise (C, 1, k, k) -> flax HWIO (k, k, 1, C)
            return {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
        return {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}

    def bn(name):
        return ({"scale": jnp.asarray(_np(sd[f"{name}.weight"])),
                 "bias": jnp.asarray(_np(sd[f"{name}.bias"]))},
                {"mean": jnp.asarray(_np(sd[f"{name}.running_mean"])),
                 "var": jnp.asarray(_np(sd[f"{name}.running_var"]))})

    params: Dict[str, Any] = {"conv1": conv("conv1")}
    stats: Dict[str, Any] = {}
    p, s = bn("bn1")
    params["bn1"], stats["bn1"] = p, s
    for name, _, _ in DW_BLOCKS:
        bp: Dict[str, Any] = {"conv_dw": conv(f"{name}.conv_dw", groups=True),
                              "conv_sep": conv(f"{name}.conv_sep")}
        bs: Dict[str, Any] = {}
        p, s = bn(f"{name}.bn_dw")
        bp["bn_dw"], bs["bn_dw"] = p, s
        p, s = bn(f"{name}.bn_sep")
        bp["bn_sep"], bs["bn_sep"] = p, s
        params[name] = bp
        stats[name] = bs
    params["fc"] = {"kernel": jnp.asarray(_np(sd["fc.weight"]).T),
                    "bias": jnp.asarray(_np(sd["fc.bias"]))}
    return {"params": params, "batch_stats": stats}
