"""VGG19 feature slices for the LFG perceptual loss (flax).

Capability parity with LFG/modules/model.py Vgg19 (:19-60): ImageNet
normalization then five relu-tap features = torchvision vgg19.features sliced
at [0:2), [2:7), [7:12), [12:21), [21:30) — i.e. taps after the relu of conv
positions 0, 5, 10, 19, 28. Weights convert from a torchvision-format
state_dict the user supplies (torchvision is not in this image); random init
otherwise — fine for smoke tests, required for real training.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

# torchvision vgg19.features conv positions (through the last one we need)
VGG19_CONVS = [
    (0, 64), (2, 64),
    (5, 128), (7, 128),
    (10, 256), (12, 256), (14, 256), (16, 256),
    (19, 512), (21, 512), (23, 512), (25, 512),
    (28, 512),
]
POOL_BEFORE = (5, 10, 19, 28)     # maxpool positions 4, 9, 18, 27
TAPS = (0, 5, 10, 19, 28)         # feature taps (after relu)
MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


class Vgg19Features(nn.Module):
    """x (N, H, W, 3) in [0,1] -> list of 5 relu feature maps."""

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        x = (x - MEAN) / STD
        feats = []
        for pos, width in VGG19_CONVS:
            if pos in POOL_BEFORE:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(width, (3, 3), padding=1, name=f"conv_{pos}")(x)
            x = nn.relu(x)
            if pos in TAPS:
                feats.append(x)
        return feats


def convert_vgg19_features(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """torchvision vgg19 'features.{i}.weight' state_dict -> flax params."""
    from dawn_tpu.weights.torch_convert import _np
    p: Dict[str, Any] = {}
    for pos, _ in VGG19_CONVS:
        key = (f"features.{pos}.weight" if f"features.{pos}.weight" in sd
               else f"{pos}.weight")
        w = _np(sd[key])
        p[f"conv_{pos}"] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": jnp.asarray(_np(sd[key.replace('weight', 'bias')])),
        }
    return {"params": p}
