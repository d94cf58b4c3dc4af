"""FaceBoxes detection CNN in flax (the detector backbone).

Capability parity with the reference's FaceBoxesProd network (the .pth that
extract_init_states/FaceBoxes/FaceBoxes_ONNX.py exports to ONNX on first
run): RDCL (rapidly-digested conv layers with CReLU), inception-v2-style
multi-branch blocks, and multi-scale loc/conf heads over the three anchor
strides (32/64/128). Weights convert from the torch .pth when supplied;
the post-processing lives in dawn_tpu.pipeline.face_prep.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


class ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x, relu=True):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=self.padding, use_bias=False,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn")(x)
        return nn.relu(x) if relu else x


class CReLUConv(nn.Module):
    """Conv + BN + CReLU (concat(relu(x), relu(-x))) — the RDCL trick."""
    features: int
    kernel: int
    stride: int
    padding: int

    @nn.compact
    def __call__(self, x):
        x = ConvBN(self.features, self.kernel, self.stride, self.padding,
                   name="convbn")(x, relu=False)
        return jnp.concatenate([nn.relu(x), nn.relu(-x)], axis=-1)


class Inception(nn.Module):
    """FaceBoxes inception block: four 32-channel branches -> 128 channels."""

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(32, 1, name="branch1x1")(x)
        b2 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        b2 = ConvBN(32, 1, name="branch1x1_2")(b2)
        b3 = ConvBN(24, 1, name="branch3x3_reduce")(x)
        b3 = ConvBN(32, 3, padding=1, name="branch3x3")(b3)
        b4 = ConvBN(24, 1, name="branch3x3_reduce_2")(x)
        b4 = ConvBN(32, 3, padding=1, name="branch3x3_2")(b4)
        b4 = ConvBN(32, 3, padding=1, name="branch3x3_3")(b4)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class FaceBoxesNet(nn.Module):
    """BGR-mean-subtracted image (N, H, W, 3) -> (loc (N, A, 4), conf (N, A, 2))."""
    num_classes: int = 2

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array]:
        # RDCL: 7x7/4 CReLU + pool, 5x5/2 CReLU + pool
        x = CReLUConv(24, 7, 4, 3, name="conv1")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = CReLUConv(64, 5, 2, 2, name="conv2")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        x = Inception(name="inception1")(x)
        x = Inception(name="inception2")(x)
        x = Inception(name="inception3")(x)
        f1 = x                                        # stride 32, 128ch

        x = ConvBN(128, 1, name="conv3_1")(x)
        x = ConvBN(256, 3, stride=2, padding=1, name="conv3_2")(x)
        f2 = x                                        # stride 64, 256ch

        x = ConvBN(128, 1, name="conv4_1")(x)
        x = ConvBN(256, 3, stride=2, padding=1, name="conv4_2")(x)
        f3 = x                                        # stride 128, 256ch

        # heads: 21 anchors/cell at stride 32 (densified), 1 at 64 and 128
        locs, confs = [], []
        for i, (feat, na) in enumerate(((f1, 21), (f2, 1), (f3, 1))):
            loc = nn.Conv(na * 4, (3, 3), padding=1, name=f"loc_{i}")(feat)
            conf = nn.Conv(na * self.num_classes, (3, 3), padding=1,
                           name=f"conf_{i}")(feat)
            n = feat.shape[0]
            locs.append(loc.reshape(n, -1, 4))
            confs.append(conf.reshape(n, -1, self.num_classes))
        loc = jnp.concatenate(locs, axis=1)
        conf = jax.nn.softmax(jnp.concatenate(confs, axis=1), axis=-1)
        return loc, conf
