"""Functional torch-compatible convolutions on NHWC arrays.

Weight layout convention across this package: conv kernels are stored HWIO
(kh, kw, in, out) — the converter in dawn_tpu.weights transposes from torch's
OIHW. ConvTranspose kernels are stored HWIO with I = torch's in_channels
(weight already flipped/transposed at conversion time so the hot path is a
single lax.conv_general_dilated).
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _pair(v: Union[int, Sequence[int]]) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    return tuple(v)  # type: ignore[return-value]


def conv2d_torch(x: jax.Array, weight: jax.Array, bias=None,
                 stride: Union[int, Sequence[int]] = 1,
                 padding: Union[int, Sequence[int]] = 0,
                 groups: int = 1) -> jax.Array:
    """torch nn.Conv2d semantics on NHWC input with HWIO weight."""
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    out = lax.conv_general_dilated(
        x, weight.astype(x.dtype),
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=_DN,
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def conv_transpose2d_torch(x: jax.Array, weight_flipped: jax.Array, bias=None,
                           stride: Union[int, Sequence[int]] = 2,
                           padding: Union[int, Sequence[int]] = 1) -> jax.Array:
    """torch nn.ConvTranspose2d as an lhs-dilated conv.

    ``weight_flipped`` must be HWIO with I = torch in_channels, O = torch
    out_channels, spatially flipped (the converter does both transforms once).
    Equivalent to conv(x dilated by stride, pad k-1-p, flipped kernel).
    """
    kh, kw = weight_flipped.shape[0], weight_flipped.shape[1]
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    out = lax.conv_general_dilated(
        x, weight_flipped.astype(x.dtype),
        window_strides=(1, 1),
        padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
        lhs_dilation=(sh, sw),
        dimension_numbers=_DN,
    )
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def depthwise_conv2d(x: jax.Array, kernel_hw: jax.Array,
                     padding: Tuple[Tuple[int, int], Tuple[int, int]],
                     stride: int = 1) -> jax.Array:
    """Depthwise conv with one shared (kh, kw) kernel per channel (NHWC)."""
    c = x.shape[-1]
    kh, kw = kernel_hw.shape
    w = jnp.broadcast_to(kernel_hw[:, :, None, None], (kh, kw, 1, c)).astype(x.dtype)
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=_DN, feature_group_count=c,
    )


def torch_conv_weight(w) -> jnp.ndarray:
    """OIHW (torch Conv2d) -> HWIO."""
    return jnp.transpose(jnp.asarray(w), (2, 3, 1, 0))


def torch_conv_transpose_weight(w) -> jnp.ndarray:
    """torch ConvTranspose2d (in, out, kh, kw) -> flipped HWIO (I=in, O=out)."""
    w = jnp.transpose(jnp.asarray(w), (2, 3, 0, 1))
    return w[::-1, ::-1]
