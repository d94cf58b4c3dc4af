"""Normalization primitives matching the reference's torch semantics (NHWC).

Covers:
- torch ``nn.GroupNorm`` (DM UNet Block, ca_multi_test.py:226-237)
- the UNet's channel LayerNorm with gamma only and biased variance
  (ca_multi_test.py LayerNorm/LayerNorm_img)
- standard torch ``nn.LayerNorm`` (PBnet decoder layers)
- BatchNorm2d inference with running stats (LFG blocks; sync-BN at train time
  is the psum variant in dawn_tpu.parallel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm(x: jax.Array, num_groups: int, weight: jax.Array,
               bias: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch nn.GroupNorm on NHWC input (normalizes over H, W and group chans)."""
    n, h, w, c = x.shape
    xg = x.reshape(n, h, w, num_groups, c // num_groups)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = jnp.square(xg - mean).mean(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(n, h, w, c)
    return x * weight + bias


def channel_layer_norm_core(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """The gamma-free core of :func:`channel_layer_norm`:
    (x - mean) * rsqrt(var + eps). Shared by the fused 3-way condition
    cross-attention, whose three branches normalize the SAME tokens and
    differ only in gamma (unet3d.ResnetBlockCaMul)."""
    mean = x.mean(axis=-1, keepdims=True)
    var = jnp.square(x - mean).mean(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def channel_layer_norm(x: jax.Array, gamma: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the channel (last) axis with gamma only, biased variance.

    Matches the UNet's LayerNorm (over torch dim=1, our last dim):
    (x - mean) / sqrt(var + eps) * gamma.
    """
    return channel_layer_norm_core(x, eps) * gamma


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    """torch nn.LayerNorm over the last axis."""
    mean = x.mean(axis=-1, keepdims=True)
    var = jnp.square(x - mean).mean(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * weight + bias


def batch_norm_inference(x: jax.Array, mean: jax.Array, var: jax.Array,
                         weight: jax.Array, bias: jax.Array,
                         eps: float = 1e-5) -> jax.Array:
    """BatchNorm2d eval mode with running stats, NHWC (stats over channel)."""
    inv = jax.lax.rsqrt(var + eps) * weight
    return x * inv + (bias - mean * inv)
