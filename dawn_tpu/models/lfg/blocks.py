"""LFG conv building blocks (flax.linen, NHWC).

TPU-native equivalents of LFG/modules/util.py:70-150 (SameBlock2d /
DownBlock2d / UpBlock2d / ResBlock2d) and the Hourglass encoder/decoder
(:153-214). BatchNorm supports three modes:
  - inference with running stats (the DAWN pipeline hot path),
  - training with per-host batch stats,
  - training with cross-replica stats via ``axis_name`` psum — the exact
    math of the reference's SynchronizedBatchNorm2d (sync_batchnorm/
    batchnorm.py:49-80) expressed as one collective.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dawn_tpu.ops.resample import avg_pool_2x2, interpolate_nearest


class SyncBatchNorm(nn.Module):
    """BatchNorm2d with optional cross-device stat reduction (psum).

    Running-stat update matches torch momentum=0.1 (new = 0.9*old + 0.1*batch),
    with the unbiased variance stored, as torch does.
    """
    use_running_average: bool = True
    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_dtype = x.dtype
        x = x.astype(jnp.float32)      # stats + affine in f32 (bf16-safe)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", jnp.zeros, (c,))
        ra_var = self.variable("batch_stats", "var", jnp.ones, (c,))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # (sum, sum-of-squares, count) reduction; psum across replicas
            # reproduces SyncMaster's ReduceAddCoalesced math exactly.
            s = x.sum(axis=(0, 1, 2))
            ss = jnp.square(x).sum(axis=(0, 1, 2))
            cnt = jnp.asarray(x.shape[0] * x.shape[1] * x.shape[2], x.dtype)
            if self.axis_name is not None:
                s = jax.lax.psum(s, self.axis_name)
                ss = jax.lax.psum(ss, self.axis_name)
                cnt = jax.lax.psum(cnt, self.axis_name)
            mean = s / cnt
            var = ss / cnt - jnp.square(mean)
            if not self.is_initializing():
                unbiased = var * (cnt / jnp.maximum(cnt - 1.0, 1.0))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return (x * inv + (bias - mean * inv)).astype(in_dtype)


class SameBlock2d(nn.Module):
    """conv(k7, p3) + BN + relu. Reference: LFG/modules/util.py:136-150."""
    features: int
    kernel_size: int = 7
    train_bn: bool = False
    bn_axis: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.kernel_size // 2
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    padding=p, dtype=self.dtype, name="conv")(x.astype(self.dtype))
        x = SyncBatchNorm(use_running_average=not self.train_bn,
                          axis_name=self.bn_axis, name="norm")(x)
        return nn.relu(x)


class DownBlock2d(nn.Module):
    """conv(k3, p1) + BN + relu + avgpool2. Reference: util.py:115-133."""
    features: int
    train_bn: bool = False
    bn_axis: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(x.astype(self.dtype))
        x = SyncBatchNorm(use_running_average=not self.train_bn,
                          axis_name=self.bn_axis, name="norm")(x)
        return avg_pool_2x2(nn.relu(x))


class UpBlock2d(nn.Module):
    """nearest x2 + conv(k3, p1) + BN + relu. Reference: util.py:96-112."""
    features: int
    train_bn: bool = False
    bn_axis: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        x = interpolate_nearest(x.astype(self.dtype), h * 2, w * 2)
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(x)
        x = SyncBatchNorm(use_running_average=not self.train_bn,
                          axis_name=self.bn_axis, name="norm")(x)
        return nn.relu(x)


class ResBlock2d(nn.Module):
    """(BN-relu-conv) x2 + residual. Reference: util.py:70-93."""
    train_bn: bool = False
    bn_axis: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = x.astype(self.dtype)
        h = SyncBatchNorm(use_running_average=not self.train_bn,
                          axis_name=self.bn_axis, name="norm1")(x)
        h = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(nn.relu(h))
        h = SyncBatchNorm(use_running_average=not self.train_bn,
                          axis_name=self.bn_axis, name="norm2")(h)
        h = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(nn.relu(h))
        return h + x


class HourglassEncoder(nn.Module):
    """Reference: util.py:153-171 (returns all intermediate feature maps)."""
    block_expansion: int
    num_blocks: int = 3
    max_features: int = 256
    train_bn: bool = False
    bn_axis: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Sequence[jax.Array]:
        outs = [x]
        for i in range(self.num_blocks):
            feats = min(self.max_features, self.block_expansion * (2 ** (i + 1)))
            outs.append(DownBlock2d(feats, self.train_bn, self.bn_axis,
                                    dtype=self.dtype,
                                    name=f"down_{i}")(outs[-1]))
        return outs


class HourglassDecoder(nn.Module):
    """Reference: util.py:174-198 (upsample + skip concat)."""
    block_expansion: int
    in_features: int
    num_blocks: int = 3
    max_features: int = 256
    train_bn: bool = False
    bn_axis: Optional[str] = None
    dtype: Any = jnp.float32

    @property
    def out_filters(self) -> int:
        return self.block_expansion + self.in_features

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array]) -> jax.Array:
        xs = list(xs)
        out = xs.pop()
        for j, i in enumerate(range(self.num_blocks)[::-1]):
            feats = min(self.max_features, self.block_expansion * (2 ** i))
            out = UpBlock2d(feats, self.train_bn, self.bn_axis,
                            dtype=self.dtype, name=f"up_{j}")(out)
            out = jnp.concatenate([out, xs.pop().astype(out.dtype)], axis=-1)
        return out


class Hourglass(nn.Module):
    """Reference: util.py:201-214."""
    block_expansion: int
    in_features: int
    num_blocks: int = 3
    max_features: int = 256
    train_bn: bool = False
    bn_axis: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> jax.Array:
        feats = HourglassEncoder(self.block_expansion, self.num_blocks,
                                 self.max_features, self.train_bn, self.bn_axis,
                                 dtype=self.dtype, name="encoder")(x)
        return HourglassDecoder(self.block_expansion, self.in_features,
                                self.num_blocks, self.max_features,
                                self.train_bn, self.bn_axis, dtype=self.dtype,
                                name="decoder")(feats)
