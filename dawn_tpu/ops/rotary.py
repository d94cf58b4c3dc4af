"""Rotary position embedding matching rotary-embedding-torch semantics.

The reference uses lucidrains' rotary-embedding-torch with default settings
(interleaved GPT-J pair rotation, theta=10000, partial rotation when
``dim < head_dim``: only the first ``dim`` channels are rotated, the rest pass
through). Used by the DM UNet temporal attention (RotaryEmbedding(32) on
head_dim 32 => full rotation) and PBnet's decoder (RotaryEmbedding(min(32,
num_heads)) => partial rotation of the first ``num_heads`` channels —
a reference quirk we replicate exactly for checkpoint parity).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def rotary_cos_sin(seq_len: int, rot_dim: int, theta: float = 10000.0,
                   dtype=jnp.float32):
    """Return (cos, sin), each (seq_len, rot_dim) with pairwise-repeated freqs."""
    inv_freq = 1.0 / (theta ** (np.arange(0, rot_dim, 2)[: rot_dim // 2] / rot_dim))
    t = np.arange(seq_len, dtype=np.float64)
    freqs = np.outer(t, inv_freq)            # (seq, rot_dim // 2)
    freqs = np.repeat(freqs, 2, axis=-1)     # (seq, rot_dim), pairs interleaved
    return jnp.asarray(np.cos(freqs), dtype), jnp.asarray(np.sin(freqs), dtype)


def _rotate_half(x: jax.Array) -> jax.Array:
    """(x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate the first rot_dim channels of x (..., seq, d); seq axis is -2."""
    rot_dim = cos.shape[-1]
    xr = x[..., :rot_dim]
    rotated = xr * cos + _rotate_half(xr) * sin
    if rot_dim == x.shape[-1]:
        return rotated
    return jnp.concatenate([rotated, x[..., rot_dim:]], axis=-1)
