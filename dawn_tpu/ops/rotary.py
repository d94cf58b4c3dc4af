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


def _pair_swap_matrix(d: int) -> np.ndarray:
    """(d, d) constant with out = x @ R == the interleaved pair rotation
    (x0, x1, ...) -> (-x1, x0, ...). Entries are exactly ±1 so the product
    equals the shuffle bit-for-bit in any float dtype (each output column
    has a single nonzero term)."""
    r = np.zeros((d, d), np.float32)
    idx = np.arange(0, d - 1, 2)
    r[idx + 1, idx] = -1.0
    r[idx, idx + 1] = 1.0
    return r


def _rotate_half(x: jax.Array) -> jax.Array:
    """(x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...).

    Implemented as a matmul by a constant pair-swap matrix instead of
    stride-2 lane slicing + stack: on TPU the strided form lowers to lane
    shuffles that cost ~21 ms per 256^2 top-level attention op (measured
    scan-amortized, 2026-08-17) vs ~1 ms for the MXU form, which also
    fuses into the surrounding elementwise multiply-adds."""
    d = x.shape[-1]
    return x @ jnp.asarray(_pair_swap_matrix(d), x.dtype)


def apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate the first rot_dim channels of x (..., seq, d); seq axis is -2."""
    rot_dim = cos.shape[-1]
    xr = x[..., :rot_dim]
    rotated = xr * cos + _rotate_half(xr) * sin
    if rot_dim == x.shape[-1]:
        return rotated
    return jnp.concatenate([rotated, x[..., rot_dim:]], axis=-1)


def flat_rotary_constants(seq_len: int, rot_dim: int, heads: int,
                          dim_head: int, theta: float = 10000.0,
                          dtype=jnp.float32):
    """Constants for rotary in the flat heads-in-lanes layout (..., t, H*D).

    Returns (cos_f, sin_f, R): cos_f/sin_f (seq_len, heads*dim_head) and R
    (heads*dim_head, heads*dim_head) such that

        rotated = x * cos_f + (x @ R) * sin_f

    equals ``apply_rotary`` on the split-heads (..., t, heads, dim_head)
    view, bit-for-bit (verified max-diff 0.0 in tests). Motivation: the
    packed attention kernel keeps heads in the lane dim; rotating in that
    layout avoids the 5-D reshape round-trip and tiles the minor dim at
    heads*dim_head (>=128 lanes) instead of dim_head — measured on the
    256^2 top-level shape this cut the TemporalAttention module from
    33.0 to 23.2 ms/op (44.4 before the matmul rotate-half). Partial
    rotation (rot_dim < dim_head) is encoded in the constants: pass-through
    channels get cos=1, sin=0 and zero rows/cols in R.
    """
    inv_freq = 1.0 / (theta ** (np.arange(0, rot_dim, 2)[: rot_dim // 2]
                                / rot_dim))
    t = np.arange(seq_len, dtype=np.float64)
    freqs = np.repeat(np.outer(t, inv_freq), 2, axis=-1)   # (t, rot_dim)
    pad = dim_head - rot_dim
    cos = np.concatenate(
        [np.cos(freqs), np.ones((seq_len, pad))], axis=-1)
    sin = np.concatenate(
        [np.sin(freqs), np.zeros((seq_len, pad))], axis=-1)
    r = np.zeros((dim_head, dim_head), np.float32)
    r[: rot_dim, : rot_dim] = _pair_swap_matrix(rot_dim)
    rb = np.kron(np.eye(heads, dtype=np.float32), r)
    return (jnp.asarray(np.tile(cos, (1, heads)), dtype),
            jnp.asarray(np.tile(sin, (1, heads)), dtype),
            jnp.asarray(rb, dtype))


def apply_rotary_flat(x: jax.Array, cos_f: jax.Array, sin_f: jax.Array,
                      r: jax.Array) -> jax.Array:
    """Rotary in the flat (..., t, heads*dim_head) layout; see
    :func:`flat_rotary_constants`."""
    return x * cos_f + (x @ r) * sin_f
