"""PBnet transformer building blocks (flax.linen).

TPU-native equivalents of PBnet/src/models/architectures/transformerdecoder5.py
(rotary+bias Attention :23-99, cross Attention_2 :101-183, post-norm
DecoderLayer :185-207) and the torch nn.TransformerEncoderLayer used by the
encoder (post-norm, gelu).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from dawn_tpu.ops.rotary import rotary_cos_sin, apply_rotary


class RotaryBiasAttention(nn.Module):
    """Self-attention with partial rotary + additive pos bias.

    Matches transformerdecoder5.Attention: qkv from one input, scale applied
    to q BEFORE rotary, rotary dim = min(32, num_heads) (a reference quirk —
    only the first num_heads channels of each 32-dim head rotate).
    """
    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x: jax.Array, pos_bias: Optional[jax.Array] = None) -> jax.Array:
        b, n, c = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(z):
            return z.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        q = q * (self.dim_head ** -0.5)
        cos, sin = rotary_cos_sin(n, min(32, self.heads), dtype=x.dtype)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)

        sim = jnp.einsum("bhid,bhjd->bhij", q, k)
        if pos_bias is not None:
            sim = sim + pos_bias
        sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, hidden)
        return nn.Dense(c, use_bias=False, name="to_out")(out)


class RotaryBiasCrossAttention(nn.Module):
    """Cross-attention variant (separate q/k/v projections), same rotary/bias."""
    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, q_in, k_in, v_in, pos_bias=None) -> jax.Array:
        b, n, c = q_in.shape
        m = k_in.shape[1]
        hidden = self.heads * self.dim_head
        q = nn.Dense(hidden, use_bias=False, name="to_q")(q_in)
        k = nn.Dense(hidden, use_bias=False, name="to_k")(k_in)
        v = nn.Dense(hidden, use_bias=False, name="to_v")(v_in)

        def split_heads(z, ln):
            return z.reshape(b, ln, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q = split_heads(q, n) * (self.dim_head ** -0.5)
        k = split_heads(k, m)
        v = split_heads(v, m)
        cos_q, sin_q = rotary_cos_sin(n, min(32, self.heads), dtype=q_in.dtype)
        cos_k, sin_k = rotary_cos_sin(m, min(32, self.heads), dtype=q_in.dtype)
        q = apply_rotary(q, cos_q, sin_q)
        k = apply_rotary(k, cos_k, sin_k)

        sim = jnp.einsum("bhid,bhjd->bhij", q, k)
        if pos_bias is not None:
            sim = sim + pos_bias
        sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, hidden)
        return nn.Dense(c, use_bias=False, name="to_out")(out)


class PBnetDecoderLayer(nn.Module):
    """Post-norm decoder layer: self-attn, cross-attn to memory, gelu FFN."""
    heads: int
    ff_size: int
    deterministic: bool = True
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt, memory, tgt_mask=None, memory_mask=None):
        def drop(x):
            return nn.Dropout(self.dropout, deterministic=self.deterministic)(x)

        sa = RotaryBiasAttention(self.heads, name="self_attn")(tgt, tgt_mask)
        tgt = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(tgt + drop(sa))
        ca = RotaryBiasCrossAttention(self.heads, name="multihead_attn")(
            tgt, memory, memory, memory_mask)
        tgt = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(tgt + drop(ca))
        h = nn.Dense(self.ff_size, name="ffn_linear1")(tgt)
        h = drop(jax.nn.gelu(h, approximate=False))
        h = nn.Dense(tgt.shape[-1], name="ffn_linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm3")(tgt + drop(h))


class TorchTransformerEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer, post-norm, gelu, batch_first=False
    semantics folded into (B, N, C) layout."""
    heads: int
    ff_size: int
    deterministic: bool = True
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, key_padding_mask=None):
        """key_padding_mask: (B, N) True = masked (torch semantics of ~mask)."""
        b, n, c = x.shape
        dh = c // self.heads

        def drop(z):
            return nn.Dropout(self.dropout, deterministic=self.deterministic)(z)

        qkv = nn.Dense(3 * c, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(z):
            return z.reshape(b, n, self.heads, dh).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        sim = jnp.einsum("bhid,bhjd->bhij", q, k) * (dh ** -0.5)
        if key_padding_mask is not None:
            sim = jnp.where(key_padding_mask[:, None, None, :], -jnp.inf, sim)
        attn = jax.nn.softmax(sim, axis=-1)
        # torch MultiheadAttention drops the attention PROBABILITIES too
        attn = drop(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(c, name="out_proj")(out)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + drop(out))

        h = nn.Dense(self.ff_size, name="linear1")(x)
        h = drop(jax.nn.gelu(h, approximate=False))
        h = nn.Dense(c, name="linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + drop(h))


def sinusoidal_table(max_len: int, d_model: int) -> jnp.ndarray:
    """PositionalEncoding table (transformerreemb6.py:61-79)."""
    import numpy as np
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * (-np.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return jnp.asarray(pe)
