"""PBnet encoder/decoder architectures (the deployed 'reemb + rope' family).

Capability parity with PBnet/src/models/architectures/transformerreemb6.py:
- Encoder (:146-232): embeds Δpose (x - x0) + first-pose + audio into a
  384-d stream, torch TransformerEncoder (post-norm, gelu), per-frame mu /
  logvar heads.
- Decoder (:234-377): cat[first-pose emb, z, audio emb] -> 64-d queries,
  rotary + T5-bias temporal attention (hard ±100 window at eval,
  :119-123), custom decoder stack (transformerdecoder5.py), final linear to
  Δpose, padded frames zeroed.

transformerreemb5 shares this structure with minor differences handled by the
flags below; the factory in cvae.build_pbnet resolves archiname -> classes
like the reference's importlib mechanism (get_model.py:19-35).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from dawn_tpu.models.pbnet.layers import (
    PBnetDecoderLayer, RotaryBiasAttention, TorchTransformerEncoderLayer,
    sinusoidal_table,
)
from dawn_tpu.ops.norms import channel_layer_norm
from dawn_tpu.ops.t5bias import t5_bias_matrix, window_mask


class PBnetRelPosBias(nn.Module):
    """T5 relative position bias with a hard ±100 mask at eval time
    (transformerreemb6.py:81-129)."""
    heads: int
    num_buckets: int = 32
    max_distance: int = 32
    eval_window: Optional[int] = 100

    @nn.compact
    def __call__(self, n: int, use_eval_mask: bool = True) -> jax.Array:
        emb = self.param("relative_attention_bias",
                         nn.initializers.normal(1.0),
                         (self.num_buckets, self.heads))
        bias = t5_bias_matrix(emb, n, self.num_buckets, self.max_distance)
        if use_eval_mask and self.eval_window is not None:
            bias = bias + jnp.asarray(window_mask(n, self.eval_window))
        return bias  # (heads, n, n)


class EncoderTransformerReemb6(nn.Module):
    """Per-frame posterior q(z | pose, audio)."""
    pos_dim: int = 6
    audio_dim: int = 1024
    pose_latent_dim: int = 64
    audio_latent_dim: int = 256
    ff_size: int = 128
    num_layers: int = 2
    num_heads: int = 4
    dropout: float = 0.1
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array,
                 mask: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
        """x: (B, T, pos_dim) absolute pose; y: (B, T, audio_dim);
        mask: (B, T) True = valid. Returns mu/logvar (B, T, audio_latent)."""
        b, t, _ = x.shape
        latent = self.audio_latent_dim + 2 * self.pose_latent_dim

        x_ref = x[:, :1]
        dx = x - x_ref                               # Δpose vs frame 0 (:207-210)
        ref_emb = nn.Dense(self.pose_latent_dim, name="firstposeEmbedding")(x_ref)
        ref_emb = jnp.broadcast_to(ref_emb, (b, t, self.pose_latent_dim))
        dx_emb = nn.Dense(self.pose_latent_dim, name="poseEmbedding")(dx)
        y_emb = nn.Dense(self.audio_latent_dim, name="audioEmbedding")(y)
        h = jnp.concatenate([ref_emb, dx_emb, y_emb], axis=-1)   # (B, T, 384)

        h = h + sinusoidal_table(t, latent)[None]
        # the reference PositionalEncoding applies dropout after adding the
        # table (transformerreemb6.py:62-78)
        h = nn.Dropout(self.dropout, deterministic=self.deterministic)(h)
        kpm = None if mask is None else ~mask
        for i in range(self.num_layers):
            h = TorchTransformerEncoderLayer(
                self.num_heads, self.ff_size, self.deterministic, self.dropout,
                name=f"layers_{i}")(h, kpm)

        mu = nn.Dense(self.audio_latent_dim, name="mu_layer")(h)
        logvar = nn.Dense(self.audio_latent_dim, name="sigma_layer")(h)
        return {"mu": mu, "logvar": logvar, "x_delta": dx}


class DecoderTransformerReemb6(nn.Module):
    """p(Δpose | z, first pose, audio)."""
    pos_dim: int = 6
    audio_dim: int = 1024
    pose_latent_dim: int = 64
    audio_latent_dim: int = 256
    ff_size: int = 128
    num_layers: int = 2
    num_heads: int = 4
    num_buckets: int = 32
    max_distance: int = 32
    eval_window: Optional[int] = 100
    dropout: float = 0.1
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, z: jax.Array, y: jax.Array,
                 mask: Optional[jax.Array] = None) -> jax.Array:
        """x: (B, T, pos_dim) (only frame 0 is used); z: (B, T, audio_latent);
        y: (B, T, audio_dim); mask: (B, T) True = valid.
        Returns Δpose (B, T, pos_dim)."""
        b, t, _ = y.shape

        x_ref = x[:, :1]
        ref_emb = nn.Dense(self.pose_latent_dim, name="firstposeEmbedding")(
            jnp.broadcast_to(x_ref, (b, t, x_ref.shape[-1])))
        y_emb = nn.Dense(self.audio_latent_dim, name="audioEmbedding")(y)
        mem = jnp.concatenate([ref_emb, z, y_emb], axis=-1)
        mem = nn.Dense(self.pose_latent_dim, name="ztimelinear")(mem)

        bias_tgt = PBnetRelPosBias(self.num_heads, self.num_buckets,
                                   self.max_distance, self.eval_window,
                                   name="time_rel_pos_bias_tgt")(
            t, use_eval_mask=self.deterministic)
        bias_mem = PBnetRelPosBias(self.num_heads, self.num_buckets,
                                   self.max_distance, self.eval_window,
                                   name="time_rel_pos_bias_mem")(
            t, use_eval_mask=self.deterministic)
        bias_tgt = jnp.broadcast_to(bias_tgt[None], (b,) + bias_tgt.shape)
        bias_mem = jnp.broadcast_to(bias_mem[None], (b,) + bias_mem.shape)

        q = jnp.zeros((b, t, self.pose_latent_dim), mem.dtype)   # timequeries
        q = nn.Dense(self.pose_latent_dim, name="init_proj")(q)

        # Residual(PreNorm(gamma-LN, rotary attention)) (:357)
        gamma = self.param("init_attn_norm_gamma", nn.initializers.ones,
                           (self.pose_latent_dim,))
        qn = channel_layer_norm(q, gamma)
        q = q + RotaryBiasAttention(self.num_heads, name="init_temporal_attn")(
            qn, bias_tgt)

        for i in range(self.num_layers):
            q = PBnetDecoderLayer(self.num_heads, self.ff_size,
                                  self.deterministic, self.dropout,
                                  name=f"decoder_layers_{i}")(
                q, mem, bias_tgt, bias_mem)

        out = nn.Dense(self.pos_dim, name="finallayer")(q)
        if mask is not None:
            out = out * mask[..., None]
        return out


# --------------------------------------------------------------------------
# Ablation architectures from the reference registry (get_model.py:16).
# The upstream gru.py / fc.py are ACTOR leftovers built around action-class
# conditioning and a sequence-level latent; here they are adapted to DAWN's
# audio-conditioned per-frame-latent CVAE contract (same (x, z, y, mask)
# interface as the reemb family) so the factory can instantiate every
# registered archiname.
# --------------------------------------------------------------------------


class EncoderGRU(nn.Module):
    """GRU posterior (reference gru.py:41-93, audio-conditioned variant)."""
    pos_dim: int = 6
    audio_dim: int = 1024
    pose_latent_dim: int = 64
    audio_latent_dim: int = 256
    num_layers: int = 2
    deterministic: bool = True
    dropout: float = 0.0
    num_heads: int = 4     # unused; keeps the factory kwargs uniform
    ff_size: int = 128     # unused

    @nn.compact
    def __call__(self, x, y, mask=None):
        b, t, _ = x.shape
        dx = x - x[:, :1]
        ref = jnp.broadcast_to(
            nn.Dense(self.pose_latent_dim, name="firstposeEmbedding")(x[:, :1]),
            (b, t, self.pose_latent_dim))
        h = jnp.concatenate([
            ref,
            nn.Dense(self.pose_latent_dim, name="poseEmbedding")(dx),
            nn.Dense(self.audio_latent_dim, name="audioEmbedding")(y)], -1)
        h = nn.Dense(self.audio_latent_dim, name="feats_embedding")(h)
        for i in range(self.num_layers):
            h = nn.RNN(nn.GRUCell(self.audio_latent_dim), name=f"gru_{i}")(h)
        return {"mu": nn.Dense(self.audio_latent_dim, name="mu_layer")(h),
                "logvar": nn.Dense(self.audio_latent_dim, name="sigma_layer")(h),
                "x_delta": dx}


class DecoderGRU(nn.Module):
    """GRU decoder (reference gru.py:95-160, audio-conditioned variant)."""
    pos_dim: int = 6
    audio_dim: int = 1024
    pose_latent_dim: int = 64
    audio_latent_dim: int = 256
    num_layers: int = 2
    deterministic: bool = True
    dropout: float = 0.0
    num_heads: int = 4
    ff_size: int = 128
    num_buckets: int = 32
    max_distance: int = 32
    eval_window: Optional[int] = None

    @nn.compact
    def __call__(self, x, z, y, mask=None):
        b, t, _ = y.shape
        ref = jnp.broadcast_to(
            nn.Dense(self.pose_latent_dim, name="firstposeEmbedding")(x[:, :1]),
            (b, t, self.pose_latent_dim))
        h = jnp.concatenate(
            [ref, z, nn.Dense(self.audio_latent_dim, name="audioEmbedding")(y)], -1)
        h = nn.Dense(self.audio_latent_dim, name="feats_embedding")(h)
        for i in range(self.num_layers):
            h = nn.RNN(nn.GRUCell(self.audio_latent_dim), name=f"gru_{i}")(h)
        out = nn.Dense(self.pos_dim, name="final_layer")(h)
        if mask is not None:
            out = out * mask[..., None]
        return out


class EncoderFC(nn.Module):
    """Per-frame MLP posterior (reference fc.py:6-55, per-frame variant)."""
    pos_dim: int = 6
    audio_dim: int = 1024
    pose_latent_dim: int = 64
    audio_latent_dim: int = 256
    num_layers: int = 2
    deterministic: bool = True
    dropout: float = 0.0
    num_heads: int = 4
    ff_size: int = 128

    @nn.compact
    def __call__(self, x, y, mask=None):
        b, t, _ = x.shape
        dx = x - x[:, :1]
        ref = jnp.broadcast_to(
            nn.Dense(self.pose_latent_dim, name="firstposeEmbedding")(x[:, :1]),
            (b, t, self.pose_latent_dim))
        h = jnp.concatenate([
            ref,
            nn.Dense(self.pose_latent_dim, name="poseEmbedding")(dx),
            nn.Dense(self.audio_latent_dim, name="audioEmbedding")(y)], -1)
        h = nn.gelu(nn.Dense(512, name="fc1")(h), approximate=False)
        h = nn.gelu(nn.Dense(256, name="fc2")(h), approximate=False)
        return {"mu": nn.Dense(self.audio_latent_dim, name="mu_layer")(h),
                "logvar": nn.Dense(self.audio_latent_dim, name="sigma_layer")(h),
                "x_delta": dx}


class DecoderFC(nn.Module):
    """Per-frame MLP decoder (reference fc.py:57-105, per-frame variant)."""
    pos_dim: int = 6
    audio_dim: int = 1024
    pose_latent_dim: int = 64
    audio_latent_dim: int = 256
    num_layers: int = 2
    deterministic: bool = True
    dropout: float = 0.0
    num_heads: int = 4
    ff_size: int = 128
    num_buckets: int = 32
    max_distance: int = 32
    eval_window: Optional[int] = None

    @nn.compact
    def __call__(self, x, z, y, mask=None):
        b, t, _ = y.shape
        ref = jnp.broadcast_to(
            nn.Dense(self.pose_latent_dim, name="firstposeEmbedding")(x[:, :1]),
            (b, t, self.pose_latent_dim))
        h = jnp.concatenate(
            [ref, z, nn.Dense(self.audio_latent_dim, name="audioEmbedding")(y)], -1)
        h = nn.gelu(nn.Dense(256, name="fc1")(h), approximate=False)
        h = nn.gelu(nn.Dense(512, name="fc2")(h), approximate=False)
        out = nn.Dense(self.pos_dim, name="final_layer")(h)
        if mask is not None:
            out = out * mask[..., None]
        return out
