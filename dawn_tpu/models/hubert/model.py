"""HuBERT speech encoder in flax — the audio-conditioning backbone.

The reference runs HF torch ``HubertModel`` (facebook/hubert-large-ls960-ft)
on GPU as pipeline stage 2 (unified_video_generator.py:67-72, 433-499). Here
the same architecture runs on TPU: 7-layer conv feature extractor (stride 320,
receptive field 400), feature projection to the transformer width, conv
positional embedding, and a pre-LN ("stable layer norm") transformer stack —
the hubert-large configuration. Weights convert from the HF torch checkpoint
via dawn_tpu.weights.hubert_convert.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = True
    feat_extract_norm: str = "layer"      # 'layer' (large) | 'group' (base)
    do_stable_layer_norm: bool = True     # pre-LN stack (large)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5

    @classmethod
    def large(cls) -> "HubertConfig":
        return cls()

    @property
    def total_stride(self) -> int:
        s = 1
        for st in self.conv_stride:
            s *= st
        return s


class FeatureExtractor(nn.Module):
    """Raw waveform (B, S) -> frame features (B, T, conv_dim[-1])."""
    config: HubertConfig

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        cfg = self.config
        x = wav[:, :, None]                        # (B, S, 1)
        for i, (dim, k, s) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel,
                                            cfg.conv_stride)):
            x = nn.Conv(dim, (k,), strides=(s,), padding="VALID",
                        use_bias=cfg.conv_bias, name=f"conv_{i}")(x)
            if cfg.feat_extract_norm == "layer":
                x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                 name=f"layer_norm_{i}")(x)
            elif i == 0:                           # 'group': GN after conv 0 only
                x = nn.GroupNorm(num_groups=dim, epsilon=cfg.layer_norm_eps,
                                 name="group_norm")(x)
            x = jax.nn.gelu(x, approximate=False)
        return x


class PosConvEmbedding(nn.Module):
    """Grouped conv positional embedding (kernel 128, groups 16)."""
    config: HubertConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        k = cfg.num_conv_pos_embeddings
        y = nn.Conv(cfg.hidden_size, (k,), padding=k // 2,
                    feature_group_count=cfg.num_conv_pos_embedding_groups,
                    name="conv")(x)
        if k % 2 == 0:
            y = y[:, :-1]                           # HF removes the extra step
        return jax.nn.gelu(y, approximate=False)


class EncoderLayer(nn.Module):
    """Pre-LN transformer layer (stable-layer-norm variant, hubert-large)."""
    config: HubertConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm")(x)
        b, t, c = h.shape
        nh = cfg.num_attention_heads
        dh = c // nh
        q = nn.Dense(c, name="q_proj")(h) * (dh ** -0.5)
        k = nn.Dense(c, name="k_proj")(h)
        v = nn.Dense(c, name="v_proj")(h)

        def split(z):
            return z.reshape(b, t, nh, dh).transpose(0, 2, 1, 3)

        q, k, v = map(split, (q, k, v))
        sim = jnp.einsum("bhid,bhjd->bhij", q, k)
        attn = jax.nn.softmax(sim, axis=-1)
        o = jnp.einsum("bhij,bhjd->bhid", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, c)
        x = x + nn.Dense(c, name="out_proj")(o)

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="final_layer_norm")(x)
        h = nn.Dense(cfg.intermediate_size, name="intermediate_dense")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(c, name="output_dense")(h)
        return x + h


class HubertModel(nn.Module):
    """wav (B, S) float32 (zero-mean/unit-var normalized) -> (B, T, hidden)."""
    config: HubertConfig = HubertConfig.large()

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        cfg = self.config
        x = FeatureExtractor(cfg, name="feature_extractor")(wav)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="fp_layer_norm")(x)
        x = nn.Dense(cfg.hidden_size, name="fp_projection")(x)
        x = x + PosConvEmbedding(cfg, name="pos_conv_embed")(x)
        if not cfg.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="encoder_layer_norm")(x)
        for i in range(cfg.num_hidden_layers):
            x = EncoderLayer(cfg, name=f"layers_{i}")(x)
        if cfg.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="encoder_layer_norm")(x)
        return x
