"""PBnet ablation architectures: transformer / mlp / autotrans (faithful ports).

The reference registers these in ARCHINAMES (get_model.py:16) as ablation
alternatives to the deployed reemb family:

- ``transformer``: PBnet/src/models/architectures/transformer.py —
  Encoder_TRANSFORMER (:83) is structurally identical to the reemb6 encoder
  (sinusoidal PE + vanilla torch TransformerEncoder + per-frame mu/logvar);
  Decoder_TRANSFORMER (:170) is a vanilla torch TransformerDecoder at
  d_model = pose_latent_dim over zero time-queries with sinusoidal PE,
  memory = ztimelinear(cat[first-pose emb, per-frame z, audio emb]).
- ``mlp``: mlp.py — Encoder_MLP (:176) / Decoder_MLP (:232): a ResUnet
  (:117-175) over the Δpose "image" (1, seq_len, pos_dim) + a flat MLP over
  the concatenated [ref, pose/latent, audio] vector; SEQUENCE-level latent of
  width ff_size. NOTE (replicated reference bug): Encoder_MLP computes
  ``logvar = self.linear_means(x_out)`` (mlp.py:225) — linear_logvar exists
  but is never used; we replicate for checkpoint parity.
- ``autotrans``: autotrans.py — Encoder = Encoder_TRANSFORMER (:1), Decoder
  (:60) is ACTOR's autoregressive transformer decoder with teacher forcing,
  built on joeynmt-style pre-norm layers
  (architectures/tools/transformer_layers.py).

``transgru`` / ``grutrans`` are cross-combinations (transgru.py / grutrans.py)
— see cvae._ARCH_TABLE; the upstream halves are mutually interface-
incompatible (DEVIATIONS.md), so the factory pairs the DAWN-adapted halves.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from dawn_tpu.models.pbnet.layers import sinusoidal_table


# --------------------------------------------------------------------------
# torch nn.TransformerDecoderLayer parity (post-norm, packed in_proj MHA)
# --------------------------------------------------------------------------


class _TorchMHA(nn.Module):
    """torch nn.MultiheadAttention with packed in_proj (q from x, k/v from
    memory), post-scale 1/sqrt(head_dim), key-padding masking, attention-
    probability dropout (transformerdecoder.py:100)."""
    heads: int
    deterministic: bool = True
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q_in, kv_in, key_padding_mask=None):
        b, n, c = q_in.shape
        m = kv_in.shape[1]
        dh = c // self.heads
        w = self.param("in_proj_weight", nn.initializers.xavier_uniform(),
                       (3 * c, c))
        bb = self.param("in_proj_bias", nn.initializers.zeros, (3 * c,))
        q = q_in @ w[:c].T + bb[:c]
        k = kv_in @ w[c:2 * c].T + bb[c:2 * c]
        v = kv_in @ w[2 * c:].T + bb[2 * c:]

        def split(z, ln):
            return z.reshape(b, ln, self.heads, dh).transpose(0, 2, 1, 3)

        q, k, v = split(q, n), split(k, m), split(v, m)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k) * (dh ** -0.5)
        if key_padding_mask is not None:
            sim = jnp.where(key_padding_mask[:, None, None, :], -jnp.inf, sim)
        attn = jax.nn.softmax(sim, axis=-1)
        # the reference's copied MultiheadAttention drops the attention
        # probabilities (transformerdecoder.py:100)
        attn = nn.Dropout(self.dropout,
                          deterministic=self.deterministic)(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, name="out_proj")(out)


class TorchTransformerDecoderLayer(nn.Module):
    """torch nn.TransformerDecoderLayer (norm_first=False, gelu)."""
    heads: int
    ff_size: int
    deterministic: bool = True
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt, memory, tgt_key_padding_mask=None,
                 memory_key_padding_mask=None):
        def drop(z):
            return nn.Dropout(self.dropout, deterministic=self.deterministic)(z)

        sa = _TorchMHA(self.heads, self.deterministic, self.dropout,
                       name="self_attn")(tgt, tgt, tgt_key_padding_mask)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt + drop(sa))
        ca = _TorchMHA(self.heads, self.deterministic, self.dropout,
                       name="multihead_attn")(
            tgt, memory, memory_key_padding_mask)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt + drop(ca))
        h = nn.Dense(self.ff_size, name="linear1")(tgt)
        h = drop(jax.nn.gelu(h, approximate=False))
        h = nn.Dense(tgt.shape[-1], name="linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt + drop(h))


class DecoderTransformer(nn.Module):
    """Decoder_TRANSFORMER (transformer.py:170-285).

    memory = ztimelinear(cat[first-pose emb, z, audio emb]) per frame; tgt =
    zero time-queries + sinusoidal PE at d_model = pose_latent_dim; vanilla
    torch TransformerDecoder with tgt_key_padding_mask; final linear; padded
    frames zeroed.
    """
    pos_dim: int = 6
    audio_dim: int = 1024
    pose_latent_dim: int = 64
    audio_latent_dim: int = 256
    ff_size: int = 128
    num_layers: int = 2
    num_heads: int = 4
    dropout: float = 0.1
    deterministic: bool = True
    # unused; keeps the factory kwargs uniform with the reemb family
    num_buckets: int = 32
    max_distance: int = 32
    eval_window: Optional[int] = None

    @nn.compact
    def __call__(self, x, z, y, mask=None):
        """x: (B, T, pos_dim) (frame 0 used); z: (B, T, audio_latent);
        y: (B, T, audio_dim); mask: (B, T) True = valid."""
        b, t, _ = y.shape
        ref = jnp.broadcast_to(
            nn.Dense(self.pose_latent_dim, name="firstposeEmbedding")(x[:, :1]),
            (b, t, self.pose_latent_dim))
        y_emb = nn.Dense(self.audio_latent_dim, name="audioEmbedding")(y)
        mem = jnp.concatenate([ref, z, y_emb], axis=-1)
        mem = nn.Dense(self.pose_latent_dim, name="ztimelinear")(mem)

        q = jnp.broadcast_to(
            sinusoidal_table(t, self.pose_latent_dim)[None],
            (b, t, self.pose_latent_dim))
        kpm = None if mask is None else ~mask
        for i in range(self.num_layers):
            q = TorchTransformerDecoderLayer(
                self.num_heads, self.ff_size, self.deterministic, self.dropout,
                name=f"layers_{i}")(q, mem, tgt_key_padding_mask=kpm)

        out = nn.Dense(self.pos_dim, name="finallayer")(q)
        if mask is not None:
            out = out * mask[..., None]
        return out


# --------------------------------------------------------------------------
# mlp: ResUnet over the Δpose image + flat MLP; sequence-level latent
# --------------------------------------------------------------------------


class _ResidualConv(nn.Module):
    """mlp.py ResidualConv (:17-38): BN-ReLU-Conv ×2 + BN'd conv skip.
    Strides apply to the seq (H) axis only, as in the reference (2, 1)."""
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        bn = lambda name: nn.BatchNorm(use_running_average=True,
                                       momentum=0.9, epsilon=1e-5, name=name)
        h = bn("bn1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), strides=(self.stride, 1),
                    padding=1, name="conv1")(h)
        h = bn("bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(h)
        skip = nn.Conv(self.features, (3, 3), strides=(self.stride, 1),
                       padding=1, name="skip_conv")(x)
        skip = bn("bn_skip")(skip)
        return h + skip


class ResUnet(nn.Module):
    """mlp.py ResUnet (:117-175): 3-level residual U-Net over the
    (B, seq_len, pos_dim, 1) pose image; seq axis strided, pos axis kept;
    sigmoid 1-channel output. seq_len must be divisible by 8."""
    filters: tuple = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, x):
        f = self.filters
        h = nn.Conv(f[0], (3, 3), padding=1, name="in_conv1")(x)
        h = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, name="in_bn")(h)
        h = nn.relu(h)
        h = nn.Conv(f[0], (3, 3), padding=1, name="in_conv2")(h)
        x1 = h + nn.Conv(f[0], (3, 3), padding=1, name="in_skip")(x)

        x2 = _ResidualConv(f[1], stride=2, name="res1")(x1)
        x3 = _ResidualConv(f[2], stride=2, name="res2")(x2)
        x4 = _ResidualConv(f[3], stride=2, name="bridge")(x3)

        u = nn.ConvTranspose(f[3], (2, 1), strides=(2, 1), padding="VALID", name="up1")(x4)
        u = _ResidualConv(f[2], stride=1, name="upres1")(
            jnp.concatenate([u, x3], axis=-1))
        u = nn.ConvTranspose(f[2], (2, 1), strides=(2, 1), padding="VALID", name="up2")(u)
        u = _ResidualConv(f[1], stride=1, name="upres2")(
            jnp.concatenate([u, x2], axis=-1))
        u = nn.ConvTranspose(f[1], (2, 1), strides=(2, 1), padding="VALID", name="up3")(u)
        u = _ResidualConv(f[0], stride=1, name="upres3")(
            jnp.concatenate([u, x1], axis=-1))
        out = nn.Conv(1, (1, 1), name="out_conv")(u)
        return nn.sigmoid(out)


class EncoderMLP(nn.Module):
    """Encoder_MLP (mlp.py:176-230). Sequence latent of width ff_size."""
    pos_dim: int = 6
    audio_dim: int = 1024
    pose_latent_dim: int = 64       # unused (factory uniformity)
    audio_latent_dim: int = 256
    ff_size: int = 128
    num_layers: int = 2
    num_heads: int = 4
    dropout: float = 0.1
    deterministic: bool = True
    num_frames: int = 40            # fixed seq_len (must be divisible by 8)

    @nn.compact
    def __call__(self, x, y, mask=None):
        b, t, d = x.shape
        dx = x - x[:, :1]
        ref = x[:, 0]
        pose_img = dx[..., None]                   # (B, T, pos_dim, 1) NHWC
        pose_emb = ResUnet(name="resunet")(pose_img).reshape(b, -1)
        audio = nn.Dense(self.audio_latent_dim, name="linear_audio")(y)
        audio = audio.reshape(b, -1)
        h = jnp.concatenate([ref, pose_emb, audio], axis=-1)
        h = nn.relu(nn.Dense(self.ff_size, name="mlp_l0")(h))
        means = nn.Dense(self.ff_size, name="linear_means")
        mu = means(h)
        # reference bug replicated (mlp.py:225): logvar ALSO uses linear_means;
        # linear_logvar exists in the checkpoint but is never applied.
        logvar = means(h)
        return {"mu": mu, "logvar": logvar, "x_delta": dx}


class DecoderMLP(nn.Module):
    """Decoder_MLP (mlp.py:232-289)."""
    pos_dim: int = 6
    audio_dim: int = 1024
    pose_latent_dim: int = 64       # unused
    audio_latent_dim: int = 256
    ff_size: int = 128
    num_layers: int = 2
    num_heads: int = 4
    dropout: float = 0.1
    deterministic: bool = True
    num_frames: int = 40
    num_buckets: int = 32
    max_distance: int = 32
    eval_window: Optional[int] = None

    @nn.compact
    def __call__(self, x, z, y, mask=None):
        """z: (B, ff_size) sequence latent."""
        b, t, _ = y.shape
        ref = x[:, 0]
        audio = nn.Dense(self.audio_latent_dim, name="linear_audio")(y)
        audio = audio.reshape(b, -1)
        h = jnp.concatenate([ref, z, audio], axis=-1)
        h = nn.relu(nn.Dense(self.ff_size, name="mlp_l0")(h))
        h = nn.sigmoid(nn.Dense(t * self.pos_dim, name="mlp_l1")(h))
        pose_img = h.reshape(b, t, self.pos_dim)[..., None]
        pose_emb = ResUnet(name="resunet")(pose_img)[..., 0]   # (B, T, pos)
        out = nn.Dense(self.pos_dim, name="pose_linear")(pose_emb)
        if mask is not None:
            out = out * mask[..., None]
        return out


# --------------------------------------------------------------------------
# autotrans: ACTOR autoregressive decoder on joeynmt pre-norm layers
# --------------------------------------------------------------------------


class _JoeyMHA(nn.Module):
    """joeynmt MultiHeadedAttention (transformer_layers.py:11-95): separate
    k/v/q projections, q pre-scaled, boolean mask True = keep, attention
    probs dropped (:79)."""
    heads: int
    deterministic: bool = True
    dropout: float = 0.1

    @nn.compact
    def __call__(self, k_in, v_in, q_in, mask=None):
        b, n, c = q_in.shape
        m = k_in.shape[1]
        dh = c // self.heads
        k = nn.Dense(c, name="k_layer")(k_in)
        v = nn.Dense(c, name="v_layer")(v_in)
        q = nn.Dense(c, name="q_layer")(q_in)

        def split(z, ln):
            return z.reshape(b, ln, self.heads, dh).transpose(0, 2, 1, 3)

        q, k, v = split(q, n), split(k, m), split(v, m)
        q = q * (dh ** -0.5)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k)
        if mask is not None:
            # (B, 1, M) or (B, N, M), True = attend
            sim = jnp.where(mask[:, None], sim, -jnp.inf)
        attn = jax.nn.softmax(sim, axis=-1)
        attn = nn.Dropout(self.dropout,
                          deterministic=self.deterministic)(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, name="output_layer")(out)


class _JoeyDecoderLayer(nn.Module):
    """joeynmt TransformerDecoderLayer (transformer_layers.py:215-280):
    pre-norm self-attn, pre-norm cross-attn, pre-norm FF (ReLU)."""
    heads: int
    ff_size: int
    deterministic: bool = True
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, memory, src_mask=None, trg_mask=None):
        xn = nn.LayerNorm(epsilon=1e-6, name="x_layer_norm")(x)
        h1 = _JoeyMHA(self.heads, self.deterministic, self.dropout,
                      name="trg_trg_att")(xn, xn, xn, trg_mask) + x
        h1n = nn.LayerNorm(epsilon=1e-6, name="dec_layer_norm")(h1)
        h2 = _JoeyMHA(self.heads, self.deterministic, self.dropout,
                      name="src_trg_att")(memory, memory, h1n, src_mask)
        ffin = h2 + h1
        fn = nn.LayerNorm(epsilon=1e-6, name="ff_layer_norm")(ffin)
        h = nn.relu(nn.Dense(self.ff_size, name="ff_linear1")(fn))
        return nn.Dense(x.shape[-1], name="ff_linear2")(h) + ffin


def _actor_time_channel(mask, lengths):
    """ACTOR time embedding (gru.py:14-18): normalized position in [0, 1]."""
    t = mask.shape[1]
    time = mask.astype(jnp.float32) / (lengths[:, None].astype(jnp.float32) - 1.0)
    return time * jnp.arange(t, dtype=jnp.float32)[None, :]


class DecoderAutotrans(nn.Module):
    """Decoder_AUTOTRANS (autotrans.py:60-188), faithful ACTOR port.

    Conditioning y is a one-hot class vector (num_classes) as upstream; z is
    a (B, latent_dim) sequence latent. ``teacher_x`` drives the teacher-forced
    path (training); ``autoregressive`` runs the generation loop with a
    static-shape buffer (reference loop :156-186 grows shapes per step —
    equivalent outputs under the causal mask).
    """
    njoints: int = 1
    nfeats: int = 6
    num_classes: int = 4
    latent_dim: int = 256
    ff_size: int = 128
    num_layers: int = 2
    num_heads: int = 4
    concatenate_time: bool = True
    positional_encoding: bool = True
    dropout: float = 0.1
    deterministic: bool = True

    def _augment_z(self, z, y_onehot, mask, lengths):
        b, t = mask.shape
        za = jnp.concatenate([z, y_onehot], axis=-1)
        za = jnp.broadcast_to(za[:, None], (b, t, za.shape[-1]))
        if self.concatenate_time:
            time = _actor_time_channel(mask, lengths)
            za = jnp.concatenate([za, time[..., None]], axis=-1)
        return za

    def _augment_x(self, x, y_onehot, mask, lengths):
        b, t = x.shape[:2]
        xa = x.reshape(b, t, self.njoints * self.nfeats)
        ya = jnp.broadcast_to(y_onehot[:, None], (b, t, y_onehot.shape[-1]))
        if self.concatenate_time:
            time = _actor_time_channel(mask, lengths)
            return jnp.concatenate([xa, ya, time[..., None]], axis=-1)
        return jnp.concatenate([xa, ya], axis=-1)

    @nn.compact
    def __call__(self, z, y_onehot, mask, lengths, teacher_x=None):
        """z: (B, latent); y_onehot: (B, num_classes); mask: (B, T) True =
        valid; teacher_x: (B, T, njoints, nfeats) ground truth for teacher
        forcing (required — autoregressive generation uses .generate)."""
        b, t = mask.shape
        za = self._augment_z(z, y_onehot, mask, lengths)
        src = nn.Dense(self.latent_dim, name="embedding")(za)
        src_mask = mask[:, None, :]                       # (B, 1, T)

        x = teacher_x
        # shift right by one frame (BOS = zeros), autotrans.py:131-133
        x = jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)
        xa = self._augment_x(x, y_onehot, mask, lengths)
        trg = nn.Dense(self.latent_dim, name="embedding_x")(xa)
        causal = jnp.tril(jnp.ones((t, t), bool))
        trg_mask = mask[:, None, :] & causal[None]
        if self.positional_encoding:
            trg = trg + sinusoidal_table(t, self.latent_dim)[None]
        trg = nn.Dropout(self.dropout, deterministic=self.deterministic)(trg)

        val = trg
        for i in range(self.num_layers):
            val = _JoeyDecoderLayer(self.num_heads, self.ff_size,
                                    self.deterministic, self.dropout,
                                    name=f"layers_{i}")(
                val, src, src_mask=src_mask, trg_mask=trg_mask)
        val = nn.LayerNorm(epsilon=1e-6, name="layer_norm")(val)
        val = nn.Dense(self.njoints * self.nfeats, use_bias=False,
                       name="output_layer")(val)
        # padded frames self-attend to an empty key set (softmax of all -inf
        # = NaN, in torch too); jnp.where zeroes them like val[~mask] = 0
        val = jnp.where(mask[..., None], val, 0.0)
        return val.reshape(b, t, self.njoints, self.nfeats)

    def generate(self, variables, z, y_onehot, mask, lengths):
        """Autoregressive generation (autotrans.py:156-186): feed back the
        last output each step, static-shape buffer + causal mask."""
        b, t = mask.shape

        def step(i, buf):
            out = self.apply(variables, z, y_onehot, mask, lengths,
                             teacher_x=buf)
            return buf.at[:, i].set(out[:, i])

        buf = jnp.zeros((b, t, self.njoints, self.nfeats))
        return jax.lax.fori_loop(0, t, step, buf)


def make_autotrans_core(adapter: "DecoderAutotransAudio") -> DecoderAutotrans:
    """Core decoder matching a DecoderAutotransAudio's hyperparameters.

    A free function (not a module method): flax would try to register a
    module constructed inside an unbound module's method as a child.
    """
    return DecoderAutotrans(
        njoints=1, nfeats=adapter.pos_dim,
        num_classes=adapter.pose_latent_dim,
        latent_dim=adapter.audio_latent_dim, ff_size=adapter.ff_size,
        num_layers=adapter.num_layers, num_heads=adapter.num_heads,
        dropout=adapter.dropout, deterministic=adapter.deterministic)


class DecoderAutotransAudio(nn.Module):
    """DAWN-contract adapter around :class:`DecoderAutotrans`.

    Upstream Decoder_AUTOTRANS conditions on a ONE-HOT CLASS vector and a
    (B, latent) sequence z (autotrans.py:60-128) — under the DAWN data
    contract y is per-frame audio and z per-frame, so the upstream module is
    not runnable as-is (DEVIATIONS.md). Minimal adaptation: sequence latent =
    masked mean of per-frame z; audio is embedded and masked-mean-pooled into
    the class slot. The core decoder itself is the faithful port.
    """
    pos_dim: int = 6
    audio_dim: int = 1024
    pose_latent_dim: int = 64
    audio_latent_dim: int = 256
    ff_size: int = 128
    num_layers: int = 2
    num_heads: int = 4
    dropout: float = 0.1
    deterministic: bool = True

    def setup(self):
        self.audioEmbedding = nn.Dense(self.pose_latent_dim)
        self.core = make_autotrans_core(self)

    def prep(self, z, y, mask):
        """(per-frame z, audio, mask) -> (seq z, class-slot vec, lengths)."""
        lengths = mask.sum(-1).astype(jnp.int32)
        denom = jnp.maximum(lengths, 1).astype(jnp.float32)[:, None]
        m = mask[..., None].astype(jnp.float32)
        zm = (z * m).sum(1) / denom
        yv = (self.audioEmbedding(y) * m).sum(1) / denom
        return zm, yv, lengths

    def __call__(self, x, z, y, mask=None):
        """Teacher-forced path (training / parity): x is the GT pose."""
        b, t, _ = y.shape
        if mask is None:
            mask = jnp.ones((b, t), bool)
        zm, yv, lengths = self.prep(z, y, mask)
        dx = x - x[:, :1]
        out = self.core(zm, yv, mask, lengths, teacher_x=dx[:, :, None, :])
        return out.reshape(b, t, self.pos_dim)
