"""DAWN video flow-diffusion UNet3D, TPU-native (flax.linen, channels-last).

Capability parity with the reference UNet
(DM_3/modules/video_flow_diffusion_multiGPU_v0_crema_plus_faceemb_ca_multi_test.py:728-973):
factorized space/time 3D UNet over the (flow, occlusion) latent video with

- per-frame 2D convs (the reference's Conv3d(1,k,k) collapses to 2D convs over
  a (B*T) batch -- exactly how we lay it out for the MXU),
- three-way per-frame cross-attention to audio/pose/eye condition tokens
  (ResnetBlock_ca_mul, :363-478; cosine-sim CrossAttention with null kv,
  learned q/k scales, :481-559),
- per-frame spatial linear attention (:602-628),
- temporal attention over frames with rotary embedding + T5 relative position
  bias + +/-win_width additive window mask (:648-726 and :77-118), computed
  either as windowed full attention or via the Pallas sliding-window kernel
  (dawn_tpu.ops.local_attention) for long videos,
- CFG via forward_with_cond_scale (:879-890) handled in the sampler.

Video tensors are (B, T, H, W, C); conditions are (B, T, cond_dim); time is
(B,) int timesteps.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from dawn_tpu.ops.norms import channel_layer_norm, channel_layer_norm_core
from dawn_tpu.ops.rotary import (apply_rotary, apply_rotary_flat,
                                 flat_rotary_constants, rotary_cos_sin)
from dawn_tpu.ops.t5bias import t5_bias_matrix, window_mask, t5_bias_windowed_vector
from dawn_tpu.ops.convs import conv_transpose2d_torch
from dawn_tpu.ops.local_attention import (
    local_attention, local_attention_packed_tpu, seq_sharded_local_attention,
    PACKED_MAX_T)


def sinusoidal_pos_emb(t: jax.Array, dim: int) -> jax.Array:
    """(B,) -> (B, dim); ca_multi_test.py SinusoidalPosEmb (:149-160)."""
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    emb = jnp.exp(jnp.arange(half) * -emb)
    emb = t.astype(jnp.float32)[:, None] * emb[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


def l2norm(x: jax.Array) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + 1e-24)


class ChanLayerNorm(nn.Module):
    """Channel LayerNorm with gamma only (reference LayerNorm / LayerNorm_img).

    Statistics are computed in float32 regardless of the activation dtype
    (bf16-safe), output matches the input dtype. ``core`` optionally
    supplies the precomputed gamma-free normalized f32 tensor
    (channel_layer_norm_core) so branches normalizing the SAME input share
    one stats pass (fused 3-way condition cross-attention).
    """
    @nn.compact
    def __call__(self, x, core: Optional[jax.Array] = None):
        gamma = self.param("gamma", nn.initializers.ones, (x.shape[-1],))
        if core is None:
            core = channel_layer_norm_core(x.astype(jnp.float32))
        return (core * gamma).astype(x.dtype)


class VideoGroupNorm(nn.Module):
    """GroupNorm over a (B, T, H, W, C) video with stats over (T, H, W, C/G).

    torch nn.GroupNorm on the reference's 5-D (B, C, F, H, W) activations
    normalizes across frames jointly — a subtle but load-bearing detail
    (verified by frame-for-frame parity tests vs the reference).
    """
    num_groups: int = 8
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        g = self.num_groups
        xg = x.astype(jnp.float32).reshape(b, t, h, w, g, c // g)
        mean = xg.mean(axis=(1, 2, 3, 5), keepdims=True)
        var = jnp.square(xg - mean).mean(axis=(1, 2, 3, 5), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = xg.reshape(b, t, h, w, c) * scale + bias
        return y.astype(x.dtype)


class Block(nn.Module):
    """conv(1,3,3) + GroupNorm(8) + optional time scale/shift + SiLU (:226-249).

    Operates on (B, T, H, W, C): the conv is per-frame, the norm is video-wide.
    scale_shift: ((B,1,1,1,F), (B,1,1,1,F)) broadcast over frames and space.
    """
    features: int
    groups: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift: Optional[Tuple[jax.Array, jax.Array]] = None):
        b, t, h, w, c = x.shape
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="proj")(x.reshape(b * t, h, w, c))
        y = y.reshape(b, t, h, w, self.features)
        y = VideoGroupNorm(self.groups, name="norm")(y)
        if scale_shift is not None:
            scale, shift = scale_shift
            y = y * (scale.astype(y.dtype) + 1.0) + shift.astype(y.dtype)
        return jax.nn.silu(y)


def _l2norm_grouped(x: jax.Array, g: jax.Array) -> jax.Array:
    """l2norm within each head's lane group, heads staying in lanes.

    x: (..., heads*dim_head) f32; g: the _head_group_matrix. Same epsilon
    as :func:`l2norm` (reference CrossAttention.l2norm)."""
    ss = jnp.square(x) @ g                     # (..., heads) per-head sum sq
    return x * (jax.lax.rsqrt(ss + 1e-24) @ g.T)


def cond_cross_natural(q, k, v, null_kv, q_scale, k_scale, heads, dim_head,
                       scale, dtype):
    """Cosine-sim 2-key cross-attention in the (N, s, heads, d) split-heads
    layout — the CPU path and the parity anchor for
    :func:`cond_cross_packed`. q: (N, S, H*D); k, v: (N, H*D)."""
    n, s, inner = q.shape
    q = q.reshape(n, s, heads, dim_head)
    k = k.reshape(n, 1, heads, dim_head)
    v = v.reshape(n, 1, heads, dim_head)
    nk = jnp.broadcast_to(null_kv[0], (n, 1, heads, dim_head))
    nv = jnp.broadcast_to(null_kv[1], (n, 1, heads, dim_head))
    k = jnp.concatenate([nk, k], axis=1)   # (N, 2, H, D)
    v = jnp.concatenate([nv, v], axis=1)

    q = (l2norm(q.astype(jnp.float32)) * q_scale).astype(dtype)
    k = (l2norm(k.astype(jnp.float32)) * k_scale).astype(dtype)

    sim = jnp.einsum("nshd,nkhd->nhsk", q, k) * scale
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("nhsk,nkhd->nshd", attn, v).reshape(n, s, inner)


def cond_cross_packed_flat(q, k, v, nk_f, nv_f, qs_f, ks_f, heads, dim_head,
                           scale, dtype):
    """Packed 2-key cross-attention core with PRE-FLATTENED per-lane
    constants (each (heads*dim_head,)) — lets the fused 3-way condition
    path run 3 branches as one 3*heads-head call with per-branch scales."""
    gmat = jnp.asarray(_head_group_matrix(heads, dim_head), jnp.float32)
    nv_f = nv_f.astype(dtype)

    qn = (_l2norm_grouped(q.astype(jnp.float32), gmat) * qs_f).astype(dtype)
    kn = (_l2norm_grouped(k.astype(jnp.float32), gmat) * ks_f).astype(dtype)
    nkn = (_l2norm_grouped(nk_f.astype(jnp.float32), gmat) * ks_f).astype(dtype)

    g_d = gmat.astype(dtype)
    sim0 = ((qn * nkn) @ g_d).astype(jnp.float32) * scale     # (N, S, H)
    sim1 = ((qn * kn[:, None, :]) @ g_d).astype(jnp.float32) * scale
    m = jnp.maximum(sim0, sim1)
    e0 = jnp.exp(sim0 - m)
    e1 = jnp.exp(sim1 - m)
    inv = 1.0 / (e0 + e1)
    p0 = ((e0 * inv) @ gmat.T).astype(dtype)                  # (N, S, H*D)
    p1 = ((e1 * inv) @ gmat.T).astype(dtype)
    return p0 * nv_f + p1 * v[:, None, :]


def cond_cross_packed(q, k, v, null_kv, q_scale, k_scale, heads, dim_head,
                      scale, dtype):
    """Same math with heads in the lane dim end-to-end.

    The context is ONE token, so keys = {null, cond} and the softmax is a
    2-way mix: compute both per-head logits as grouped lane reductions
    (elementwise product @ head-group matrix), blend v/null_v with the two
    probabilities expanded back to lanes. Zero transposes, zero 5-D
    reshapes; exactly equal to :func:`cond_cross_natural` up to f32
    rounding (parity-tested)."""
    return cond_cross_packed_flat(
        q, k, v, jnp.tile(null_kv[0], heads), jnp.tile(null_kv[1], heads),
        jnp.tile(q_scale, heads), jnp.tile(k_scale, heads), heads, dim_head,
        scale, dtype)


class CondCrossAttention(nn.Module):
    """Cosine-similarity cross-attention to ONE condition token per frame.

    Reference CrossAttention (:481-559): l2-normalized q/k with learned
    per-channel scales, a learned null kv (CFG), softmax computed in float32.
    Context here is a single token, so keys = {null, cond}: the softmax is
    over 2 entries and the whole op is a couple of tiny matmuls.
    x: (N, S, C) tokens; context: (N, ctx_dim).

    TPU path (:func:`cond_cross_packed`) keeps heads in the lane dim (same
    layout strategy as the packed temporal / spatial-linear paths): grouped
    l2norm, per-head 2-way softmax and v-blend as lane-group matmuls —
    this module appears 3x in every ResnetBlockCaMul and its split-heads
    einsums were pure layout overhead (probe_unet_phases).
    """
    out_dim: int
    dim_head: int = 8
    heads: int = 8
    scale: float = 8.0
    dtype: Any = jnp.float32

    def setup(self):
        inner = self.dim_head * self.heads
        self.norm = ChanLayerNorm()
        self.to_q = nn.Dense(inner, use_bias=False, dtype=self.dtype)
        self.to_kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype)
        self.null_kv = self.param("null_kv", nn.initializers.normal(1.0),
                                  (2, self.dim_head))
        self.q_scale = self.param("q_scale", nn.initializers.ones,
                                  (self.dim_head,))
        self.k_scale = self.param("k_scale", nn.initializers.ones,
                                  (self.dim_head,))
        self.to_out = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype)
        self.out_norm = ChanLayerNorm()

    def branch_qkv(self, x: jax.Array, core: Optional[jax.Array],
                   context: jax.Array):
        """This branch's q/k/v + per-lane flattened constants, for the fused
        3-way path (ResnetBlockCaMul): the caller concatenates three
        branches along the head axis and runs ONE packed 2-key softmax."""
        xn = self.norm(x, core=core)
        q = self.to_q(xn)
        k, v = jnp.split(self.to_kv(context), 2, axis=-1)
        return (q, k, v, jnp.tile(self.null_kv[0], self.heads),
                jnp.tile(self.null_kv[1], self.heads),
                jnp.tile(self.q_scale, self.heads),
                jnp.tile(self.k_scale, self.heads))

    def branch_out(self, attn_out: jax.Array) -> jax.Array:
        return self.out_norm(self.to_out(attn_out))

    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        xn = self.norm(x)
        q = self.to_q(xn)
        k, v = jnp.split(self.to_kv(context), 2, axis=-1)
        fn = (cond_cross_packed if jax.default_backend() == "tpu"
              else cond_cross_natural)
        out = fn(q, k, v, self.null_kv, self.q_scale, self.k_scale,
                 self.heads, self.dim_head, self.scale, self.dtype)
        return self.branch_out(out)


def fused_triple_cond_cross(mods, tokens, ctxs, dtype):
    """The three condition cross-attentions of a ResnetBlockCaMul as ONE
    packed computation.

    All three branches (audio/pose/eye, reference :459-463) attend the SAME
    spatial tokens to a single context token each; they differ only in
    weights. Fused: one shared layer-norm stats pass
    (channel_layer_norm_core — each branch applies only its gamma), one
    3*heads-head 2-key packed softmax over the concatenated q/k/v lanes
    (cond_cross_packed_flat with per-branch scale/null vectors), then the
    per-branch output projections summed. Exactly equal to the sum of three
    separate branches up to f32 rounding (parity-tested,
    tests/test_dm_smoke.py).
    """
    heads, dim_head = mods[0].heads, mods[0].dim_head
    core = channel_layer_norm_core(tokens.astype(jnp.float32))
    qs, ks, vs, nks, nvs, qss, kss = [], [], [], [], [], [], []
    for m, ctx in zip(mods, ctxs):
        q, k, v, nk, nv, qsc, ksc = m.branch_qkv(tokens, core, ctx)
        qs.append(q), ks.append(k), vs.append(v)
        nks.append(nk), nvs.append(nv), qss.append(qsc), kss.append(ksc)
    out = cond_cross_packed_flat(
        jnp.concatenate(qs, -1), jnp.concatenate(ks, -1),
        jnp.concatenate(vs, -1), jnp.concatenate(nks, -1),
        jnp.concatenate(nvs, -1), jnp.concatenate(qss, -1),
        jnp.concatenate(kss, -1), len(mods) * heads, dim_head,
        mods[0].scale, dtype)
    outs = jnp.split(out, len(mods), axis=-1)
    return sum(m.branch_out(o) for m, o in zip(mods, outs))


class ResnetBlockCaMul(nn.Module):
    """ResNet block with 3-way condition cross-attention (:363-478).

    cond (B, T, aud+pose+eye) splits into audio/pose/eye tokens; each passes a
    SiLU+Dense mlp and cross-attends into the frame's spatial tokens; the three
    results sum and add onto block1's output.
    """
    features: int
    time_emb_dim: Optional[int] = None
    cond_aud: Optional[int] = None
    cond_pose: Optional[int] = None
    cond_eye: Optional[int] = None
    groups: int = 8
    dtype: Any = jnp.float32
    # True = fuse the 3 condition cross-attentions into one packed call
    # (shared layer-norm stats pass, one 24-head 2-key softmax instead of
    # three 8-head ones). Both paths share identical params and are
    # parity-tested. Default OFF: e2e on v5e the fusion measured a NET LOSS
    # (46.8 -> 46.0 fps at 256^2, 2026-08-19) — the 3-way q/k/v lane
    # concats add more HBM traffic than the shared stats pass saves.
    fuse_cond: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array, time_emb: Optional[jax.Array] = None,
                 cond: Optional[jax.Array] = None) -> jax.Array:
        b, t, h, w, c = x.shape
        scale_shift = None
        if self.time_emb_dim is not None:
            temb = nn.Dense(self.features * 2, name="time_mlp")(jax.nn.silu(time_emb))
            temb = temb[:, None, None, None, :]
            scale_shift = jnp.split(temb, 2, axis=-1)

        h_cond = None
        if self.cond_aud is not None:
            aud = cond[..., : self.cond_aud]
            pose = cond[..., self.cond_aud: self.cond_aud + self.cond_pose]
            eye = cond[..., self.cond_aud + self.cond_pose:]
            aud = nn.Dense(self.features * 2, dtype=self.dtype,
                           name="audio_mlp")(jax.nn.silu(aud))
            pose = nn.Dense(self.features * 2, dtype=self.dtype,
                            name="pose_mlp")(jax.nn.silu(pose))
            eye = nn.Dense(self.features * 2, dtype=self.dtype,
                           name="eye_mlp")(jax.nn.silu(eye))

            tokens = x.reshape(b * t, h * w, c)
            mods = [CondCrossAttention(self.features, dtype=self.dtype,
                                       name=f"cross_attn_{k}")
                    for k in ("aud", "pose", "eye")]
            ctxs = [z.reshape(b * t, -1) for z in (aud, pose, eye)]
            fuse = bool(self.fuse_cond)
            if fuse:
                h_cond = fused_triple_cond_cross(
                    mods, tokens, ctxs, self.dtype).reshape(
                        b, t, h, w, self.features)
            else:
                h_cond = sum(m(tokens, ctx) for m, ctx in zip(mods, ctxs)
                             ).reshape(b, t, h, w, self.features)

        y = Block(self.features, self.groups, dtype=self.dtype,
                  name="block1")(x, scale_shift)
        if h_cond is not None:
            y = y + h_cond.astype(y.dtype)
        y = Block(self.features, self.groups, dtype=self.dtype, name="block2")(y)

        if c != self.features:
            res = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                          name="res_conv")(x.reshape(b * t, h, w, c))
            res = res.reshape(b, t, h, w, self.features)
        else:
            res = x
        return y + res.astype(y.dtype)


def _head_group_matrix(heads: int, dim_head: int) -> np.ndarray:
    """(heads*dim_head, heads) 0/1 indicator: column h selects head h's
    lanes. Used to do per-head reductions as matmuls in the flat layout."""
    g = np.zeros((heads * dim_head, heads), np.float32)
    for h in range(heads):
        g[h * dim_head:(h + 1) * dim_head, h] = 1.0
    return g


def _grouped_softmax_lanes(x: jax.Array, g: jax.Array) -> jax.Array:
    """Softmax within each head's lane group, heads staying in lanes.

    x: (..., heads*dim_head) f32; g: the _head_group_matrix. Stability:
    softmax within a group is invariant to subtracting any constant over
    that group, so the GLOBAL row max works for every group at once — one
    full-lane reduction instead of 8 strided ones. Caveat: a head whose
    logits all sit > ~87 below the global max underflows to e == 0; the
    denom clamp below turns that head's output into zeros instead of NaN
    (inter-head logit gaps that large only occur in diverged models —
    GroupNorm'd activations keep heads within a few units of each other).
    """
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    denom = e @ g                       # (..., heads) per-head sums
    denom = jnp.maximum(denom, jnp.finfo(jnp.float32).tiny)
    return e * ((1.0 / denom) @ g.T)


def spatial_linear_packed(q, k, v, heads: int, dim_head: int, dtype):
    """Linear attention with heads in the lane dim: (N, s, H*D) -> same.

    Per-head softmax + context via matmuls against constant head-group /
    block-diagonal masks. The masked (C, C) contraction pair does heads x
    the per-head FLOPs but zero transposes; exactly equal to
    :func:`spatial_linear_natural` up to f32 rounding (parity-tested).

    A matmul-borne-normalizer variant (exp kept in bf16, softmax(k) folded
    into the context contraction via a ones column) measured SLOWER on v5e
    at the 256^2 top-level shape — 18.3 vs 14.4 ms module time (probe_micro,
    2026-08-19): the ones-column concat materializes a padded (C, C+1)
    operand and the twice-consumed exp still can't fuse. Keeping the
    jax.nn.softmax formulation.
    """
    gmat = jnp.asarray(_head_group_matrix(heads, dim_head), jnp.float32)
    q = (_grouped_softmax_lanes(q.astype(jnp.float32), gmat)
         * (dim_head ** -0.5)).astype(dtype)
    k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(dtype)
    bd = jnp.asarray(
        np.kron(np.eye(heads, dtype=np.float32),
                np.ones((dim_head, dim_head), np.float32)), dtype)
    ctx = jnp.einsum("nsd,nse->nde", k, v) * bd
    return jnp.einsum("nsd,nde->nse", q, ctx)


def spatial_linear_natural(q, k, v, heads: int, dim_head: int, dtype):
    """Linear attention in the (N, s, heads, d) layout — the CPU path and
    the parity anchor for :func:`spatial_linear_packed`."""
    n, s, hidden = q.shape

    def split_heads(z):
        return z.reshape(n, s, heads, dim_head)

    q, k, v = map(split_heads, (q, k, v))         # (N, s, heads, d)
    q = (jax.nn.softmax(q.astype(jnp.float32), axis=-1)
         * (dim_head ** -0.5)).astype(dtype)
    k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(dtype)
    ctx = jnp.einsum("nkhd,nkhe->nhde", k, v)
    return jnp.einsum("nhde,nkhd->nkhe", ctx, q).reshape(n, s, hidden)


class SpatialLinearAttention(nn.Module):
    """Per-frame linear attention over spatial tokens (:602-628).

    TPU path keeps heads in the lane dim end-to-end (same layout strategy
    as the packed TemporalAttention): per-head softmax + k^T v context via
    matmuls against constant head-group/block-diagonal masks instead of a
    5-D split-heads einsum. The masked (C, C) contraction does heads x the
    FLOPs of the per-head form, but this module is layout-bound, not
    FLOP-bound: 19.1 -> ~4 ms at the 256^2 top level
    (scripts/probe_unet_phases.py). Both paths share identical weights and
    are parity-tested against each other (tests/test_dm_smoke.py).
    """
    heads: int = 8
    dim_head: int = 32
    dtype: Any = jnp.float32
    force_natural: bool = False     # probe/A-B hook: natural layout on TPU

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        y = x.reshape(b * t, h, w, c)
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, dtype=self.dtype,
                      name="to_qkv")(y)
        q, k, v = jnp.split(qkv.reshape(b * t, h * w, 3 * hidden), 3, axis=-1)

        if jax.default_backend() == "tpu" and not self.force_natural:
            out = spatial_linear_packed(q, k, v, self.heads, self.dim_head,
                                        self.dtype)
        else:
            out = spatial_linear_natural(q, k, v, self.heads, self.dim_head,
                                         self.dtype)
        out = out.reshape(b * t, h, w, hidden)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="to_out")(out)
        return out.reshape(b, t, h, w, c)


class TemporalAttention(nn.Module):
    """Multi-head attention over the frame axis with rotary + T5 window bias.

    Reference Attention (:648-726) wrapped in EinopsToAndFrom('b c f h w',
    'b (h w) f c'). Two execution modes:
      - 'full':  windowed full attention, O(T^2) scores (inference default in
                 the reference, ca_multi_test.py).
      - 'local': O(T*w) sliding-window attention -- the Pallas kernel on TPU,
                 replacing the reference's per-frame Python loop
                 (local_attention.py:71-99) AND its absent CUDA kernel.
    Both are numerically identical (the -1e8 window mask zeroes out-of-window
    weights exactly in fp32).
    """
    heads: int = 8
    dim_head: int = 32
    mode: str = "full"
    window: int = 20
    dtype: Any = jnp.float32
    # canonical row-chunk for the packed kernel: when > 0, every level with
    # more sequences runs the kernel as lax.map over chunks of this many
    # rows, so ALL levels share ONE Mosaic kernel shape. Measured (v5e via
    # axon, 2026-08-17): steady-state cost +9.2% on the attention op at
    # n=1024 / +6.7% at n=4096 (probe_packed_compile.py --steady), −7%
    # end-to-end at 128², and the hoped-for compile win did NOT materialize
    # (full 128² bench compiled in 1036 s chunked vs 242 s unchunked;
    # compile times through the tunnel are noisy but never favored
    # chunking). Default 0 = disabled; the persistent compilation cache
    # (see pipeline/generator.py) is the cold-start fix instead.
    packed_chunk: int = 0
    # sequence parallelism: when seq_mesh is set (and its seq_axis has >1
    # devices) the frame axis of the inputs is sharded over that axis, and
    # attention runs via shard_map + explicit ±window halo exchange instead
    # of letting GSPMD all-gather the full T around the Pallas kernel
    # (ops/local_attention.seq_sharded_local_attention, VERDICT r3 weak #3).
    seq_mesh: Optional[Any] = None
    seq_axis: str = "seq"
    seq_use_pallas: Optional[bool] = None   # None = pallas iff TPU backend;
                                            # False = einsum (differentiable)

    @nn.compact
    def __call__(self, x: jax.Array, pos_bias: Optional[jax.Array] = None,
                 bias_vec: Optional[jax.Array] = None) -> jax.Array:
        b, s, t, c = x.shape          # (B, HW, T, C)
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        if (self.seq_mesh is not None
                and self.seq_mesh.shape.get(self.seq_axis, 1) > 1):
            # rotary + scale happen OUTSIDE the shard_map in the packed
            # layout: the (T, H*D) constants are per-global-frame, and GSPMD
            # slices them along the sharded T of q/k
            cos_f, sin_f, rmat = flat_rotary_constants(
                t, min(32, self.dim_head), self.heads, self.dim_head,
                dtype=x.dtype)
            qp = apply_rotary_flat(q * self.dim_head ** -0.5,
                                   cos_f, sin_f, rmat).reshape(b * s, t, hidden)
            kp = apply_rotary_flat(k, cos_f, sin_f, rmat).reshape(
                b * s, t, hidden)
            vp = v.reshape(b * s, t, hidden)
            out = seq_sharded_local_attention(
                qp, kp, vp, bias_vec, self.window, self.heads,
                self.seq_mesh, self.seq_axis, use_pallas=self.seq_use_pallas)
            return nn.Dense(c, use_bias=False, dtype=self.dtype,
                            name="to_out")(out.reshape(b, s, t, hidden)
                                           .astype(self.dtype))

        # packed for >=256 rows: dropping the rows-256 level to banded costs
        # 8.7 fps at 128^2 (131.6 -> 122.9) for only ~127 s less cold
        # compile — the kernel earns its compile everywhere above tiny rows
        if (self.mode in ("local", "pallas")
                and jax.default_backend() == "tpu" and t <= PACKED_MAX_T
                and b * s >= 256):
            # packed path: heads stay in the lane dim end-to-end — no
            # split-heads transposes, and rotary applied IN this layout
            # (flat_rotary_constants: one MXU pair-swap matmul fused with
            # the cos/sin multiply-adds; the 5-D reshape + strided rotary
            # alternative measured 44.4 ms/op vs 23.2 at the 256^2
            # top-level shape, ops/rotary.py)
            cos_f, sin_f, rmat = flat_rotary_constants(
                t, min(32, self.dim_head), self.heads, self.dim_head,
                dtype=x.dtype)
            qp = apply_rotary_flat(q * self.dim_head ** -0.5,
                                   cos_f, sin_f, rmat).reshape(b * s, t, hidden)
            kp = apply_rotary_flat(k, cos_f, sin_f, rmat).reshape(
                b * s, t, hidden)
            vp = v.reshape(b * s, t, hidden)
            rows, ck = b * s, self.packed_chunk
            if ck and rows > ck and rows % ck == 0:
                out = jax.lax.map(
                    lambda a: local_attention_packed_tpu(
                        *a, bias_vec, self.window, self.heads),
                    tuple(z.reshape(rows // ck, ck, t, hidden)
                          for z in (qp, kp, vp))).reshape(rows, t, hidden)
            else:
                out = local_attention_packed_tpu(
                    qp, kp, vp, bias_vec, self.window, self.heads)
            return nn.Dense(c, use_bias=False, dtype=self.dtype,
                            name="to_out")(out.reshape(b, s, t, hidden)
                                           .astype(self.dtype))

        def split_heads(z):
            return z.reshape(b, s, t, self.heads, self.dim_head).transpose(0, 1, 3, 2, 4)

        q, k, v = map(split_heads, (q, k, v))    # (B, S, H, T, D)
        q = q * (self.dim_head ** -0.5)

        cos, sin = rotary_cos_sin(t, min(32, self.dim_head), dtype=x.dtype)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)

        if self.mode in ("local", "pallas"):
            qf = q.reshape(b * s, self.heads, t, self.dim_head)
            kf = k.reshape(b * s, self.heads, t, self.dim_head)
            vf = v.reshape(b * s, self.heads, t, self.dim_head)
            # short-T small-row levels: banded — sub-ms either way, and each
            # extra Pallas shape costs ~75 s of Mosaic compile
            use_pallas = (True if self.mode == "pallas"
                          else (False if t <= PACKED_MAX_T else None))
            out = local_attention(qf, kf, vf, bias_vec, self.window,
                                  use_pallas=use_pallas)
            out = out.reshape(b, s, self.heads, t, self.dim_head)
        else:
            sim = jnp.einsum("bshid,bshjd->bshij", q, k).astype(jnp.float32)
            if pos_bias is not None:
                sim = sim + pos_bias
            sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
            attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
            out = jnp.einsum("bshij,bshjd->bshid", attn, v)

        out = out.transpose(0, 1, 3, 2, 4).reshape(b, s, t, hidden)
        return nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_out")(
            out.astype(self.dtype))


class SpatialFullAttention(nn.Module):
    """Full attention over spatial tokens per frame (mid block, :841-843)."""
    heads: int = 8
    dim_head: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        y = x.reshape(b * t, h * w, c)
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(z):
            return z.reshape(b * t, h * w, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        q = q * (self.dim_head ** -0.5)
        sim = jnp.einsum("nhid,nhjd->nhij", q, k).astype(jnp.float32)
        sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("nhij,nhjd->nhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b * t, h * w, hidden)
        out = nn.Dense(c, use_bias=False, dtype=self.dtype,
                       name="to_out")(out.astype(self.dtype))
        return out.reshape(b, t, h, w, c)


class PreNormResidualTemporal(nn.Module):
    """Residual(PreNorm(ChanLayerNorm, TemporalAttention)) over (B,T,H,W,C)."""
    heads: int
    dim_head: int
    mode: str
    window: int
    dtype: Any = jnp.float32
    seq_mesh: Optional[Any] = None
    seq_axis: str = "seq"
    seq_use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, pos_bias=None, bias_vec=None):
        b, t, h, w, c = x.shape
        y = ChanLayerNorm(name="norm")(x)
        y = y.transpose(0, 2, 3, 1, 4).reshape(b, h * w, t, c)
        y = TemporalAttention(self.heads, self.dim_head, self.mode, self.window,
                              dtype=self.dtype, seq_mesh=self.seq_mesh,
                              seq_axis=self.seq_axis,
                              seq_use_pallas=self.seq_use_pallas,
                              name="attn")(y, pos_bias, bias_vec)
        y = y.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)
        return x + y


class PreNormResidualSpatialLinear(nn.Module):
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ChanLayerNorm(name="norm")(x)
        y = SpatialLinearAttention(self.heads, dtype=self.dtype, name="attn")(y)
        return x + y


class PreNormResidualSpatialFull(nn.Module):
    heads: int
    dim_head: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ChanLayerNorm(name="norm")(x)
        y = SpatialFullAttention(self.heads, self.dim_head, dtype=self.dtype,
                                 name="attn")(y)
        return x + y


class Downsample(nn.Module):
    """Conv (1,4,4) stride (1,2,2) pad (0,1,1) per frame (:173-175)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        y = nn.Conv(self.features, (4, 4), strides=(2, 2), padding=1,
                    dtype=self.dtype, name="conv")(x.reshape(b * t, h, w, c))
        return y.reshape(b, t, h // 2, w // 2, self.features)


class Upsample(nn.Module):
    """ConvTranspose (1,4,4) stride (1,2,2) pad (0,1,1) per frame (:163-171).

    Kernel stored pre-flipped HWIO so the call is one lax conv (see
    dawn_tpu.ops.convs.conv_transpose2d_torch).
    """
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        wkern = self.param("kernel", nn.initializers.lecun_normal(), (4, 4, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = conv_transpose2d_torch(x.reshape(b * t, h, w, c),
                                   wkern.astype(self.dtype),
                                   bias.astype(self.dtype),
                                   stride=2, padding=1)
        return y.reshape(b, t, h * 2, w * 2, self.features)


class SplitInitConv(nn.Module):
    """init_conv with the kernel splittable along input channels.

    The UNet entry concatenates [noisy latent (3ch), image feature (256),
    bbox-mask emb (16)] — but fea/mask are CONSTANT across all 20 DDIM
    steps, and conv is linear in its input channels:
    conv(cat(a, b)) = conv_{W[:, :, :3]}(a) + (conv_{W[:, :, 3:]}(b) + bias).
    ``static`` precomputes the second term once per video; ``noisy`` applies
    only the 3-channel slice per step. At 256^2/200f the full 275-channel
    7x7 conv is ~2.8 TFLOP per DDIM step recomputed 20x by the reference
    (ca_multi_test.py:776 under :1244's per-step concat).

    Param paths stay ``init_conv/{kernel,bias}`` so the torch checkpoint
    converter is unchanged.
    """
    features: int
    total_in: int
    ksize: int
    dtype: Any = jnp.float32

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.ksize, self.ksize, self.total_in,
                                  self.features))
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,))

    def _conv(self, x, kernel):
        p = self.ksize // 2
        return jax.lax.conv_general_dilated(
            x, kernel.astype(self.dtype), window_strides=(1, 1),
            padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def full(self, x):
        return self._conv(x, self.kernel) + self.bias.astype(self.dtype)

    def noisy(self, x):
        return self._conv(x, self.kernel[:, :, :3])

    def static(self, x):
        return self._conv(x, self.kernel[:, :, 3:]) + self.bias.astype(
            self.dtype)


class Unet3D(nn.Module):
    """The denoiser. Input (B, T, H, W, channels); returns (B, T, H, W, 3)."""
    dim: int = 64
    channels: int = 3 + 256 + 16
    out_grid_dim: int = 2
    out_conf_dim: int = 1
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    attn_heads: int = 8
    attn_dim_head: int = 32
    cond_aud: int = 1024
    cond_pose: int = 6
    cond_eye: int = 2
    win_width: int = 40
    bias_num_buckets: int = 32
    bias_max_distance: int = 32
    use_sparse_linear_attn: bool = True
    resnet_groups: int = 8
    init_kernel_size: int = 7
    attn_mode: str = "full"          # 'full' | 'local' (banded XLA) |
                                     # 'pallas' (fused VMEM kernel, TPU)
    dtype: Any = jnp.float32         # compute dtype (params stay float32);
                                     # bfloat16 keeps norm/softmax stats in f32
    # sequence parallelism (make_seq_sampler): frame axis sharded over
    # seq_mesh[seq_axis]; temporal attention switches to the shard_map +
    # halo-exchange formulation and the window-vector bias form ('full' is
    # numerically identical to 'local' — the -1e8 window mask zeroes
    # out-of-window weights exactly)
    seq_mesh: Optional[Any] = None
    seq_axis: str = "seq"
    seq_use_pallas: Optional[bool] = None
    # True = fuse the 3 condition cross-attentions (measured net e2e loss
    # on v5e — see ResnetBlockCaMul.fuse_cond; kept as an A/B hook)
    fuse_cond: Optional[bool] = None

    @property
    def cond_dim(self) -> int:
        return self.cond_aud + self.cond_pose + self.cond_eye

    @nn.compact
    def __call__(self, x: jax.Array, time: jax.Array,
                 cond: Optional[jax.Array] = None,
                 cond_drop_mask: Optional[jax.Array] = None,
                 static_feat: Optional[jax.Array] = None,
                 precompute_static: bool = False) -> jax.Array:
        """
        Args:
          x: (B, T, H, W, channels) noisy latent + image feature + bbox mask
            — or only the 3 noisy channels when ``static_feat`` is given, or
            the (channels-3) fea/mask channels when ``precompute_static``.
          time: (B,) int32 diffusion timestep (ignored for precompute).
          cond: (B, T, cond_dim) audio/pose/eye condition.
          cond_drop_mask: optional (B, T) bool; True frames get the null
            (zero) condition -- CFG dropout (:917-926; null cond is zeros when
            learn_null_cond=False, the shipped configuration).
          static_feat: (B, T, H, W, dim) precomputed init_conv contribution
            of the step-constant fea/mask channels (see SplitInitConv) —
            lets the DDIM scan skip the 272-channel conv + concat per step.
          precompute_static: return that contribution and nothing else.
        """
        b, t, h, w, _ = x.shape
        heads = self.attn_heads
        in_dtype = x.dtype
        x = x.astype(self.dtype)

        iks = self.init_kernel_size
        init_conv = SplitInitConv(self.dim, self.channels, iks, self.dtype,
                                  name="init_conv")
        if precompute_static:
            y = init_conv.static(x.reshape(b * t, h, w, -1))
            return y.reshape(b, t, h, w, self.dim).astype(in_dtype)

        if cond is not None and cond_drop_mask is not None:
            cond = jnp.where(cond_drop_mask[..., None], jnp.zeros_like(cond), cond)
        if cond is not None:
            cond = cond.astype(self.dtype)

        # T5 relative-position bias (+/- window mask), shared by all temporal attns
        bias_emb = self.param("time_rel_pos_bias",
                              nn.initializers.normal(1.0),
                              (self.bias_num_buckets, heads))
        seq_on = (self.seq_mesh is not None
                  and self.seq_mesh.shape.get(self.seq_axis, 1) > 1)
        if self.attn_mode in ("local", "pallas") or seq_on:
            pos_bias = None
            bias_vec = t5_bias_windowed_vector(bias_emb, self.win_width,
                                               self.bias_num_buckets,
                                               self.bias_max_distance)
        else:
            pos_bias = t5_bias_matrix(bias_emb, t, self.bias_num_buckets,
                                      self.bias_max_distance)
            pos_bias = pos_bias + jnp.asarray(window_mask(t, self.win_width))
            pos_bias = pos_bias[None, None]      # (1, 1, heads, T, T)
            bias_vec = None

        x2d = x.reshape(b * t, h, w, -1)
        if static_feat is None:
            x2d = init_conv.full(x2d)
        else:
            x2d = init_conv.noisy(x2d) + static_feat.astype(self.dtype).reshape(
                b * t, h, w, self.dim)
        x = x2d.reshape(b, t, h, w, self.dim)
        r = x

        def temporal(name):
            return PreNormResidualTemporal(
                heads, self.attn_dim_head, self.attn_mode, self.win_width,
                dtype=self.dtype, seq_mesh=self.seq_mesh,
                seq_axis=self.seq_axis, seq_use_pallas=self.seq_use_pallas,
                name=name)

        x = temporal("init_temporal_attn")(x, pos_bias, bias_vec)

        time_dim = self.dim * 4
        temb = sinusoidal_pos_emb(time, self.dim)
        temb = nn.Dense(time_dim, name="time_mlp_1")(temb)
        temb = nn.Dense(time_dim, name="time_mlp_2")(jax.nn.gelu(temb, approximate=False))

        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)

        cond_kw = dict(time_emb_dim=time_dim, cond_aud=self.cond_aud,
                       cond_pose=self.cond_pose, cond_eye=self.cond_eye,
                       groups=self.resnet_groups, dtype=self.dtype,
                       fuse_cond=self.fuse_cond)

        hs = []
        for ind, (_, dim_out) in enumerate(in_out):
            is_last = ind >= num_res - 1
            x = ResnetBlockCaMul(dim_out, **cond_kw, name=f"down_{ind}_block1")(x, temb, cond)
            x = ResnetBlockCaMul(dim_out, **cond_kw, name=f"down_{ind}_block2")(x, temb, cond)
            if self.use_sparse_linear_attn:
                x = PreNormResidualSpatialLinear(heads, dtype=self.dtype,
                                                 name=f"down_{ind}_spatial")(x)
            x = temporal(f"down_{ind}_temporal")(x, pos_bias, bias_vec)
            hs.append(x)
            if not is_last:
                x = Downsample(dim_out, dtype=self.dtype,
                               name=f"down_{ind}_downsample")(x)

        mid_dim = dims[-1]
        x = ResnetBlockCaMul(mid_dim, **cond_kw, name="mid_block1")(x, temb, cond)
        x = PreNormResidualSpatialFull(heads, dtype=self.dtype,
                                       name="mid_spatial_attn")(x)
        x = temporal("mid_temporal_attn")(x, pos_bias, bias_vec)
        x = ResnetBlockCaMul(mid_dim, **cond_kw, name="mid_block2")(x, temb, cond)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind >= num_res - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResnetBlockCaMul(dim_in, **cond_kw, name=f"up_{ind}_block1")(x, temb, cond)
            x = ResnetBlockCaMul(dim_in, **cond_kw, name=f"up_{ind}_block2")(x, temb, cond)
            if self.use_sparse_linear_attn:
                x = PreNormResidualSpatialLinear(heads, dtype=self.dtype,
                                                 name=f"up_{ind}_spatial")(x)
            x = temporal(f"up_{ind}_temporal")(x, pos_bias, bias_vec)
            if not is_last:
                x = Upsample(dim_in, dtype=self.dtype, name=f"up_{ind}_upsample")(x)

        x = jnp.concatenate([x, r], axis=-1)
        flow = ResnetBlockCaMul(self.dim, groups=self.resnet_groups,
                                dtype=self.dtype, name="final_block")(x)
        flow = nn.Conv(self.out_grid_dim, (1, 1), name="final_conv")(
            flow.reshape(b * t, h, w, -1)).reshape(b, t, h, w, self.out_grid_dim)
        occ = ResnetBlockCaMul(self.dim, groups=self.resnet_groups,
                               dtype=self.dtype, name="occlusion_block")(x)
        occ = nn.Conv(self.out_conf_dim, (1, 1), name="occlusion_conv")(
            occ.reshape(b * t, h, w, -1)).reshape(b, t, h, w, self.out_conf_dim)
        return jnp.concatenate([flow, occ], axis=-1).astype(in_dtype)
