"""Sliding-window (local) temporal attention — linear memory in sequence length.

This is the TPU replacement for the reference's VRAM-optimized local attention
(DM_3/modules/local_attention.py): the reference materializes (T, 2w+1)
scores with a per-position Python einsum loop (:71-99, used by
LocalSelfAttention_opt :275-342) and references a never-shipped CUDA kernel
(:12-22). Here the same math runs in two forms:

1. ``local_attention_banded`` — pure-XLA blockwise banded attention. Queries
   are chunked into blocks of ``BQ``; each block attends to a key stripe of
   ``BQ + 2*w_pad`` frames. Memory is O(T * (BQ + 2w)) instead of O(T^2) and
   every contraction is an MXU matmul. Differentiable, runs on CPU and TPU.
2. ``local_attention_pallas`` — a Pallas TPU kernel with the same blocking,
   fusing the QK^T -> bias/mask -> softmax -> AV chain in VMEM so the score
   stripe never touches HBM.

Semantics (identical to windowed full attention): attention weight of query i
over key j is softmax over the T5 relative-position bias b[j - i] for
|j - i| <= window and -1e8 otherwise (ca_multi_test.py:117, the -1e8 additive
mask underflows to an exact 0 weight in fp32), with zero-padding outside
[0, T). q must already be scaled and rotary-rotated (as in the reference,
rotation happens before windowing — local_attention.py:330-332).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


def _band_bias(heads: int, bq: int, kw: int, offset: int, window: int,
               bias_vec: Optional[jax.Array]) -> jax.Array:
    """(heads, bq, kw) additive bias for a key stripe starting at
    q_block_start + offset: rel = (offset + j) - i."""
    ii = np.arange(bq)[:, None]
    jj = np.arange(kw)[None, :]
    rel = offset + jj - ii
    in_window = np.abs(rel) <= window
    mask = np.where(in_window, 0.0, NEG_INF).astype(np.float32)
    if bias_vec is None:
        return jnp.asarray(mask)[None]
    idx = jnp.asarray(np.clip(rel + window, 0, 2 * window))
    return bias_vec[:, idx] + jnp.asarray(mask)[None]


def local_attention_banded(q: jax.Array, k: jax.Array, v: jax.Array,
                           bias_vec: Optional[jax.Array], window: int,
                           block_q: int = 128) -> jax.Array:
    """Banded local attention.

    Args:
      q, k, v: (N, H, T, D); q pre-scaled and pre-rotated.
      bias_vec: (H, 2*window+1) T5 bias values for rel in [-w, w], or None.
      window: static window half-width w.
      block_q: query block size.

    Returns: (N, H, T, D).
    """
    n, h, t, d = q.shape
    bq = min(block_q, max(8, t))
    nb = -(-t // bq)
    t_pad = nb * bq
    w_pad = window
    kw = bq + 2 * w_pad

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (w_pad, t_pad - t + w_pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (w_pad, t_pad - t + w_pad), (0, 0)))

    qb = qp.reshape(n, h, nb, bq, d)
    # overlapping key stripes: stripe b covers padded [b*bq, b*bq + kw)
    stripes_k = jnp.stack([jax.lax.dynamic_slice_in_dim(kp, b * bq, kw, axis=2)
                           for b in range(nb)], axis=2)  # (n, h, nb, kw, d)
    stripes_v = jnp.stack([jax.lax.dynamic_slice_in_dim(vp, b * bq, kw, axis=2)
                           for b in range(nb)], axis=2)

    scores = jnp.einsum("nhbid,nhbjd->nhbij", qb, stripes_k)

    # bias + window mask are block-independent; key validity is not.
    bias = _band_bias(h, bq, kw, -w_pad, window, bias_vec)      # (h, bq, kw)
    scores = scores + bias[None, :, None]

    jg = (np.arange(nb)[:, None] * bq - w_pad) + np.arange(kw)[None, :]
    key_valid = jnp.asarray(np.where((jg >= 0) & (jg < t), 0.0, NEG_INF),
                            dtype=scores.dtype)                  # (nb, kw)
    scores = scores + key_valid[None, None, :, None, :]

    scores = scores - jax.lax.stop_gradient(scores.max(axis=-1, keepdims=True))
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("nhbij,nhbjd->nhbid", attn, stripes_v)
    return out.reshape(n, h, t_pad, d)[:, :, :t]


def _local_attn_kernel(bias_ref, q_ref, k_hbm, v_hbm, o_ref,
                       k_vmem, v_vmem, sems, *, t: int, bq: int, w_pad: int,
                       kw: int):
    """Pallas kernel body for one (sequence*head, query-block) grid step.

    The overlapping key/value stripe [blk*bq, blk*bq + kw) of the padded
    sequence is DMA'd from HBM into VMEM scratch (overlap cannot be expressed
    with BlockSpec partitioning), then the fused QK^T -> +bias -> softmax ->
    AV chain runs entirely in VMEM.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s = pl.program_id(0)
    blk = pl.program_id(1)

    kdma = pltpu.make_async_copy(k_hbm.at[s, pl.ds(blk * bq, kw), :],
                                 k_vmem, sems.at[0])
    vdma = pltpu.make_async_copy(v_hbm.at[s, pl.ds(blk * bq, kw), :],
                                 v_vmem, sems.at[1])
    kdma.start()
    vdma.start()

    q = q_ref[0]                      # (bq, d)
    # key-validity mask: global j = blk*bq - w_pad + jj must lie in [0, T)
    jj = jax.lax.broadcasted_iota(jnp.int32, (bq, kw), 1)
    jg = blk * bq - w_pad + jj
    valid = (jg >= 0) & (jg < t)

    kdma.wait()
    scores = jnp.dot(q, k_vmem[...].T, preferred_element_type=jnp.float32)
    scores = scores + bias_ref[0]     # (bq, kw) T5 bias + window mask
    scores = jnp.where(valid, scores, NEG_INF)

    scores = scores - scores.max(axis=-1, keepdims=True)
    p = jnp.exp(scores)
    p = p / p.sum(axis=-1, keepdims=True)
    vdma.wait()
    o_ref[0] = jnp.dot(p.astype(v_vmem.dtype), v_vmem[...],
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def local_attention_pallas(q: jax.Array, k: jax.Array, v: jax.Array,
                           bias_vec: Optional[jax.Array], window: int,
                           block_q: int = 128,
                           interpret: bool = False) -> jax.Array:
    """Pallas TPU sliding-window attention. Same contract as the banded path."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, t, d = q.shape
    bq = min(block_q, max(8, t))
    nb = -(-t // bq)
    t_pad = nb * bq
    w_pad = window
    kw = bq + 2 * w_pad

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, t_pad - t), (0, 0))).reshape(n * h, t_pad, d)
    kp = jnp.pad(k, ((0, 0), (0, 0), (w_pad, t_pad - t + w_pad), (0, 0))).reshape(
        n * h, t_pad + 2 * w_pad, d)
    vp = jnp.pad(v, ((0, 0), (0, 0), (w_pad, t_pad - t + w_pad), (0, 0))).reshape(
        n * h, t_pad + 2 * w_pad, d)

    # per-head (bq, kw) bias+mask stripe, identical for every query block
    bias = _band_bias(h, bq, kw, -w_pad, window, bias_vec)        # (h, bq, kw)
    bias_full = jnp.broadcast_to(bias[None], (n, h, bq, kw)).reshape(n * h, bq, kw)

    kernel = functools.partial(_local_attn_kernel, t=t, bq=bq, w_pad=w_pad, kw=kw)
    out = pl.pallas_call(
        kernel,
        grid=(n * h, nb),
        in_specs=[
            pl.BlockSpec((1, bq, kw), lambda s, b: (s, 0, 0)),
            pl.BlockSpec((1, bq, d), lambda s, b: (s, b, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda s, b: (s, b, 0)),
        out_shape=jax.ShapeDtypeStruct((n * h, t_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((kw, d), q.dtype),
            pltpu.VMEM((kw, d), q.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(bias_full, qp, kp, vp)
    return out.reshape(n, h, t_pad, d)[:, :, :t]


def local_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    bias_vec: Optional[jax.Array], window: int) -> jax.Array:
    """Default dispatch: banded XLA implementation (portable, differentiable)."""
    return local_attention_banded(q, k, v, bias_vec, window)
