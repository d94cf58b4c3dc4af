"""Exact quantile of non-negative f32 data without sorting.

``jnp.quantile`` lowers to a full sort — measured 47.5 ms/step on v5e for the
DAWN dynamic-thresholding tensor at 256^2/200f (2.46M elements), i.e. ~1 s of
every sampled video (ca_multi_test.py:1185-1196 calls torch.quantile every
DDIM step). For non-negative floats the IEEE-754 bit pattern is monotonic in
value, so the k-th order statistic can be found EXACTLY with a 31-step binary
search over the bit space, each step one fused compare+count pass (HBM-bound,
~10 MB/pass here) instead of an O(n log n) sort.

Semantics match ``jnp.quantile(x, q, axis=-1)`` with the default linear
interpolation: pos = q*(n-1), result = v[floor(pos)] * (1-frac) +
v[ceil(pos)] * frac on the sorted values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _kth_smallest_bits(bits: jax.Array, ks: jax.Array) -> jax.Array:
    """bits: (B, N) int32 views of non-negative f32; ks: (R, B) int32 ranks
    (0-indexed). Returns (R, B) k-th smallest bit patterns, exactly. All R
    searches run in ONE loop so each iteration reads ``bits`` once (the R
    compare+count reductions fuse into a single pass)."""
    r, b = ks.shape
    lo = jnp.zeros((r, b), jnp.int32)
    # all finite non-negative f32 bit patterns are < 0x7f800001
    hi = jnp.full((r, b), jnp.int32(0x7F800000))

    def body(_, carry):
        lo, hi = carry
        mid = lo + (hi - lo) // 2                      # (R, B)
        cnt = jnp.sum(bits[None] <= mid[:, :, None], axis=-1).astype(jnp.int32)
        take_hi = cnt >= ks + 1                       # kth smallest is <= mid
        hi = jnp.where(take_hi, mid, hi)
        lo = jnp.where(take_hi, lo, mid + 1)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, 31, body, (lo, hi))
    return lo


def quantile_nonneg(x: jax.Array, q: float) -> jax.Array:
    """Exact q-quantile along the last axis of non-negative f32 ``x``.

    x: (B, N) with every element >= 0 (DAWN uses |pred_x0|). Returns (B,).

    NaN handling matches ``jnp.quantile``: any NaN in a row propagates to
    that row's result (NaN bit patterns exceed the finite search bound, so
    without the guard they would be silently ignored and a diverged model's
    NaN x0 would be masked instead of surfacing through dynamic
    thresholding). The guard is one extra fused pass over data already read.
    """
    assert x.ndim == 2, x.shape
    n = x.shape[-1]
    b = x.shape[0]
    xf = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(xf, jnp.int32)
    pos = q * (n - 1)
    k_lo = int(pos)
    frac = pos - k_lo
    if frac == 0.0 or k_lo + 1 > n - 1:
        ks = jnp.full((1, b), k_lo, jnp.int32)
        v = _kth_smallest_bits(bits, ks)
        out = jax.lax.bitcast_convert_type(v[0], jnp.float32)
    else:
        ks = jnp.stack([jnp.full((b,), k_lo, jnp.int32),
                        jnp.full((b,), k_lo + 1, jnp.int32)])
        v = _kth_smallest_bits(bits, ks)
        vf = jax.lax.bitcast_convert_type(v, jnp.float32)
        out = vf[0] * (1.0 - frac) + vf[1] * frac
    return jnp.where(jnp.any(jnp.isnan(xf), axis=-1), jnp.nan, out)
