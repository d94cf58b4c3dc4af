"""PyTorch-exact image resampling primitives, channels-last (NHWC).

These replicate the exact numerics of the torch ops the DAWN reference relies
on (LFG/modules/generator.py:61-69 uses ``F.grid_sample`` +
``F.interpolate(mode='bilinear')``; LFG/modules/util.py uses
``F.interpolate(scale_factor=2)`` (nearest) and ``nn.AvgPool2d(2)``).
Matching ``align_corners=False`` semantics bit-for-bit is the #1 numerical
parity requirement for the flow-warping decode path.

All functions operate on ``(N, H, W, C)`` arrays (TPU-native layout).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_2d(img: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """Gather img[n, iy[n,p], ix[n,p], :] -> (N, P, C) with flat spatial indexing.

    Layout note (measured 2026-08-19, v5e): at C=3 the (N, P, C) gather
    output is lane-padded 3 -> 128 (42.7x memory) — 4 corner buffers of
    6.25 GB OOM'd an 800-frame/128^2 decode with lfg_decode_chunk=0. Two
    alternatives were tried and REJECTED: a logically transposed (N, C, P)
    take_along_axis (XLA layout assignment re-materializes the same padded
    buffer) and per-channel RANK-1 takes over the batch-flattened source
    (zero padding and it unblocks 800f, but 12 scalar-stream gathers run
    the 128^2/200f e2e bench at 166 vs 211 fps — a 21% regression). The
    right memory fix is bounding P via decode chunking
    (FlowDiffusionConfig.lfg_decode_chunk, bench.py auto-chunks >400
    frames); this gather stays in the fast padded layout."""
    n, h, w, c = img.shape
    flat = img.reshape(n, h * w, c)
    idx = iy * w + ix  # (N, P)
    return jnp.take_along_axis(flat, idx[..., None], axis=1)


def grid_sample(img: jax.Array, grid: jax.Array,
                align_corners: bool = False,
                padding_mode: str = "zeros") -> jax.Array:
    """Bilinear grid sample, torch ``F.grid_sample`` semantics.

    Defaults match torch's (mode='bilinear', padding_mode='zeros',
    align_corners=False); ``align_corners=True`` + ``padding_mode='border'``
    covers the misc.py resample helper (misc.py:116-138).

    Args:
      img:  (N, H, W, C)
      grid: (N, Ho, Wo, 2) with grid[..., 0] = x, grid[..., 1] = y in [-1, 1].

    Returns:
      (N, Ho, Wo, C)
    """
    n, h, w, c = img.shape
    _, ho, wo, _ = grid.shape
    gx = grid[..., 0].reshape(n, -1)
    gy = grid[..., 1].reshape(n, -1)

    if align_corners:
        # align_corners=True unnormalization: (coord + 1) / 2 * (size - 1)
        fx = (gx + 1.0) * 0.5 * (w - 1)
        fy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        # align_corners=False unnormalization: ((coord + 1) * size - 1) / 2
        fx = ((gx + 1.0) * w - 1.0) * 0.5
        fy = ((gy + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    lx = fx - x0
    ly = fy - y0

    out = jnp.zeros((n, ho * wo, c), dtype=img.dtype)
    for dy, wy in ((0, (1.0 - ly)), (1, ly)):
        for dx, wx in ((0, (1.0 - lx)), (1, lx)):
            ix = x0 + dx
            iy = y0 + dy
            ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
            iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
            vals = _gather_2d(img, iyc, ixc)
            wgt = wx * wy
            if padding_mode == "zeros":
                valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
                wgt = wgt * valid.astype(img.dtype)
            out = out + vals * wgt[..., None]
    # an f32 grid over a bf16 image promotes the accumulate; torch's
    # grid_sample returns the INPUT dtype — match it (accumulating at the
    # wider dtype first is strictly more accurate)
    return out.reshape(n, ho, wo, c).astype(img.dtype)


def grid_sample_shared(img: jax.Array, grid: jax.Array,
                       align_corners: bool = False,
                       padding_mode: str = "zeros") -> jax.Array:
    """grid_sample of ONE source per batch row against T flow fields.

    Equivalent to broadcasting ``img`` to (B*T, H, W, C) and calling
    ``grid_sample``, but the gathers index the SHARED (H*W, C) source
    directly — at 256^2/200f the skip-0 broadcast alone is 3.4 GB of HBM
    that this path never materializes, and the gather working set drops to
    the ~17 MB source (cache-resident) instead of a 3.4 GB stream.

    Args:
      img:  (B, H, W, C)
      grid: (B, T, Ho, Wo, 2), xy in [-1, 1].
    Returns:
      (B, T, Ho, Wo, C)
    """
    b, t, ho, wo, _ = grid.shape
    flat_grid = grid.reshape(b, t * ho * wo, 1, 2)
    out = grid_sample(img, flat_grid, align_corners, padding_mode)
    return out.reshape(b, t, ho, wo, img.shape[-1])


def interpolate_bilinear(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """torch ``F.interpolate(mode='bilinear', align_corners=False)`` on NHWC.

    Separable: build per-axis weight matrices (out, in) and contract — this
    maps onto the MXU instead of gathers.
    """
    n, h, w, c = img.shape

    def axis_weights(out_size: int, in_size: int) -> jnp.ndarray:
        if out_size == in_size:
            return jnp.eye(in_size, dtype=img.dtype)
        scale = in_size / out_size
        dst = jnp.arange(out_size, dtype=jnp.float32)
        src = jnp.maximum(scale * (dst + 0.5) - 0.5, 0.0)
        i0 = jnp.floor(src).astype(jnp.int32)
        i0 = jnp.clip(i0, 0, in_size - 1)
        i1 = jnp.minimum(i0 + 1, in_size - 1)
        lam = (src - i0.astype(jnp.float32)).astype(img.dtype)
        w0 = jax.nn.one_hot(i0, in_size, dtype=img.dtype) * (1.0 - lam)[:, None]
        w1 = jax.nn.one_hot(i1, in_size, dtype=img.dtype) * lam[:, None]
        return w0 + w1

    wy = axis_weights(out_h, h)  # (out_h, h)
    wx = axis_weights(out_w, w)  # (out_w, w)
    # HIGHEST precision: these weight matrices are tiny but the result feeds
    # the flow-warp parity path, where bf16 matmul drift is visible.
    hi = jax.lax.Precision.HIGHEST
    out = jnp.einsum("nhwc,oh->nowc", img, wy, precision=hi)
    out = jnp.einsum("nhwc,ow->nhoc", out, wx, precision=hi)
    return out


def interpolate_nearest(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """torch ``F.interpolate(mode='nearest')`` on NHWC (floor source index)."""
    n, h, w, c = img.shape
    iy = jnp.minimum((jnp.arange(out_h) * h // out_h), h - 1)
    ix = jnp.minimum((jnp.arange(out_w) * w // out_w), w - 1)
    return img[:, iy][:, :, ix]


def avg_pool_2x2(x: jax.Array) -> jax.Array:
    """torch ``nn.AvgPool2d(2)`` on NHWC."""
    n, h, w, c = x.shape
    x = x[:, : (h // 2) * 2, : (w // 2) * 2]
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(2, 4))
