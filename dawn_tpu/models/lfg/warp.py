"""Flow warping utilities shared by the LFG generator and flow predictor.

TPU-native equivalents of LFG/modules/generator.py:61-90 (deform_input /
apply_optical) and LFG/modules/util.py:217-265 (AntiAliasInterpolation2d),
operating on NHWC with flow grids in normalized [-1, 1] xy coordinates.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from dawn_tpu.ops.resample import (
    grid_sample, grid_sample_shared, interpolate_bilinear)
from dawn_tpu.ops.convs import depthwise_conv2d


def deform_input_shared(inp: jax.Array, optical_flow: jax.Array) -> jax.Array:
    """Warp ONE source (B,H,W,C) by T flows (B,T,h,w,2) -> (B,T,H,W,C)
    without materializing the (B*T, H, W, C) source broadcast."""
    b, t, h_old, w_old, _ = optical_flow.shape
    _, h, w, _ = inp.shape
    if (h_old, w_old) != (h, w):
        flow_flat = optical_flow.reshape(b * t, h_old, w_old, 2)
        optical_flow = interpolate_bilinear(flow_flat, h, w).reshape(
            b, t, h, w, 2)
    return grid_sample_shared(inp, optical_flow)


def apply_optical_shared(input_skip: jax.Array, optical_flow: jax.Array,
                         occlusion_map: Optional[jax.Array] = None,
                         input_previous: Optional[jax.Array] = None) -> jax.Array:
    """apply_optical with a shared (B,H,W,C) skip and (B,T,...) flow/occ.

    ``input_previous`` (and the result) are flattened (B*T, h, w, C) to slot
    between the batched decoder convs.
    """
    b, t = optical_flow.shape[:2]
    out = deform_input_shared(input_skip, optical_flow)
    out = out.reshape((b * t,) + out.shape[2:])
    if occlusion_map is not None:
        occ = occlusion_map.reshape((b * t,) + occlusion_map.shape[2:])
        if occ.shape[1:3] != out.shape[1:3]:
            occ = interpolate_bilinear(occ, out.shape[1], out.shape[2])
        occ = occ.astype(out.dtype)
        if input_previous is not None:
            out = out * occ + input_previous.astype(out.dtype) * (1 - occ)
        else:
            out = out * occ
    return out


def deform_input(inp: jax.Array, optical_flow: jax.Array) -> jax.Array:
    """Warp ``inp`` (N,H,W,C) by a normalized flow grid (N,h,w,2).

    The flow is bilinearly resized to the input resolution first when shapes
    differ (generator.py:61-69 semantics, align_corners=False).
    """
    _, h_old, w_old, _ = optical_flow.shape
    _, h, w, _ = inp.shape
    if (h_old, w_old) != (h, w):
        optical_flow = interpolate_bilinear(optical_flow, h, w)
    return grid_sample(inp, optical_flow)


def apply_optical(input_skip: jax.Array, optical_flow: jax.Array,
                  occlusion_map: Optional[jax.Array] = None,
                  input_previous: Optional[jax.Array] = None) -> jax.Array:
    """Warp a skip feature and occlusion-blend with the decoder stream.

    out = warp(skip) * occ + previous * (1 - occ)   (generator.py:71-90).
    """
    out = deform_input(input_skip, optical_flow)
    if occlusion_map is not None:
        if occlusion_map.shape[1:3] != out.shape[1:3]:
            occlusion_map = interpolate_bilinear(occlusion_map, out.shape[1], out.shape[2])
        occlusion_map = occlusion_map.astype(out.dtype)
        if input_previous is not None:
            out = out * occlusion_map + input_previous.astype(out.dtype) * (
                1 - occlusion_map)
        else:
            out = out * occlusion_map
    return out


def make_coordinate_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(h, w, 2) grid of (x, y) in [-1, 1], torch align_corners=True style
    (LFG/modules/util.py:51-67: x = 2*(i/(size-1)) - 1)."""
    x = 2 * (np.arange(w) / (w - 1)) - 1
    y = 2 * (np.arange(h) / (h - 1)) - 1
    xx = np.broadcast_to(x[None, :], (h, w))
    yy = np.broadcast_to(y[:, None], (h, w))
    return jnp.asarray(np.stack([xx, yy], axis=-1), dtype=dtype)


def anti_alias_downsample(x: jax.Array, scale: float) -> jax.Array:
    """Gaussian blur + stride subsample (AntiAliasInterpolation2d, util.py:217).

    Used to shrink images before region/flow prediction (scale_factor 0.25).
    """
    if scale == 1.0:
        return x
    sigma = (1 / scale - 1) / 2
    ks = 2 * round(sigma * 4) + 1
    ka = ks // 2
    kb = ka - 1 if ks % 2 == 0 else ka
    grid = np.arange(ks, dtype=np.float64)
    g1 = np.exp(-((grid - (ks - 1) / 2) ** 2) / (2 * sigma ** 2))
    kernel = np.outer(g1, g1)
    kernel = (kernel / kernel.sum()).astype(np.float32)
    out = depthwise_conv2d(x, jnp.asarray(kernel), padding=((ka, kb), (ka, kb)))
    step = int(1 / scale)
    return out[:, ::step, ::step, :]


def region2gaussian(center: jax.Array, covar, h: int, w: int) -> jax.Array:
    """Region params -> gaussian heatmap (util.py:22-48).

    center: (..., 2) normalized xy; covar: float or (..., 2, 2).
    Returns (..., h, w).
    """
    grid = make_coordinate_grid(h, w, center.dtype)          # (h, w, 2)
    lead = center.shape[:-1]
    grid = jnp.broadcast_to(grid, lead + (h, w, 2))
    mean = center.reshape(lead + (1, 1, 2))
    d = grid - mean
    if isinstance(covar, float):
        return jnp.exp(-0.5 * jnp.sum(d * d, axis=-1) / covar)
    covar_inv = jnp.linalg.inv(covar).reshape(lead + (1, 1, 2, 2))
    under = jnp.einsum("...i,...ij,...j->...", d, covar_inv, d)
    return jnp.exp(-0.5 * under)
