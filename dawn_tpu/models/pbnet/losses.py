"""PBnet loss registry — every loss the reference's trainer can be configured
with (PBnet/src/models/tools/losses.py `_matching_` :154-156): rc, rcw, kl,
reg, ssim, var, mmd, hp.

All functions take masked (B, T, D) motion tensors. Differences from the
reference, by design rather than omission:

- ``reg`` smooths the model OUTPUT. The reference computes the MSE between
  consecutive GROUND-TRUTH deltas (losses.py:23-35 uses x_delta only), which
  is constant w.r.t. the parameters and contributes no gradient — an upstream
  bug we do not reproduce.
- masked frames are excluded by multiplication instead of boolean
  masked-select (XLA needs static shapes); the normalizations match the
  reference's masked means exactly — except ``kl``, which the reference
  averages UNMASKED over padded frames too (losses.py:67-71) and we
  replicate as-is.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    """mean over valid frames; x (B, T, D), mask (B, T)."""
    denom = jnp.maximum(mask.sum(), 1.0) * x.shape[-1]
    return (x * mask[..., None]).sum() / denom


def rc_loss(out, x_delta, mask, **_):
    """MSE on Δ-motion over valid frames (losses.py:9-21)."""
    return _masked_mean(jnp.square(out - x_delta), mask)


def rcw_loss(out, x_delta, mask, **_):
    """Per-dimension weighted MSE (losses.py:37-59): rotation dims weighted 3x
    for 6/7-d pose, blink dims 3x for the joint 8-d layout."""
    d = out.shape[-1]
    if d == 6:
        w = np.array([3, 3, 3, 1, 1, 1], np.float32)
    elif d == 7:
        w = np.array([3, 3, 3, 1, 1, 1, 0.5], np.float32)
    elif d == 8:
        w = np.array([3, 3, 3, 0, 0, 0, 3, 3], np.float32)
    else:
        w = np.ones((d,), np.float32)
    w = jnp.asarray(w)
    return _masked_mean(jnp.square(out * w - x_delta * w), mask)


def reg_loss(out, x_delta, mask, **_):
    """Temporal smoothness on the OUTPUT (see module docstring)."""
    d = out[:, 1:] - out[:, :-1]
    m = mask[:, 1:] * mask[:, :-1]
    denom = jnp.maximum(m.sum(), 1.0) * out.shape[-1]
    return (jnp.square(d) * m[..., None]).sum() / denom


def kl_loss(mu, logvar, mask=None, **_):
    """Gaussian KL to N(0,1) — UNMASKED mean, exactly like the reference
    (losses.py:67-71 `torch.mean` over the full tensor, padded frames
    included; the encoder does emit mu/logvar on padded positions and the
    reference averages them in)."""
    del mask
    kl = -0.5 * (1.0 + logvar - jnp.square(mu) - jnp.exp(logvar))
    return kl.mean()


# ------------------------------------------------------------------ ssim

def _gaussian_window(size: int, sigma: float) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim_2d(a: jax.Array, b: jax.Array, window_size: int = 3,
            val_range: float = 1.0, sigma: float = 0.5) -> jax.Array:
    """2-D SSIM over (B, H, W) maps with a gaussian window
    (ssim_loss.py:7-37: sigma 0.5, C1=(0.01 v)^2, C2=(0.03 v)^2)."""
    win = jnp.asarray(_gaussian_window(window_size, sigma))[..., None, None]
    pad = window_size // 2

    def filt(x):
        return jax.lax.conv_general_dilated(
            x[..., None], win, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]

    mu1, mu2 = filt(a), filt(b)
    s11 = filt(a * a) - mu1 * mu1
    s22 = filt(b * b) - mu2 * mu2
    s12 = filt(a * b) - mu1 * mu2
    c1 = (0.01 * val_range) ** 2
    c2 = (0.03 * val_range) ** 2
    num = (2 * mu1 * mu2 + c1) * (2 * s12 + c2)
    den = (mu1 * mu1 + mu2 * mu2 + c1) * (s11 + s22 + c2)
    return (num / den).mean()


def ssim_loss(out, x_delta, mask, **_):
    """1 - SSIM over the (frames x dims) map after joint min/max
    normalization (losses.py:73-98 ssimnorm_loss, window 3)."""
    lo = jnp.minimum(x_delta.min(), out.min())
    hi = jnp.maximum(x_delta.max(), out.max())
    scale = jnp.maximum(hi - lo, 1e-8)
    a = (x_delta - lo) / scale
    b = (out - lo) / scale
    return 1.0 - ssim_2d(a * mask[..., None], b * mask[..., None],
                         window_size=3, val_range=1.0)


def var_loss(out, x_delta, mask, **_):
    """Mean per-(sequence, dim) temporal variance of the output, zeroed
    outside (0, 3) (losses.py:126-143 comput_var_loss)."""
    v = jnp.var(out, axis=1, ddof=1).mean()
    return jnp.where((v > 0) & (v < 3), v, 0.0)


# ------------------------------------------------------------------- mmd

def _mmd_kernel(x: jax.Array, y: jax.Array) -> jax.Array:
    d = jnp.square(x[:, None] - y[None]).mean(-1) / x.shape[-1]
    return jnp.exp(-d)


def mmd_loss(z, rng, **_):
    """Gaussian-kernel MMD between q(z) and N(0,1) samples (mmd.py:17-22);
    z flattened to (N, latent) as the reference's batch['z']."""
    zf = z.reshape(-1, z.shape[-1])
    true = jax.random.normal(rng, zf.shape)
    return (_mmd_kernel(true, true).mean() + _mmd_kernel(zf, zf).mean()
            - 2.0 * _mmd_kernel(true, zf).mean())


# ------------------------------------------------- hessian penalty (hp)

def hessian_penalty(rng: jax.Array, fn: Callable[[jax.Array], jax.Array],
                    x: jax.Array, k: int = 2, epsilon: float = 0.1) -> jax.Array:
    """Hessian penalty (Peebles et al. 2020, arXiv 2008.10599) of ``fn``'s
    output w.r.t. ``x``: variance of central second differences along k
    rademacher directions, max-reduced (hessian_penalty.py defaults
    k=2, epsilon=0.1, reduction=max). The reference applies it to the
    encoder latent (losses.py:62-64 via model.return_latent)."""
    dzs = epsilon * (2.0 * jax.random.bernoulli(
        rng, 0.5, (k,) + x.shape).astype(x.dtype) - 1.0)
    center = fn(x)

    def second_order(dz):
        return (fn(x + dz) - 2.0 * center + fn(x - dz)) / (epsilon ** 2)

    seconds = jax.vmap(second_order)(dzs)          # (k, ...)
    var = jnp.var(seconds, axis=0, ddof=1)
    return var.max()


_matching_: Dict[str, Callable] = {
    "rc": rc_loss, "rcw": rcw_loss, "reg": reg_loss, "kl": kl_loss,
    "ssim": ssim_loss, "var": var_loss, "mmd": mmd_loss,
}


def get_loss_function(ltype: str) -> Callable:
    return _matching_[ltype]


def get_loss_names():
    return list(_matching_.keys()) + ["hp"]
