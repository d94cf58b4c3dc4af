"""Frequency-domain losses/filters on the flow video (temporal axis).

Capability parity with filter_fourier.py: hf_loss_2 (:77-88, the "floss"
used by the training wrapper — L1 in rFFT space along frames vs GT),
fourier_filter (:21-48 2-D gaussian low-pass), fourier_filter_1d (:50-67),
naive_filter (:123-127) and a 1-D Kalman smoother (:90-121) vectorized with
lax.scan instead of the reference's per-element Python loop.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def hf_loss_2(pred: jax.Array, target: jax.Array, axis: int = 1) -> jax.Array:
    """|rfft(target) - rfft(pred)| along the frame axis (filter_fourier.py:77).

    pred/target: (B, T, ...) videos; returns the per-element magnitude map.
    """
    fx = jnp.fft.rfft(pred, axis=axis)
    fy = jnp.fft.rfft(target, axis=axis)
    return jnp.abs(fy - fx)


def hf_loss(fea: jax.Array, mask: jax.Array, axis: int = 1) -> jax.Array:
    """|rfft(fea) * (1 - mask)| along ``axis`` (filter_fourier.py:69-75).

    The unused-by-the-pipeline plain variant, kept for registry completeness:
    ``mask`` is a low-pass weighting in rFFT space (the reference passes a
    gaussian density); the loss is the masked high-frequency magnitude.
    """
    f = jnp.fft.rfft(fea, axis=axis)
    return jnp.abs(f * (1.0 - mask))


def fourier_filter_1d(x: jax.Array, axis: int = 0) -> jax.Array:
    """Zero out the top 3/4 of temporal frequencies (filter_fourier.py:50-67)."""
    n = x.shape[axis]
    f = jnp.fft.rfft(x, axis=axis)
    keep = jnp.arange(f.shape[axis]) < (n // 4)
    shape = [1] * f.ndim
    shape[axis] = f.shape[axis]
    f = f * keep.reshape(shape)
    return jnp.real(jnp.fft.irfft(f, n=n, axis=axis))


def _gaussian_pdf(x, mean, std):
    return (1.0 / (std * np.sqrt(2 * np.pi))) * np.exp(-((x - mean) ** 2) / (2 * std ** 2))


def fourier_filter_2d(fea: jax.Array) -> jax.Array:
    """Gaussian low-pass in 2-D frequency space (filter_fourier.py:21-48).

    fea: (L, H, W, C) frames; gaussian map from linspace(-10, 10, H), std 3,
    rescaled by x3 and clipped to [0, 1].
    """
    l, h, w, c = fea.shape
    # the gaussian map is (H, H), exactly like the reference
    # (filter_fourier.py builds it from the H axis only) — square frames only
    assert h == w, f"fourier_filter_2d is square-only (got {h}x{w})"
    xs = np.linspace(-10, 10, h)
    gm = np.outer(_gaussian_pdf(xs, 0.0, 3.0), _gaussian_pdf(xs, 0.0, 3.0))
    gm = np.clip(gm / gm.max() * 3, 0, 1).astype(np.float32)
    f = jnp.fft.fft2(fea, axes=(1, 2))
    f = jnp.fft.fftshift(f, axes=(1, 2)) * jnp.asarray(gm)[None, :, :, None]
    return jnp.real(jnp.fft.ifft2(jnp.fft.ifftshift(f, axes=(1, 2)), axes=(1, 2)))


def naive_filter(fea: jax.Array, thresh: float = 1.0 / 64) -> jax.Array:
    """Zero sub-threshold flow magnitudes (filter_fourier.py:123-127)."""
    return fea * (jnp.abs(fea) > thresh)


def kalman_filter_1d(observations: jax.Array, a: float = 1.0, h: float = 1.0,
                     q: float = 0.01, r: float = 0.1, axis: int = 0) -> jax.Array:
    """1-D Kalman smoothing along ``axis`` (filter_fourier.py:90-121) as a scan."""
    obs = jnp.moveaxis(observations, axis, 0)

    def step(carry, z):
        x, p = carry
        x_pred = a * x
        p_pred = a * p * a + q
        k = p_pred * h / (h * p_pred * h + r)
        x_new = x_pred + k * (z - h * x_pred)
        p_new = (1 - k * h) * p_pred
        return (x_new, p_new), x_new

    init = (jnp.zeros_like(obs[0]), jnp.ones_like(obs[0]))
    _, out = jax.lax.scan(step, init, obs)
    return jnp.moveaxis(out, 0, axis)
