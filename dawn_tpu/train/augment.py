"""On-device video augmentation for DM training.

The reference applies torchvision ColorJitter to the whole video on the host
(mouth_mask_6D.py:212-220: hue ±0.04, contrast ±0.25, saturation ±0.25,
brightness ±64/255). Here the same jitter runs inside the jitted train step
(one random draw per video, shared by all frames, as ColorJitter does for a
stacked clip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-8), 0.0)
    rc = (maxc - r) / jnp.maximum(delta, 1e-8)
    gc = (maxc - g) / jnp.maximum(delta, 1e-8)
    bc = (maxc - b) / jnp.maximum(delta, 1e-8)
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta == 0, 0.0, (h / 6.0) % 1.0)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def color_jitter_video(rng: jax.Array, video: jax.Array,
                       brightness: float = 64.0 / 255,
                       contrast: float = 0.25,
                       saturation: float = 0.25,
                       hue: float = 0.04) -> jax.Array:
    """Jitter a (B, T, H, W, 3) video in [0, 1]; one draw per batch element."""
    b = video.shape[0]
    kb, kc, ks, kh = jax.random.split(rng, 4)
    bf = jax.random.uniform(kb, (b, 1, 1, 1, 1),
                            minval=max(0, 1 - brightness), maxval=1 + brightness)
    cf = jax.random.uniform(kc, (b, 1, 1, 1, 1),
                            minval=max(0, 1 - contrast), maxval=1 + contrast)
    sf = jax.random.uniform(ks, (b, 1, 1, 1), minval=max(0, 1 - saturation),
                            maxval=1 + saturation)
    hf = jax.random.uniform(kh, (b, 1, 1, 1), minval=-hue, maxval=hue)

    v = jnp.clip(video * bf, 0, 1)
    # torchvision contrast: blend with the mean of the grayscale image
    gray = (0.299 * v[..., 0] + 0.587 * v[..., 1] + 0.114 * v[..., 2])
    mean = gray.mean(axis=(1, 2, 3), keepdims=True)[..., None]
    v = jnp.clip(cf * v + (1 - cf) * mean, 0, 1)

    h, s, val = _rgb_to_hsv(v)
    s = jnp.clip(s * sf, 0, 1)
    h = (h + hf) % 1.0
    return jnp.clip(_hsv_to_rgb(h, s, val), 0, 1)
