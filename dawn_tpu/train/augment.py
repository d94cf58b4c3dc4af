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


# ---------------------------------------------------------- LFG pair augs
# numpy-side clip augmentation matching LFG/augmentation.py +
# config/hdtf128.yaml train_params.augmentation_params (horizontal+time flip,
# color jitter 0.1). Operates on a [source, driving] frame pair before it
# reaches the device.

def _np_adjust(clip, brightness, contrast, saturation, hue, rng):
    import numpy as np
    out = clip
    b = 1.0 + rng.uniform(-brightness, brightness)
    c = 1.0 + rng.uniform(-contrast, contrast)
    s = 1.0 + rng.uniform(-saturation, saturation)
    h = rng.uniform(-hue, hue)
    out = out * b
    mean = out.mean(axis=(-3, -2, -1), keepdims=True)
    out = (out - mean) * c + mean
    gray = out.mean(axis=-1, keepdims=True)
    out = (out - gray) * s + gray
    if hue:
        # hue rotation in YIQ space (rotate the chroma plane by 2*pi*h)
        theta = 2 * np.pi * h
        cs, sn = np.cos(theta), np.sin(theta)
        to_yiq = np.array([[0.299, 0.587, 0.114],
                           [0.596, -0.274, -0.322],
                           [0.211, -0.523, 0.312]], np.float32)
        rot = np.array([[1, 0, 0], [0, cs, -sn], [0, sn, cs]], np.float32)
        m = np.linalg.inv(to_yiq) @ rot @ to_yiq
        out = out @ m.T
    return np.clip(out, 0.0, 1.0)


def augment_frame_pair(rng, source, driving,
                       horizontal_flip: bool = True, time_flip: bool = True,
                       brightness: float = 0.1, contrast: float = 0.1,
                       saturation: float = 0.1, hue: float = 0.1):
    """[source, driving] (H, W, 3) float [0,1] -> augmented pair.

    RandomFlip (augmentation.py:91-103: horizontal flips both frames; time
    flip swaps source/driving) + ColorJitter applied consistently to the
    clip (:217-321; AllAugmentationTransform :323-345).
    """
    import numpy as np
    if time_flip and rng.rand() < 0.5:
        source, driving = driving, source
    if horizontal_flip and rng.rand() < 0.5:
        source = source[:, ::-1]
        driving = driving[:, ::-1]
    clip = np.stack([source, driving])
    clip = _np_adjust(clip, brightness, contrast, saturation, hue, rng)
    return clip[0], clip[1]
