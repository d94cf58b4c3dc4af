"""Inflated 3D Inception (I3D) — the standard FVD feature backbone, in flax.

VERDICT r2 missing #2: `evaluate/quality.py`'s LFG-encoder Frechet is an
honest interim proxy but circular (the diffusion model is conditioned on
those very features). The fix is the community-standard FVD backbone:
Kinetics-400 I3D (Carreira & Zisserman 2017), whose released weights every
FVD implementation shares. This module is the TPU-side model; the torch
checkpoint (`rgb_imagenet.pt` / `rgb_charades.pt` from the public
pytorch-i3d release) converts through
`dawn_tpu.weights.i3d_convert.convert_i3d` (torch-free, zip+pickle reader)
and drops into `fvd_i3d` below. No pretrained weights exist in this image
(zero egress), so tests verify the architecture + converter against a
torch-side construction of the same network at small scale
(tests/test_i3d.py) — with real weights the same code computes real FVD.

Layout is TPU-native: (B, T, H, W, C) channels-last video, every conv an
MXU `lax.conv_general_dilated` with TF 'SAME' semantics (which jax shares,
including the asymmetric stride-2 case the pytorch port hand-replicates
with F.pad), BN in inference mode folded to scale+shift.

Structure matches the pytorch-i3d module tree (state-dict keys
`Conv3d_1a_7x7.conv3d.weight`, `Mixed_3b.b1a.bn.running_mean`,
`logits.conv3d.bias`, ...): a 7x7x7/2 stem, two conv blocks, nine
inception modules over three spatial scales, average pool and a 400-way
1x1x1 logits conv.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (branch channel spec, in_channels) per inception module:
# [b0, b1a, b1b, b2a, b2b, b3b]
INCEPTION_CFG = {
    "Mixed_3b": [64, 96, 128, 16, 32, 32],
    "Mixed_3c": [128, 128, 192, 32, 96, 64],
    "Mixed_4b": [192, 96, 208, 16, 48, 64],
    "Mixed_4c": [160, 112, 224, 24, 64, 64],
    "Mixed_4d": [128, 128, 256, 24, 64, 64],
    "Mixed_4e": [112, 144, 288, 32, 64, 64],
    "Mixed_4f": [256, 160, 320, 32, 128, 128],
    "Mixed_5b": [256, 160, 320, 32, 128, 128],
    "Mixed_5c": [384, 192, 384, 48, 128, 128],
}

BN_EPS = 1e-3


def _conv3d(x: jax.Array, w: jax.Array,
            stride: Sequence[int] = (1, 1, 1)) -> jax.Array:
    """(B,T,H,W,C) x (t,h,w,I,O) -> (B,T',H',W',O), TF-SAME padding."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=tuple(stride), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _unit3d(x: jax.Array, p: Dict[str, Any],
            stride: Sequence[int] = (1, 1, 1), relu: bool = True,
            bn: bool = True) -> jax.Array:
    x = _conv3d(x, p["w"], stride)
    if "b" in p:
        x = x + p["b"]
    if bn:
        inv = jax.lax.rsqrt(p["var"] + BN_EPS) * p["scale"]
        x = x * inv + (p["shift"] - p["mean"] * inv)
    return jax.nn.relu(x) if relu else x


def _maxpool(x: jax.Array, ksize: Sequence[int],
             stride: Sequence[int]) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1,) + tuple(ksize) + (1,),
        window_strides=(1,) + tuple(stride) + (1,), padding="SAME")


def _inception(x: jax.Array, p: Dict[str, Any]) -> jax.Array:
    b0 = _unit3d(x, p["b0"])
    b1 = _unit3d(_unit3d(x, p["b1a"]), p["b1b"])
    b2 = _unit3d(_unit3d(x, p["b2a"]), p["b2b"])
    b3 = _unit3d(_maxpool(x, (3, 3, 3), (1, 1, 1)), p["b3b"])
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def i3d_forward(params: Dict[str, Any], video: jax.Array,
                features: bool = True) -> jax.Array:
    """video: (B, T, H, W, 3) in [-1, 1] (224x224, T >= 9 recommended).

    features=True returns the 1024-d averaged pre-logits embedding (the
    common FVD feature); features=False returns the 400-way logits
    (time-averaged, pre-softmax — the StyleGAN-V FVD convention)."""
    x = _unit3d(video, params["Conv3d_1a_7x7"], stride=(2, 2, 2))
    x = _maxpool(x, (1, 3, 3), (1, 2, 2))
    x = _unit3d(x, params["Conv3d_2b_1x1"])
    x = _unit3d(x, params["Conv3d_2c_3x3"])
    x = _maxpool(x, (1, 3, 3), (1, 2, 2))
    x = _inception(x, params["Mixed_3b"])
    x = _inception(x, params["Mixed_3c"])
    x = _maxpool(x, (3, 3, 3), (2, 2, 2))
    for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
        x = _inception(x, params[name])
    x = _maxpool(x, (2, 2, 2), (2, 2, 2))
    x = _inception(x, params["Mixed_5b"])
    x = _inception(x, params["Mixed_5c"])
    # Logits head: avg-pool (2,7,7)/1 VALID, then mean over remaining T
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 7, 7, 1), (1, 1, 1, 1, 1),
        "VALID") / (2 * 7 * 7)
    if features:
        return x.mean(axis=(1, 2, 3))                     # (B, 1024)
    x = _unit3d(x, params["logits"], relu=False, bn=False)
    return x.mean(axis=(1, 2, 3))                         # (B, 400)


def init_i3d_params(rng: np.random.RandomState,
                    num_classes: int = 400) -> Dict[str, Any]:
    """Random params with the released-checkpoint channel plan (for tests
    and shape-checking; real use converts the torch checkpoint)."""

    def unit(cin, cout, k, bn=True, bias=False):
        p = {"w": jnp.asarray(
            rng.randn(*k, cin, cout).astype(np.float32)
            / np.sqrt(np.prod(k) * cin))}
        if bias:
            p["b"] = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.01)
        if bn:
            p.update(
                scale=jnp.asarray(rng.rand(cout).astype(np.float32) + 0.5),
                shift=jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1),
                mean=jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1),
                var=jnp.asarray(rng.rand(cout).astype(np.float32) + 0.5))
        return p

    def mixed(cin, cfg):
        b0, b1a, b1b, b2a, b2b, b3b = cfg
        return {
            "b0": unit(cin, b0, (1, 1, 1)),
            "b1a": unit(cin, b1a, (1, 1, 1)),
            "b1b": unit(b1a, b1b, (3, 3, 3)),
            "b2a": unit(cin, b2a, (1, 1, 1)),
            "b2b": unit(b2a, b2b, (3, 3, 3)),
            "b3b": unit(cin, b3b, (1, 1, 1)),
        }

    params: Dict[str, Any] = {
        "Conv3d_1a_7x7": unit(3, 64, (7, 7, 7)),
        "Conv3d_2b_1x1": unit(64, 64, (1, 1, 1)),
        "Conv3d_2c_3x3": unit(64, 192, (3, 3, 3)),
    }
    cin = 192
    for name, cfg in INCEPTION_CFG.items():
        params[name] = mixed(cin, cfg)
        cin = cfg[0] + cfg[2] + cfg[4] + cfg[5]
    params["logits"] = unit(1024, num_classes, (1, 1, 1), bn=False, bias=True)
    return params


def preprocess_videos(videos: np.ndarray, size: int = 224) -> jax.Array:
    """(N, T, H, W, 3) float in [0, 1] -> (N, T, 224, 224, 3) in [-1, 1]
    (the FVD input contract)."""
    x = jnp.asarray(videos, jnp.float32)
    n, t, h, w, c = x.shape
    if (h, w) != (size, size):
        x = jax.image.resize(x, (n, t, size, size, c), "bilinear")
    return x * 2.0 - 1.0


def i3d_video_features(params: Dict[str, Any], videos: np.ndarray,
                       batch: int = 4, logits: bool = False) -> np.ndarray:
    """(N, T, H, W, 3) in [0,1] -> (N, D) I3D embeddings (D=1024 features
    or 400 logits), batched to bound HBM."""
    fn = jax.jit(lambda v: i3d_forward(params, v, features=not logits))
    out = []
    for i in range(0, len(videos), batch):
        out.append(np.asarray(fn(preprocess_videos(videos[i: i + batch]))))
    return np.concatenate(out, axis=0)


def fvd_i3d(params: Dict[str, Any], real: np.ndarray,
            fake: np.ndarray, batch: int = 4) -> float:
    """Frechet Video Distance with the standard I3D backbone (same Frechet
    math as the LFG proxy — evaluate/metrics.py::frechet_distance)."""
    from dawn_tpu.evaluate.metrics import frechet_distance
    fr = i3d_video_features(params, real, batch)
    ff = i3d_video_features(params, fake, batch)
    return frechet_distance(fr, ff)
