"""Evaluation metrics for generated motion/video.

Capability parity with PBnet/src/evaluate (the ACTOR-inherited suite):
- frechet_distance: FID on feature distributions
  (action2motion/fid.py:6-60 calculate_frechet_distance).
- diversity: mean pairwise feature distance (action2motion diversity).
- temporal_smoothness: mean frame-to-frame delta, the 'reg'-style descriptive
  statistic used across the eval scripts.
Video-level FVD plugs in by extracting features with any video backbone and
feeding frechet_distance; lip-sync scoring needs an external SyncNet.
"""

from __future__ import annotations

import numpy as np
from scipy import linalg


def activation_statistics(feats: np.ndarray):
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray,
                     eps: float = 1e-6) -> float:
    """Frechet distance between gaussian fits of two feature sets (N, D)."""
    mu1, s1 = activation_statistics(feats_a)
    mu2, s2 = activation_statistics(feats_b)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(s1.dot(s2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(s1.shape[0]) * eps
        covmean = linalg.sqrtm((s1 + offset).dot(s2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(s1) + np.trace(s2)
                 - 2 * np.trace(covmean))


def diversity(feats: np.ndarray, num_pairs: int = 10000,
              seed: int = 0) -> float:
    """Mean euclidean distance between random feature pairs."""
    rng = np.random.RandomState(seed)
    n = feats.shape[0]
    i = rng.randint(n, size=num_pairs)
    j = rng.randint(n, size=num_pairs)
    return float(np.linalg.norm(feats[i] - feats[j], axis=-1).mean())


def temporal_smoothness(seq: np.ndarray) -> float:
    """Mean |x_t - x_{t+1}| over a (T, D) or (B, T, D) sequence."""
    d = np.diff(seq, axis=-2)
    return float(np.abs(d).mean())


def l1_reconstruction(pred: np.ndarray, target: np.ndarray) -> float:
    return float(np.abs(pred - target).mean())
