"""Diffusion noise schedule and derived buffers.

Replicates GaussianDiffusion's buffer construction (ca_multi_test.py:975-1055):
cosine beta schedule computed in float64, all derived buffers cast to float32.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine schedule (Nichol & Dhariwal), float64, clipped to [0, 0.9999]."""
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.9999)


def diffusion_buffers(timesteps: int = 1000) -> Dict[str, np.ndarray]:
    """All float32 buffers the sampler/trainer needs, keyed as in the reference."""
    betas = cosine_beta_schedule(timesteps)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)

    buf = {
        "betas": betas,
        "alphas_cumprod": alphas_cumprod,
        "alphas_cumprod_prev": alphas_cumprod_prev,
        "sqrt_alphas_cumprod": np.sqrt(alphas_cumprod),
        "sqrt_one_minus_alphas_cumprod": np.sqrt(1.0 - alphas_cumprod),
        "log_one_minus_alphas_cumprod": np.log(1.0 - alphas_cumprod),
        "sqrt_recip_alphas_cumprod": np.sqrt(1.0 / alphas_cumprod),
        "sqrt_recipm1_alphas_cumprod": np.sqrt(1.0 / alphas_cumprod - 1),
        "posterior_variance": posterior_variance,
        "posterior_log_variance_clipped": np.log(np.clip(posterior_variance, 1e-20, None)),
        "posterior_mean_coef1": betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod),
        "posterior_mean_coef2": (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod),
    }
    return {k: v.astype(np.float32) for k, v in buf.items()}


def ddim_times(total_timesteps: int, sampling_timesteps: int):
    """DDIM (time, time_next) pairs, matching ca_multi_test.py:1162-1164.

    torch.linspace(0, T, steps=S+2)[:-1] -> int -> reversed -> consecutive
    pairs. torch computes the linspace in float32 with its own SIMD fill
    order, and int-truncation amplifies half-ulp differences into off-by-one
    TIMESTEP INDICES for some step counts (e.g. S=25 at T=1000: 500 vs 499).
    When torch is importable we therefore defer to it (bit-exact for every
    S); the torch-free fallback is float64 linspace, which agrees with torch
    at the shipped configs (S=20, and the S=T p_sample_loop grid) but can
    differ by one index at unusual S values.
    """
    try:
        import torch
        times = torch.linspace(0.0, float(total_timesteps),
                               steps=sampling_timesteps + 2)[:-1]
        times = list(reversed([int(v) for v in times.tolist()]))
    except ImportError:
        times_np = np.linspace(0.0, total_timesteps, sampling_timesteps + 2)[:-1]
        times = list(reversed(times_np.astype(np.int64).tolist()))
    return list(zip(times[:-1], times[1:]))
