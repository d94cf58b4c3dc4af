"""Gaussian diffusion over the flow latent video: training loss + DDIM sampler.

Capability parity with GaussianDiffusion (ca_multi_test.py:988-1306):
cosine schedule, epsilon-prediction, l1/l2 loss, dynamic thresholding
(Imagen), eta-parameterized DDIM, classifier-free guidance, and the ancestral
p_sample loop. TPU redesign: the reference's per-step Python loop with
tqdm becomes a single ``lax.scan`` inside one jit — 20 UNet calls compile to
one XLA program with zero host round-trips.

All tensors are channels-last: x is (B, T, h, w, 3) = (2 flow + 1 occlusion).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dawn_tpu.ops.schedule import diffusion_buffers, ddim_times

# denoise_fn(x, time, cond, cond_drop_mask) -> eps prediction, all batched
DenoiseFn = Callable[..., jax.Array]


def _extract(buf: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-batch schedule value, broadcastable to an ndim tensor."""
    return buf[t].reshape(t.shape + (1,) * (ndim - 1))


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Stateless diffusion math; the denoiser is passed per-call."""
    timesteps: int = 1000
    sampling_timesteps: int = 20
    ddim_sampling_eta: float = 1.0
    loss_type: str = "l2"
    use_dynamic_thres: bool = True
    dynamic_thres_percentile: float = 0.9
    null_cond_prob: float = 0.1

    def __post_init__(self):
        bufs = diffusion_buffers(self.timesteps)
        object.__setattr__(self, "_bufs", {k: jnp.asarray(v) for k, v in bufs.items()})

    @property
    def bufs(self) -> Dict[str, jax.Array]:
        return self._bufs  # type: ignore[attr-defined]

    # ---------------------------------------------------------------- forward
    def q_sample(self, x_start: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        nd = x_start.ndim
        return (_extract(self.bufs["sqrt_alphas_cumprod"], t, nd) * x_start +
                _extract(self.bufs["sqrt_one_minus_alphas_cumprod"], t, nd) * noise)

    def predict_start_from_noise(self, x_t: jax.Array, t: jax.Array,
                                 noise: jax.Array) -> jax.Array:
        nd = x_t.ndim
        return (_extract(self.bufs["sqrt_recip_alphas_cumprod"], t, nd) * x_t -
                _extract(self.bufs["sqrt_recipm1_alphas_cumprod"], t, nd) * noise)

    def _threshold(self, x0: jax.Array) -> jax.Array:
        """Dynamic thresholding (ca_multi_test.py:1185-1196).

        The quantile runs as an exact bitwise binary search instead of
        jnp.quantile's full sort — the sort measured 47.5 ms/step on v5e at
        256^2/200f (~1 s of every 20-step video), the search ~1 ms.
        """
        if not self.use_dynamic_thres:
            return jnp.clip(x0, -1.0, 1.0)
        from dawn_tpu.ops.quantile import quantile_nonneg
        b = x0.shape[0]
        flat = jnp.abs(x0.reshape(b, -1))
        s = quantile_nonneg(flat, self.dynamic_thres_percentile)
        s = jnp.maximum(s, 1.0).reshape((b,) + (1,) * (x0.ndim - 1))
        return jnp.clip(x0, -s, s) / s

    def p_losses(self, denoise_fn: DenoiseFn, rng: jax.Array, x_start: jax.Array,
                 t: jax.Array, fea: jax.Array, bbox_mask: jax.Array,
                 cond: Optional[jax.Array],
                 noise: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Per-element eps loss. Returns (loss, pred_x0, cond_drop_mask).

        fea: (B, T, h, w, 256) image feature; bbox_mask: (B, T, h, w, 16).
        Reference: ca_multi_test.py:1234-1272 (loss is returned unreduced; the
        trainer mean-reduces and adds floss/mouth terms).
        """
        rng_noise, rng_drop = jax.random.split(rng)
        if noise is None:
            noise = jax.random.normal(rng_noise, x_start.shape, x_start.dtype)
        x_noisy = self.q_sample(x_start, t, noise)
        inp = jnp.concatenate([x_noisy, fea, bbox_mask], axis=-1)

        b, tt = x_start.shape[0], x_start.shape[1]
        drop = jax.random.uniform(rng_drop, (b, tt)) < self.null_cond_prob
        pred_noise = denoise_fn(inp, t, cond, drop)

        if self.loss_type == "l1":
            loss = jnp.abs(noise - pred_noise)
        elif self.loss_type == "l2":
            loss = jnp.square(noise - pred_noise)
        else:
            raise NotImplementedError(self.loss_type)

        pred_x0 = self._threshold(self.predict_start_from_noise(x_noisy, t, pred_noise))
        return loss, pred_x0, drop

    # ---------------------------------------------------------------- sampling
    def _cfg_eps(self, denoise_fn: DenoiseFn, inp, tvec, cond, cond_scale: float):
        """forward_with_cond_scale (:879-890); cond_scale is static."""
        eps = denoise_fn(inp, tvec, cond, None)
        if cond_scale == 1.0 or cond is None:
            return eps
        b, t = cond.shape[0], cond.shape[1]
        null_mask = jnp.ones((b, t), dtype=bool)
        null_eps = denoise_fn(inp, tvec, cond, null_mask)
        return null_eps + (eps - null_eps) * cond_scale

    def ddim_sample(self, denoise_fn: DenoiseFn, rng: jax.Array,
                    shape: Tuple[int, ...], fea: jax.Array, bbox_mask: jax.Array,
                    cond: Optional[jax.Array], cond_scale: float = 1.0,
                    noise_seq: Optional[jax.Array] = None) -> jax.Array:
        """DDIM sampling as one lax.scan (reference loop: :1156-1208).

        shape: (B, T, h, w, 3). ``noise_seq`` optionally supplies
        (steps+1, *shape) fixed gaussians (index 0 = x_T init, then one per
        step) for bitwise-reproducible parity tests.
        """
        pairs = np.asarray(ddim_times(self.timesteps, self.sampling_timesteps),
                           dtype=np.int32)                     # (S, 2)
        acp = self.bufs["alphas_cumprod_prev"]
        alphas = acp[pairs[:, 0]]
        alphas_next = acp[pairs[:, 1]]
        times = pairs[:, 0]
        nonzero_next = (pairs[:, 1] > 0).astype(jnp.float32)

        b = shape[0]
        if noise_seq is None:
            rng, rinit = jax.random.split(rng)
            img = jax.random.normal(rinit, shape)
        else:
            img = noise_seq[0]

        # fea=None signals the caller's denoise_fn already carries the
        # step-constant conditioning (precomputed init_conv static term) —
        # the per-step 272-channel concat disappears from the scan
        cond_inp = (jnp.concatenate([fea, bbox_mask], axis=-1)
                    if fea is not None else None)             # (B, T, h, w, 272)
        eta = self.ddim_sampling_eta

        def step(carry, xs):
            img, rng = carry
            (time, alpha, alpha_next, nz), i = xs
            tvec = jnp.full((b,), time, dtype=jnp.int32)
            inp = (jnp.concatenate([img, cond_inp], axis=-1)
                   if cond_inp is not None else img)
            pred_noise = self._cfg_eps(denoise_fn, inp, tvec, cond, cond_scale)
            x_start = self._threshold(
                self.predict_start_from_noise(img, tvec, pred_noise))

            sigma = eta * jnp.sqrt((1 - alpha / alpha_next) *
                                   (1 - alpha_next) / (1 - alpha))
            c = jnp.sqrt(jnp.maximum((1 - alpha_next) - sigma ** 2, 0.0))

            if noise_seq is None:
                rng, rstep = jax.random.split(rng)
                noise = jax.random.normal(rstep, img.shape)
            else:
                noise = noise_seq[i + 1]
            img = x_start * jnp.sqrt(alpha_next) + c * pred_noise + nz * sigma * noise
            return (img, rng), None

        xs = ((jnp.asarray(times), alphas, alphas_next, nonzero_next),
              jnp.arange(len(pairs)))
        (img, _), _ = jax.lax.scan(step, (img, rng), xs)
        return img

    def p_sample_loop(self, denoise_fn: DenoiseFn, rng: jax.Array,
                      shape: Tuple[int, ...], fea: jax.Array, bbox_mask: jax.Array,
                      cond: Optional[jax.Array], cond_scale: float = 1.0,
                      noise_seq: Optional[jax.Array] = None) -> jax.Array:
        """Full ancestral sampling over all train timesteps (:1124-1136).

        ``noise_seq`` optionally supplies (timesteps+1, *shape) fixed
        gaussians (index 0 = x_T init, then one per step — the reference's
        p_sample draws randn_like at EVERY step including t=0, :1117) for
        bitwise-reproducible parity tests.
        """
        b = shape[0]
        if noise_seq is None:
            rng, rinit = jax.random.split(rng)
            img = jax.random.normal(rinit, shape)
        else:
            img = noise_seq[0]
        cond_inp = (jnp.concatenate([fea, bbox_mask], axis=-1)
                    if fea is not None else None)
        bufs = self.bufs

        def step(carry, xs):
            img, rng = carry
            t_scalar, i = xs
            tvec = jnp.full((b,), t_scalar, dtype=jnp.int32)
            inp = (jnp.concatenate([img, cond_inp], axis=-1)
                   if cond_inp is not None else img)
            eps = self._cfg_eps(denoise_fn, inp, tvec, cond, cond_scale)
            x0 = self._threshold(self.predict_start_from_noise(img, tvec, eps))
            nd = img.ndim
            mean = (_extract(bufs["posterior_mean_coef1"], tvec, nd) * x0 +
                    _extract(bufs["posterior_mean_coef2"], tvec, nd) * img)
            logvar = _extract(bufs["posterior_log_variance_clipped"], tvec, nd)
            if noise_seq is None:
                rng, rstep = jax.random.split(rng)
                noise = jax.random.normal(rstep, img.shape)
            else:
                noise = noise_seq[i + 1]
            nonzero = (t_scalar > 0).astype(img.dtype)
            img = mean + nonzero * jnp.exp(0.5 * logvar) * noise
            return (img, rng), None

        ts = jnp.arange(self.timesteps - 1, -1, -1)
        (img, _), _ = jax.lax.scan(step, (img, rng),
                                   (ts, jnp.arange(self.timesteps)))
        return img

    def sample(self, denoise_fn: DenoiseFn, rng: jax.Array, shape,
               fea, bbox_mask, cond=None, cond_scale: float = 1.0,
               noise_seq=None) -> jax.Array:
        """Dispatch DDIM vs ancestral exactly as the reference (:1150)."""
        if self.sampling_timesteps < self.timesteps:
            return self.ddim_sample(denoise_fn, rng, shape, fea, bbox_mask,
                                    cond, cond_scale, noise_seq)
        return self.p_sample_loop(denoise_fn, rng, shape, fea, bbox_mask,
                                  cond, cond_scale, noise_seq)

    def interpolate(self, denoise_fn: DenoiseFn, rng: jax.Array, x1: jax.Array,
                    x2: jax.Array, fea, bbox_mask, cond=None,
                    t: Optional[int] = None, lam: float = 0.5,
                    noise_seq: Optional[jax.Array] = None) -> jax.Array:
        """Latent interpolation between two videos (:1210-1224).

        Note the reference's own ``interpolate`` is broken upstream — it
        calls ``p_sample(img, t)`` without the required ``fea`` argument
        (:1223 vs :1113) and raises TypeError; this implements the clearly
        intended semantics (the DDPM interpolate with the conditioning that
        every other sampler path threads through). ``noise_seq``:
        (2 + t, *shape) — [0]/[1] are the q_sample noises for x1/x2, then
        one per reverse step.
        """
        t = self.timesteps - 1 if t is None else t
        b = x1.shape[0]
        tb = jnp.full((b,), t, dtype=jnp.int32)
        if noise_seq is None:
            rng, r1, r2 = jax.random.split(rng, 3)
            n1 = jax.random.normal(r1, x1.shape)
            n2 = jax.random.normal(r2, x2.shape)
        else:
            n1, n2 = noise_seq[0], noise_seq[1]
        xt1 = self.q_sample(x1, tb, n1)
        xt2 = self.q_sample(x2, tb, n2)
        img = (1 - lam) * xt1 + lam * xt2
        cond_inp = jnp.concatenate([fea, bbox_mask], axis=-1)
        bufs = self.bufs

        def step(carry, xs):
            img, rng = carry
            t_scalar, i = xs
            tvec = jnp.full((b,), t_scalar, dtype=jnp.int32)
            inp = jnp.concatenate([img, cond_inp], axis=-1)
            eps = self._cfg_eps(denoise_fn, inp, tvec, cond, 1.0)
            x0 = self._threshold(self.predict_start_from_noise(img, tvec, eps))
            nd = img.ndim
            mean = (_extract(bufs["posterior_mean_coef1"], tvec, nd) * x0 +
                    _extract(bufs["posterior_mean_coef2"], tvec, nd) * img)
            logvar = _extract(bufs["posterior_log_variance_clipped"], tvec, nd)
            if noise_seq is None:
                rng, rstep = jax.random.split(rng)
                noise = jax.random.normal(rstep, img.shape)
            else:
                noise = noise_seq[i + 2]
            nonzero = (t_scalar > 0).astype(img.dtype)
            return (mean + nonzero * jnp.exp(0.5 * logvar) * noise, rng), None

        (img, _), _ = jax.lax.scan(step, (img, rng),
                                   (jnp.arange(t - 1, -1, -1), jnp.arange(t)))
        return img
