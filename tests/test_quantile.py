"""Exact sort-free quantile vs jnp.quantile (the dynamic-thresholding op)."""

import numpy as np
import jax.numpy as jnp

from dawn_tpu.ops.quantile import quantile_nonneg

RNG = np.random.RandomState(3)


def _check(x, q):
    got = np.asarray(quantile_nonneg(jnp.asarray(x), q))
    ref = np.asarray(jnp.quantile(jnp.asarray(x), q, axis=-1))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


class TestQuantileNonneg:
    def test_matches_jnp_random(self):
        x = np.abs(RNG.randn(3, 1000).astype(np.float32))
        for q in (0.9, 0.5, 0.1, 0.973):
            _check(x, q)

    def test_duplicates_and_zeros(self):
        x = np.abs(RNG.randn(2, 500).astype(np.float32))
        x[:, ::3] = 0.0
        x[:, 1::5] = 1.25
        _check(x, 0.9)
        _check(x, 0.0)
        _check(x, 1.0)

    def test_exact_rank_no_interp(self):
        # q*(n-1) integral -> pure order statistic
        x = np.abs(RNG.randn(1, 101).astype(np.float32))
        _check(x, 0.9)  # 0.9 * 100 = 90 exactly

    def test_tiny_and_large_magnitudes(self):
        x = np.abs(RNG.randn(2, 256)).astype(np.float32)
        x[0] *= 1e-20
        x[1] *= 1e20
        _check(x, 0.9)

    def test_dawn_shape(self):
        # the 256^2/200f dynamic-thresholding tensor shape, flattened
        x = np.abs(RNG.randn(1, 200 * 64 * 64 * 3)).astype(np.float32)
        _check(x, 0.9)
