"""T5-style relative position bias + sliding-window mask.

Replicates the bucket math of the reference's RelativePositionBias
(ca_multi_test.py:77-118 in the DM UNet, with num_buckets=32,
max_distance=32 and an additive -1e8 window mask; PBnet's decoder variant
uses num_buckets/max_distance from opt.yaml and a hard ±100 eval window).

The bias is a function of (j - i) only, so for windowed attention we expose a
per-relative-offset vector that the Pallas kernel consumes directly.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def relative_position_bucket(relative_position: np.ndarray, num_buckets: int = 32,
                             max_distance: int = 128) -> np.ndarray:
    """Bidirectional T5 bucket indices; exact torch .long() truncation semantics."""
    rel = np.asarray(relative_position, dtype=np.int64)
    ret = np.zeros_like(rel)
    n = -rel

    num_buckets //= 2
    ret += (n < 0).astype(np.int64) * num_buckets
    n = np.abs(n)

    max_exact = num_buckets // 2
    is_small = n < max_exact

    # torch computes this in float32 then truncates toward zero with .long();
    # n is clamped to >=1 inside the log (those entries are masked by is_small)
    val_if_large = max_exact + (
        np.log(np.maximum(n, 1).astype(np.float32) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)

    ret += np.where(is_small, n, val_if_large)
    return ret


def t5_bucket_ids(n: int, num_buckets: int = 32, max_distance: int = 128) -> np.ndarray:
    """(n, n) bucket ids for rel = j - i."""
    q = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    return relative_position_bucket(k - q, num_buckets, max_distance)


def t5_bias_matrix(embedding: jnp.ndarray, n: int, num_buckets: int = 32,
                   max_distance: int = 128) -> jnp.ndarray:
    """Full (heads, n, n) bias from an (num_buckets, heads) embedding table."""
    ids = t5_bucket_ids(n, num_buckets, max_distance)
    values = embedding[jnp.asarray(ids)]          # (n, n, heads)
    return jnp.transpose(values, (2, 0, 1))


def window_mask(n: int, window: int) -> np.ndarray:
    """(n, n) additive mask: 0 inside |j - i| <= window, -1e8 outside.

    Matches ca_multi_test.py:117: -(((rel > w) + (rel < -w)) * 1e8).
    """
    q = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    rel = k - q
    return np.where(np.abs(rel) > window, -1e8, 0.0).astype(np.float32)


def t5_bias_windowed_vector(embedding: jnp.ndarray, window: int,
                            num_buckets: int = 32,
                            max_distance: int = 128) -> jnp.ndarray:
    """(heads, 2*window+1) bias values for rel in [-window, window].

    This is all the Pallas local-attention kernel needs: outside the window
    the additive -1e8 mask drives the softmax weight to exactly 0 in fp32, so
    windowed-full-attention and the local kernel agree bitwise up to reduction
    order.
    """
    rel = np.arange(-window, window + 1)
    ids = relative_position_bucket(rel, num_buckets, max_distance)
    values = embedding[jnp.asarray(ids)]          # (2w+1, heads)
    return values.T
