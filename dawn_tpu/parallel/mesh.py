"""Device mesh + sharding helpers.

The reference's only parallelism is single-process torch DataParallel with a
sync-BN collective (SURVEY.md section 2.6). The TPU equivalent is SPMD over a
jax Mesh: batch ('data') and frame ('seq') axes sharded, parameters
replicated, gradient psums inserted by GSPMD. Sequence sharding of the frame
axis gives the temporal attention genuine sequence parallelism over ICI; the
video-wide GroupNorm and the temporal-FFT loss reshard automatically.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, str] = ("data", "seq"),
              seq_parallel: int = 1) -> Mesh:
    """Mesh over the first n devices: ('data', 'seq') = (n/seq, seq)."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    assert n % seq_parallel == 0, (n, seq_parallel)
    grid = np.asarray(devices).reshape(n // seq_parallel, seq_parallel)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh, ndim: int, seq_axis: Optional[int] = 1) -> NamedSharding:
    """Shard axis 0 over 'data' and (optionally) seq_axis over 'seq'."""
    spec = [None] * ndim
    spec[0] = "data"
    if seq_axis is not None and ndim > seq_axis:
        spec[seq_axis] = "seq"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
