"""Multi-process (multi-host) initialization.

The reference scales only within one host (single-process torch DataParallel,
SURVEY.md §2.6). dawn_tpu's SPMD step is already multi-host-shaped — the mesh
is built from ``jax.devices()`` (GLOBAL devices after jax.distributed
initialization) and GSPMD inserts ICI/DCN collectives — so the only missing
piece is process bootstrap, which this module owns.

Usage (same script on every host):
    from dawn_tpu.parallel.distributed import maybe_initialize_distributed
    maybe_initialize_distributed()        # no-op single-process unless
                                          # a coordinator is configured
    mesh = make_mesh()                    # over ALL hosts' devices

Bootstrap sources, in precedence order:
1. explicit arguments,
2. ``DAWN_COORDINATOR`` / ``DAWN_NUM_PROCESSES`` / ``DAWN_PROCESS_ID`` env,
3. cloud-TPU metadata (jax.distributed.initialize() auto-detects GCE/TPU-pod
   environments when called with no arguments).

Data loading: shard the global batch by ``process_index()`` /
``process_count()`` (each host feeds its addressable slice;
``host_local_batch_slice`` below) and build arrays with
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def maybe_initialize_distributed(coordinator_address: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when multi-process config is present.

    Returns True when running multi-process (jax.distributed initialized),
    False for the plain single-process path. Safe to call twice: an
    already-initialized runtime short-circuits (jax.distributed.initialize
    itself raises on a second call).
    """
    if jax.distributed.is_initialized():
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "DAWN_COORDINATOR")
    if num_processes is None and "DAWN_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["DAWN_NUM_PROCESSES"])
    if process_id is None and "DAWN_PROCESS_ID" in os.environ:
        process_id = int(os.environ["DAWN_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # cloud TPU pods auto-detect; anything else stays single-process
        if os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0:
            jax.distributed.initialize()
            return True
        return False

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def host_local_batch_slice(global_batch: int) -> slice:
    """This process's contiguous slice of a data-parallel global batch."""
    per = global_batch // jax.process_count()
    assert per * jax.process_count() == global_batch, (
        f"global batch {global_batch} not divisible by "
        f"{jax.process_count()} processes")
    start = jax.process_index() * per
    return slice(start, start + per)


def make_global_array(local_np, mesh, spec):
    """Host-local numpy shard -> globally sharded jax.Array on the mesh."""
    return jax.make_array_from_process_local_data(
        jax.sharding.NamedSharding(mesh, spec), local_np)
