"""Multi-process bootstrap tests (dawn_tpu.parallel.distributed).

jax.distributed.initialize is process-global, so the live check runs in a
subprocess; in-process tests cover the no-op path and the batch-slicing
helpers."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_single_process_noop():
    from dawn_tpu.parallel.distributed import maybe_initialize_distributed
    env_keys = ("DAWN_COORDINATOR", "DAWN_NUM_PROCESSES", "DAWN_PROCESS_ID")
    assert not any(k in os.environ for k in env_keys)
    assert maybe_initialize_distributed() is False


def test_host_local_batch_slice():
    from dawn_tpu.parallel.distributed import host_local_batch_slice
    assert host_local_batch_slice(16) == slice(0, 16)   # 1 process


def test_initialize_one_process_subprocess():
    code = """
import os, sys
sys.path.insert(0, {repo!r})
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["DAWN_COORDINATOR"] = "localhost:12391"
os.environ["DAWN_NUM_PROCESSES"] = "1"
os.environ["DAWN_PROCESS_ID"] = "0"
import jax
jax.config.update("jax_platforms", "cpu")
from dawn_tpu.parallel.distributed import maybe_initialize_distributed
assert maybe_initialize_distributed() is True
assert jax.process_count() == 1
print("OK")
""".format(repo=REPO)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    res = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0 and "OK" in res.stdout, res.stderr[-1500:]
