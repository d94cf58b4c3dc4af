"""Test configuration: force an 8-device virtual CPU mesh for sharding tests.

Must set XLA flags before jax initializes. All tests run on CPU so they are
deterministic and runnable without TPU access; TPU execution is covered by
bench.py and __graft_entry__.py.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # env ships JAX_PLATFORMS=axon (TPU tunnel)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

# The image's sitecustomize registers the axon TPU plugin in every process and
# the env var alone does not win; force the CPU backend via config.
jax.config.update("jax_platforms", "cpu")
# Parity tests compare against torch float32; disable bf16 matmul passes.
jax.config.update("jax_default_matmul_precision", "highest")


def randomize_bn_stats(module, seed: int = 3):
    """Randomize a torch module's BatchNorm running_mean/running_var in place
    so eval-mode normalization is actually exercised (fresh modules carry
    identity stats). Shared by the three parity suites."""
    import numpy as np
    import torch
    sd = module.state_dict()
    rng = np.random.RandomState(seed)
    for k in sd:
        if k.endswith("running_mean"):
            sd[k] = torch.from_numpy(
                rng.randn(*sd[k].shape).astype(np.float32) * 0.1)
        if k.endswith("running_var"):
            sd[k] = torch.from_numpy(
                rng.rand(*sd[k].shape).astype(np.float32) + 0.5)
    module.load_state_dict(sd)
    return module
