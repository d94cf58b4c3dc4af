"""Orbax checkpoint save/restore roundtrip + rolling-latest semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from dawn_tpu.utils.checkpoint import (
    latest_checkpoint, restore_checkpoint, restored_step, save_checkpoint,
)


def _state(step):
    return {"params": jnp.arange(8, dtype=jnp.float32) * (step + 1),
            "opt_state": {"mu": jnp.ones((4,)) * step},
            "step": jnp.asarray(step, jnp.int32)}


def test_roundtrip(tmp_path):
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, _state(5), 5)
    restored = restore_checkpoint(d, _state(0))
    assert restored_step(restored) == 5
    np.testing.assert_array_equal(np.asarray(restored["params"]),
                                  np.arange(8, dtype=np.float32) * 6)


def test_latest_pointer_tracks_newest(tmp_path):
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, _state(1), 1)
    save_checkpoint(d, _state(9), 9)
    assert latest_checkpoint(d).endswith("step_000000009")
    restored = restore_checkpoint(d, _state(0))
    assert restored_step(restored) == 9


def test_restore_missing_returns_none(tmp_path):
    assert restore_checkpoint(str(tmp_path / "nope")) is None


def test_sharded_state_roundtrip(tmp_path):
    """Multi-chip resume surface: a state sharded over the 8-dev mesh
    saves (host-gathered), restores into the template structure, and
    re-shards for the next step."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dawn_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    x = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    state = {"params": xs, "mu": {"w": jnp.ones((4,))},
             "step": jnp.asarray(3, jnp.int32)}
    d = str(tmp_path / "ck")
    save_checkpoint(d, state, 3)

    restored = restore_checkpoint(d, template=jax.device_get(state))
    assert restored_step(restored) == 3
    np.testing.assert_array_equal(np.asarray(restored["params"]),
                                  np.asarray(x))
    y = jax.device_put(jnp.asarray(restored["params"]),
                       NamedSharding(mesh, P("data")))
    assert len(y.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
