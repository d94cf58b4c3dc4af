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
