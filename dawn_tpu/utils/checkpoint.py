"""Checkpoint save/restore via orbax — the resume subsystem.

Capability parity with the reference's torch.save dict-per-layer scheme and
resume logic (SURVEY.md section 5: rolling 'latest' checkpoints, restore-from
with start-step recomputation from the saved example count,
train...6D.py:199-214, 449-464; LFG/train.py:44-56, 133-153). Orbax handles
atomic async writes and TPU-sharded arrays natively.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, state: Dict[str, Any], step: int,
                    keep_latest: bool = True) -> str:
    """Write {directory}/step_{step} and update the 'latest' pointer."""
    import jax
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step:09d}")
    _ckptr().save(path, jax.device_get(state), force=True)
    if keep_latest:
        with open(os.path.join(directory, "LATEST"), "w") as f:
            f.write(os.path.basename(path))
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    marker = os.path.join(directory, "LATEST")
    if os.path.exists(marker):
        with open(marker) as f:
            return os.path.join(directory, f.read().strip())
    if not os.path.isdir(directory):
        return None
    steps = sorted(d for d in os.listdir(directory) if d.startswith("step_"))
    return os.path.join(directory, steps[-1]) if steps else None


def restore_checkpoint(directory_or_path: str,
                       template: Optional[Dict[str, Any]] = None):
    """Restore the newest checkpoint (or an explicit step path)."""
    path = directory_or_path
    if not os.path.basename(path).startswith("step_"):
        path = latest_checkpoint(directory_or_path)
        if path is None:
            return None
    return _ckptr().restore(path, item=template)


def restored_step(path_or_state) -> int:
    """Start step from a restored state (the reference recomputes start_step
    from the saved example count, train...6D.py:199-214)."""
    if isinstance(path_or_state, dict) and "step" in path_or_state:
        return int(np.asarray(path_or_state["step"]))
    return 0
