"""pytorch-i3d checkpoint -> `dawn_tpu.evaluate.i3d` params (torch-free).

The public FVD backbone weights circulate as state dicts of the pytorch-i3d
`InceptionI3d` module (keys `Conv3d_1a_7x7.conv3d.weight`,
`Mixed_3b.b1a.bn.running_mean`, ..., `logits.conv3d.weight/bias`). This
converter maps that naming onto the flat param tree `i3d_forward` consumes:

- conv weights (O, I, t, h, w) -> (t, h, w, I, O)  [channels-last MXU layout]
- bn {weight, bias, running_mean, running_var} -> {scale, shift, mean, var}

Reads through `load_torch_file` (pure zip+pickle; no torch import needed).
Tested structurally + numerically against a torch-built network of the same
naming in tests/test_i3d.py.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from dawn_tpu.weights.torch_convert import load_torch_file

_STEM = ("Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3")
_BRANCHES = ("b0", "b1a", "b1b", "b2a", "b2b", "b3b")


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _unit_from_sd(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    p: Dict[str, Any] = {
        "w": jnp.asarray(_np(sd[f"{prefix}.conv3d.weight"])
                         .transpose(2, 3, 4, 1, 0))}
    if f"{prefix}.conv3d.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{prefix}.conv3d.bias"]))
    if f"{prefix}.bn.weight" in sd:
        p.update(
            scale=jnp.asarray(_np(sd[f"{prefix}.bn.weight"])),
            shift=jnp.asarray(_np(sd[f"{prefix}.bn.bias"])),
            mean=jnp.asarray(_np(sd[f"{prefix}.bn.running_mean"])),
            var=jnp.asarray(_np(sd[f"{prefix}.bn.running_var"])))
    return p


def convert_i3d(path_or_sd) -> Dict[str, Any]:
    """Path to a pytorch-i3d ``.pt``/``.pth`` state dict (or the loaded
    dict) -> params for ``i3d_forward``."""
    from dawn_tpu.evaluate.i3d import INCEPTION_CFG

    sd = (load_torch_file(path_or_sd) if isinstance(path_or_sd, str)
          else path_or_sd)
    if "state_dict" in sd:            # tolerate trainer-style wrapping
        sd = sd["state_dict"]
    params: Dict[str, Any] = {name: _unit_from_sd(sd, name)
                              for name in _STEM}
    for name in INCEPTION_CFG:
        params[name] = {br: _unit_from_sd(sd, f"{name}.{br}")
                        for br in _BRANCHES}
    params["logits"] = _unit_from_sd(sd, "logits")
    return params
