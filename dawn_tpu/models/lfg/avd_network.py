"""Animation-via-Disentanglement network (flax).

Capability parity with LFG/modules/avd_network.py:13-91: MLP encoders for
identity and pose region params, a decoder reconstructing region params, with
revert-axis-swap sign correction. Loaded by the animation path but not
trained in the reference repo.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import flax.linen as nn


class _MLP(nn.Module):
    widths: tuple
    out: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, w in enumerate(self.widths):
            x = nn.Dense(w, name=f"linear_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                             name=f"bn_{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.out, name="out")(x)


class AVDNetwork(nn.Module):
    num_regions: int = 10
    id_bottle_size: int = 64
    pose_bottle_size: int = 64
    revert_axis_swap: bool = True

    @staticmethod
    def region_params_to_emb(p: Dict[str, jax.Array]) -> jax.Array:
        mean, jac = p["shift"], p["affine"]
        emb = jnp.concatenate([mean, jac.reshape(jac.shape[0], jac.shape[1], -1)],
                              axis=-1)
        return emb.reshape(emb.shape[0], -1)

    def emb_to_region_params(self, emb: jax.Array) -> Dict[str, jax.Array]:
        emb = emb.reshape(emb.shape[0], self.num_regions, 6)
        return {"shift": emb[:, :, :2],
                "affine": emb[:, :, 2:].reshape(emb.shape[0], self.num_regions, 2, 2)}

    @nn.compact
    def __call__(self, x_id: Dict[str, jax.Array], x_pose: Dict[str, jax.Array],
                 train: bool = False) -> Dict[str, jax.Array]:
        if self.revert_axis_swap:
            affine = jnp.matmul(x_id["affine"], jnp.linalg.inv(x_pose["affine"]))
            sign = jnp.sign(affine[:, :, 0:1, 0:1])
            x_id = {"affine": x_id["affine"] * sign, "shift": x_id["shift"]}

        pose_emb = _MLP((256, 512, 1024), self.pose_bottle_size,
                        name="pose_encoder")(self.region_params_to_emb(x_pose), train)
        id_emb = _MLP((256, 512, 1024), self.id_bottle_size,
                      name="id_encoder")(self.region_params_to_emb(x_id), train)
        rec = _MLP((1024, 512, 256), (2 + 4) * self.num_regions,
                   name="decoder")(jnp.concatenate([pose_emb, id_emb], axis=1), train)
        out = self.emb_to_region_params(rec)
        out["covar"] = jnp.matmul(out["affine"],
                                  jnp.swapaxes(out["affine"], -1, -2))
        return out
