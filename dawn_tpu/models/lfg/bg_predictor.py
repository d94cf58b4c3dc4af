"""Background motion predictor: one 3x3 transform from (source, driving).

Capability parity with LFG/modules/bg_motion_predictor.py:15-58
(bg_type in {zero, shift, affine, perspective}; DAWN configs use 'affine').
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from dawn_tpu.models.lfg.blocks import HourglassEncoder


class BGMotionPredictor(nn.Module):
    block_expansion: int = 32
    num_channels: int = 3
    max_features: int = 1024
    num_blocks: int = 5
    bg_type: str = "affine"
    train_bn: bool = False
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, source_image: jax.Array, driving_image: jax.Array) -> jax.Array:
        bs = source_image.shape[0]
        eye = jnp.broadcast_to(jnp.eye(3, dtype=source_image.dtype), (bs, 3, 3))
        if self.bg_type == "zero":
            return eye

        feats = HourglassEncoder(self.block_expansion, self.num_blocks,
                                 self.max_features, self.train_bn, self.bn_axis,
                                 name="encoder")(
            jnp.concatenate([source_image, driving_image], axis=-1))
        pooled = feats[-1].mean(axis=(1, 2))

        ndim = {"shift": 2, "affine": 6, "perspective": 8}[self.bg_type]
        ident = {"shift": [0., 0.],
                 "affine": [1., 0., 0., 0., 1., 0.],
                 "perspective": [1., 0., 0., 0., 1., 0., 0., 0.]}[self.bg_type]
        pred = nn.Dense(ndim, kernel_init=nn.initializers.zeros,
                        bias_init=lambda *_: jnp.asarray(ident), name="fc")(pooled)

        if self.bg_type == "shift":
            out = eye.at[:, :2, 2].set(pred)
        elif self.bg_type == "affine":
            out = eye.at[:, :2, :].set(pred.reshape(bs, 2, 3))
        else:  # perspective
            out = eye.at[:, :2, :].set(pred[:, :6].reshape(bs, 2, 3))
            out = out.at[:, 2, :2].set(pred[:, 6:].reshape(bs, 2))
        return out
