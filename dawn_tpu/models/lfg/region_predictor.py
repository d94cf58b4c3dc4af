"""Region predictor: 10 region heatmaps -> shift + PCA/SVD affine.

Capability parity with LFG/modules/region_predictor.py:28-118. The reference
round-trips every covariance through ``torch.svd`` **on CPU**
(region_predictor.py:16-25); here the batched 2x2 SVD stays on-device via
``jnp.linalg.svd`` — no host sync in the training step.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from dawn_tpu.models.lfg.blocks import Hourglass
from dawn_tpu.models.lfg.warp import anti_alias_downsample, make_coordinate_grid


class RegionPredictor(nn.Module):
    block_expansion: int = 32
    num_regions: int = 10
    num_channels: int = 3
    max_features: int = 1024
    num_blocks: int = 5
    temperature: float = 0.1
    estimate_affine: bool = True
    scale_factor: float = 0.25
    pca_based: bool = True
    pad: int = 3
    train_bn: bool = False
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        if self.scale_factor != 1:
            x = anti_alias_downsample(x, self.scale_factor)

        feature_map = Hourglass(self.block_expansion, in_features=self.num_channels,
                                max_features=self.max_features, num_blocks=self.num_blocks,
                                train_bn=self.train_bn, bn_axis=self.bn_axis,
                                name="predictor")(x)
        prediction = nn.Conv(self.num_regions, (7, 7), padding=self.pad,
                             name="regions")(feature_map)

        n, h, w, r = prediction.shape
        heat = jax.nn.softmax(
            prediction.reshape(n, h * w, r) / self.temperature, axis=1
        ).reshape(n, h, w, r)

        grid = make_coordinate_grid(h, w, heat.dtype)            # (h, w, 2)
        # shift: heatmap-weighted mean coordinate (region2affine, :60-75)
        mean = jnp.einsum("nhwr,hwc->nrc", heat, grid)

        params: Dict[str, jax.Array] = {
            "shift": mean,
            "heatmap": jnp.moveaxis(heat, -1, 1),  # (n, r, h, w) torch order
        }

        if self.estimate_affine and self.pca_based:
            d = grid[None, :, :, None, :] - mean[:, None, None, :, :]  # (n,h,w,r,2)
            covar = jnp.einsum("nhwri,nhwrj,nhwr->nrij", d, d, heat)
            params["covar"] = covar
            u, s, _ = jnp.linalg.svd(covar)
            params["affine"] = u * jnp.sqrt(s)[..., None, :]  # u @ diag(sqrt(s))
            params["u"] = u
            params["d"] = jnp.sqrt(s)
        elif self.estimate_affine:
            # FOMM-style regression head (region_predictor.py:44-50,96-107)
            jac_map = nn.Conv(4, (7, 7), padding=self.pad,
                              kernel_init=nn.initializers.zeros,
                              bias_init=lambda *_: jnp.asarray([1., 0., 0., 1.]),
                              name="jacobian")(feature_map)
            jac = jnp.einsum("nhwr,nhwk->nrk", heat, jac_map).reshape(n, r, 2, 2)
            params["affine"] = jac
            params["covar"] = jac @ jnp.swapaxes(jac, -1, -2)
        return params
