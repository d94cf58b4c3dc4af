"""Pixelwise flow predictor: sparse region motions -> dense flow + occlusion.

Capability parity with LFG/modules/pixelwise_flow_predictor.py:17-138.
All region warps are batched into a single grid_sample over the
(num_regions + 1) hypothesis axis.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from dawn_tpu.models.lfg.blocks import Hourglass
from dawn_tpu.models.lfg.warp import (
    anti_alias_downsample, make_coordinate_grid, region2gaussian,
)
from dawn_tpu.ops.resample import grid_sample


class PixelwiseFlowPredictor(nn.Module):
    block_expansion: int = 64
    num_blocks: int = 5
    max_features: int = 1024
    num_regions: int = 10
    num_channels: int = 3
    estimate_occlusion_map: bool = True
    scale_factor: float = 0.25
    region_var: float = 0.01
    use_covar_heatmap: bool = True
    use_deformed_source: bool = True
    revert_axis_swap: bool = True
    train_bn: bool = False
    bn_axis: Optional[str] = None

    def heatmap_representations(self, h, w, driving_params, source_params):
        """Gaussian difference heatmaps + zero background channel (:48-64)."""
        covar_d = driving_params["covar"] if self.use_covar_heatmap else self.region_var
        covar_s = source_params["covar"] if self.use_covar_heatmap else self.region_var
        g_driving = region2gaussian(driving_params["shift"], covar_d, h, w)
        g_source = region2gaussian(source_params["shift"], covar_s, h, w)
        heatmap = g_driving - g_source                       # (n, r, h, w)
        zeros = jnp.zeros_like(heatmap[:, :1])
        return jnp.concatenate([zeros, heatmap], axis=1)     # (n, r+1, h, w)

    def sparse_motions(self, h, w, driving_params, source_params, bg_params=None):
        """Per-region driving->source coordinate maps (:66-93). (n, r+1, h, w, 2)."""
        shift_d = driving_params["shift"]                    # (n, r, 2)
        shift_s = source_params["shift"]
        n, r, _ = shift_d.shape
        identity = make_coordinate_grid(h, w, shift_d.dtype)  # (h, w, 2)
        coord = identity[None, None] - shift_d[:, :, None, None, :]
        if "affine" in driving_params:
            affine = jnp.matmul(source_params["affine"],
                                jnp.linalg.inv(driving_params["affine"]))
            if self.revert_axis_swap:
                affine = affine * jnp.sign(affine[:, :, 0:1, 0:1])
            coord = jnp.einsum("nrij,nrhwj->nrhwi", affine, coord)
        driving_to_source = coord + shift_s[:, :, None, None, :]

        bg_grid = jnp.broadcast_to(identity[None, None], (n, 1, h, w, 2))
        if bg_params is not None:
            homo = jnp.concatenate([bg_grid, jnp.ones_like(bg_grid[..., :1])], axis=-1)
            warped = jnp.einsum("nij,nrhwj->nrhwi", bg_params, homo)
            bg_grid = warped[..., :2] / warped[..., 2:3]

        return jnp.concatenate([bg_grid, driving_to_source], axis=1)

    def deformed_source(self, source_image, sparse_motions):
        """Warp source by every motion hypothesis in one batched gather (:95-102)."""
        n, h, w, c = source_image.shape
        r1 = sparse_motions.shape[1]
        src = jnp.broadcast_to(source_image[:, None], (n, r1, h, w, c)).reshape(n * r1, h, w, c)
        flow = sparse_motions.reshape(n * r1, h, w, 2)
        out = grid_sample(src, flow)
        return out.reshape(n, r1, h, w, c)

    @nn.compact
    def __call__(self, source_image: jax.Array, driving_region_params,
                 source_region_params, bg_params=None, *,
                 source_downsampled: bool = False) -> Dict[str, jax.Array]:
        # source_downsampled: the caller already anti-alias-downsampled the
        # source (FlowAE.teacher_outputs dedups the blur to once per video
        # instead of once per frame — the blur is pointwise per image, so
        # only f32 reassociation differs)
        if self.scale_factor != 1 and not source_downsampled:
            source_image = anti_alias_downsample(source_image, self.scale_factor)
        n, h, w, _ = source_image.shape
        r1 = self.num_regions + 1

        heatmap = self.heatmap_representations(h, w, driving_region_params,
                                               source_region_params)  # (n, r+1, h, w)
        sparse_motion = self.sparse_motions(h, w, driving_region_params,
                                            source_region_params, bg_params)

        if self.use_deformed_source:
            deformed = self.deformed_source(source_image, sparse_motion)
            # interleave per-hypothesis (heatmap, deformed-rgb) channel groups to
            # mirror the reference's cat along dim=2 before flattening (:117-121)
            inp = jnp.concatenate([heatmap[..., None], deformed], axis=-1)  # (n,r+1,h,w,1+c)
        else:
            inp = heatmap[..., None]
        inp = jnp.moveaxis(inp, 1, 3).reshape(n, h, w, -1)

        prediction = Hourglass(self.block_expansion,
                               in_features=r1 * (self.num_channels * self.use_deformed_source + 1),
                               max_features=self.max_features, num_blocks=self.num_blocks,
                               train_bn=self.train_bn, bn_axis=self.bn_axis,
                               name="hourglass")(inp)

        mask = nn.Conv(r1, (7, 7), padding=3, name="mask")(prediction)
        mask = jax.nn.softmax(mask, axis=-1)                     # (n, h, w, r+1)
        deformation = jnp.einsum("nrhwc,nhwr->nhwc", sparse_motion, mask)

        out = {"optical_flow": deformation}
        if self.estimate_occlusion_map:
            occ = nn.Conv(1, (7, 7), padding=3, name="occlusion")(prediction)
            out["occlusion_map"] = jax.nn.sigmoid(occ)
        return out
