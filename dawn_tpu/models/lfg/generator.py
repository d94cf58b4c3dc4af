"""LFG flow-warping generator (Johnson architecture), TPU-native.

Capability parity with LFG/modules/generator.py:19-172:
- ``compute_fea``            -- encoder bottleneck feature (the diffusion image
                                condition, 256 x H/4 x W/4).
- ``decode_with_flow``       -- decode externally supplied flow + occlusion
                                into an RGB frame (the inference hot path,
                                generator.py:138).
- ``__call__``               -- full motion transfer given region/bg params
                                (training path, generator.py:92).

TPU redesign vs the reference: the per-frame Python decode loop is gone.
``decode_with_flow`` takes a whole (T, h, w, 2) flow video; the source image
is encoded ONCE and its skip pyramid broadcast across frames, so the
bottleneck + decoder run as one big batched conv program on the MXU.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from dawn_tpu.models.lfg.blocks import (
    SameBlock2d, DownBlock2d, UpBlock2d, ResBlock2d,
)
from dawn_tpu.models.lfg.warp import (
    apply_optical, apply_optical_shared, deform_input, deform_input_shared)


class LFGGenerator(nn.Module):
    num_channels: int = 3
    block_expansion: int = 64
    max_features: int = 512
    num_down_blocks: int = 2
    num_bottleneck_blocks: int = 6
    skips: bool = True
    train_bn: bool = False
    bn_axis: Optional[str] = None
    dtype: Any = jnp.float32       # compute dtype; BN stats stay f32

    def setup(self):
        kw = dict(train_bn=self.train_bn, bn_axis=self.bn_axis,
                  dtype=self.dtype)
        self.first = SameBlock2d(self.block_expansion, kernel_size=7, **kw)
        self.down_blocks = [
            DownBlock2d(min(self.max_features, self.block_expansion * (2 ** (i + 1))), **kw)
            for i in range(self.num_down_blocks)
        ]
        self.up_blocks = [
            UpBlock2d(min(self.max_features,
                          self.block_expansion * (2 ** (self.num_down_blocks - i - 1))), **kw)
            for i in range(self.num_down_blocks)
        ]
        self.bottleneck = [ResBlock2d(**kw) for _ in range(self.num_bottleneck_blocks)]
        self.final = nn.Conv(self.num_channels, (7, 7), padding=3,
                             dtype=self.dtype)

    def encode(self, source_image: jax.Array) -> List[jax.Array]:
        """Skip pyramid [s0 (full res) ... s_n (bottleneck)] for one source."""
        out = self.first(source_image)
        skips = [out]
        for blk in self.down_blocks:
            out = blk(out)
            skips.append(out)
        return skips

    def compute_fea(self, source_image: jax.Array) -> jax.Array:
        """Bottleneck feature (N, H/4, W/4, 256). Reference: generator.py:132."""
        return self.encode(source_image)[-1]

    def decode(self, source_image: jax.Array, skips: List[jax.Array],
               optical_flow: jax.Array, occlusion_map: jax.Array) -> Dict[str, jax.Array]:
        """Warp + decode. All of (source_image, skips, flow, occ) share batch T."""
        out = apply_optical(skips[-1], optical_flow, occlusion_map)
        for blk in self.bottleneck:
            out = blk(out)
        for i, up in enumerate(self.up_blocks):
            if self.skips:
                out = apply_optical(skips[-(i + 1)], optical_flow, occlusion_map, out)
            out = up(out)
        if self.skips:
            out = apply_optical(skips[0], optical_flow, occlusion_map, out)
        out = jax.nn.sigmoid(self.final(out))
        if self.skips:
            out = apply_optical(source_image.astype(out.dtype), optical_flow,
                                occlusion_map, out)
        return {
            "prediction": out.astype(jnp.float32),
            "deformed": deform_input(source_image, optical_flow).astype(
                jnp.float32),
        }

    def decode_shared(self, source_image: jax.Array, skips: List[jax.Array],
                      optical_flow: jax.Array, occlusion_map: jax.Array,
                      ) -> Dict[str, jax.Array]:
        """Warp + decode with SHARED per-identity skips.

        source_image/skips keep their (B, ...) identity batch; every warp
        gathers the shared source directly (grid_sample_shared) instead of
        materializing the (B*T, H, W, C) skip broadcasts — at 256^2/200f
        that broadcast was 3.4 GB of HBM for skip 0 alone. Convs still run
        over the flattened (B*T) frame batch.

        optical_flow: (B, T, h, w, 2); occlusion_map: (B, T, h, w, 1).
        Returns dict of (B, T, ...) tensors.
        """
        b, t = optical_flow.shape[:2]
        out = apply_optical_shared(skips[-1], optical_flow, occlusion_map)
        for blk in self.bottleneck:
            out = blk(out)
        for i, up in enumerate(self.up_blocks):
            if self.skips:
                out = apply_optical_shared(skips[-(i + 1)], optical_flow,
                                           occlusion_map, out)
            out = up(out)
        if self.skips:
            out = apply_optical_shared(skips[0], optical_flow, occlusion_map,
                                       out)
        out = jax.nn.sigmoid(self.final(out))
        if self.skips:
            out = apply_optical_shared(source_image.astype(out.dtype),
                                       optical_flow, occlusion_map, out)
        return {
            "prediction": out.reshape((b, t) + out.shape[1:]).astype(
                jnp.float32),
            "deformed": deform_input_shared(source_image, optical_flow
                                            ).astype(jnp.float32),
        }

    def decode_with_flow(self, source_image: jax.Array, optical_flow: jax.Array,
                         occlusion_map: jax.Array) -> Dict[str, jax.Array]:
        """forward_with_flow for a whole video in one batched program.

        Args:
          source_image: (1, H, W, 3) single identity (or (T, H, W, 3)).
          optical_flow: (T, h, w, 2) normalized grids.
          occlusion_map: (T, h, w, 1).
        Reference: generator.py:138-172 (per-frame loop, here batched).
        """
        t = optical_flow.shape[0]
        skips = self.encode(source_image)
        if source_image.shape[0] == 1 and t > 1:
            out = self.decode_shared(source_image, skips, optical_flow[None],
                                     occlusion_map[None])
            return {k: v[0] for k, v in out.items()}
        return self.decode(source_image, skips, optical_flow, occlusion_map)

    def decode_with_flow_batched(self, source_image: jax.Array,
                                 optical_flow: jax.Array,
                                 occlusion_map: jax.Array) -> Dict[str, jax.Array]:
        """Multi-identity decode: each of B sources encoded ONCE, all (B*T)
        frames decoded as one conv program, warps gathering the shared
        sources (no skip broadcast).

        Args:
          source_image: (B, H, W, 3).
          optical_flow: (B, T, h, w, 2); occlusion_map: (B, T, h, w, 1).
        Returns dict of (B, T, ...) tensors.
        """
        skips = self.encode(source_image)
        return self.decode_shared(source_image, skips, optical_flow,
                                  occlusion_map)

    def __call__(self, source_image: jax.Array, motion_params: Dict[str, jax.Array],
                 ) -> Dict[str, jax.Array]:
        """Full motion transfer given precomputed motion params.

        ``motion_params`` comes from PixelwiseFlowPredictor ({optical_flow,
        occlusion_map}). Reference: generator.py:92-130 keeps the flow
        predictor inside the generator; here it is composed functionally by
        dawn_tpu.models.lfg.flow_ae so each piece jits independently.
        """
        skips = self.encode(source_image)
        out = self.decode(source_image, skips,
                          motion_params["optical_flow"], motion_params["occlusion_map"])
        out["bottle_neck_feat"] = skips[-1]
        out["optical_flow"] = motion_params["optical_flow"]
        out["occlusion_map"] = motion_params["occlusion_map"]
        return out
