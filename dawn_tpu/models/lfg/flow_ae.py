"""FlowAE: functional composition of the four LFG nets.

Capability parity with LFG/modules/flow_autoenc.py:14-66 (eval-time bundle)
and the frozen-teacher path inside FlowDiffusion.forward
(..._init_cond_test.py:248-264): region params for source/driving, background
transform, dense flow + occlusion, and the warped reconstruction.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from dawn_tpu.models.lfg.generator import LFGGenerator
from dawn_tpu.models.lfg.region_predictor import RegionPredictor
from dawn_tpu.models.lfg.bg_predictor import BGMotionPredictor
from dawn_tpu.models.lfg.pixelwise_flow import PixelwiseFlowPredictor


class FlowAE:
    """Bundles generator + region/bg/flow predictors over a shared variables dict.

    variables = {'generator', 'pixelwise_flow_predictor', 'region_predictor',
                 'bg_predictor'} (the output of weights.convert_lfg_checkpoint).
    """

    def __init__(self, num_regions: int = 10, revert_axis_swap: bool = True,
                 generator_kw: Dict[str, Any] | None = None,
                 region_kw: Dict[str, Any] | None = None,
                 bg_kw: Dict[str, Any] | None = None,
                 flow_kw: Dict[str, Any] | None = None):
        self.generator = LFGGenerator(**(generator_kw or {}))
        self.region_predictor = RegionPredictor(num_regions=num_regions,
                                                **(region_kw or {}))
        self.bg_predictor = BGMotionPredictor(**(bg_kw or {}))
        self.flow_predictor = PixelwiseFlowPredictor(
            num_regions=num_regions, revert_axis_swap=revert_axis_swap,
            **(flow_kw or {}))

    def init_variables(self, rng: jax.Array, img_size: int = 128) -> Dict[str, Any]:
        @jax.jit
        def _init(rng):
            r1, r2, r3, r4 = jax.random.split(rng, 4)
            img = jnp.zeros((1, img_size, img_size, 3))
            gen_vars = self.generator.init(
                r1, img, jnp.zeros((1, img_size // 4, img_size // 4, 2)),
                jnp.zeros((1, img_size // 4, img_size // 4, 1)),
                method=LFGGenerator.decode_with_flow)
            reg_vars = self.region_predictor.init(r2, img)
            bg_vars = self.bg_predictor.init(r3, img, img)
            rp = self.region_predictor.apply(reg_vars, img)
            flow_vars = self.flow_predictor.init(r4, img, rp, rp, jnp.eye(3)[None])
            return {"generator": gen_vars, "region_predictor": reg_vars,
                    "bg_predictor": bg_vars, "pixelwise_flow_predictor": flow_vars}
        return _init(rng)

    def motion_transfer(self, variables: Dict[str, Any], source: jax.Array,
                        driving: jax.Array) -> Dict[str, jax.Array]:
        """Full reconstruction of ``driving`` by warping ``source``.

        source/driving: (N, H, W, 3). Returns optical_flow, occlusion_map,
        prediction, deformed, bottle_neck_feat — the teacher outputs the
        diffusion trainer consumes (..._init_cond_test.py:248-264).
        """
        src_params = self.region_predictor.apply(variables["region_predictor"], source)
        drv_params = self.region_predictor.apply(variables["region_predictor"], driving)
        bg = self.bg_predictor.apply(variables["bg_predictor"], source, driving)
        motion = self.flow_predictor.apply(variables["pixelwise_flow_predictor"],
                                           source, drv_params, src_params, bg)
        out = self.generator.apply(variables["generator"], source, motion)
        out["source_region_params"] = src_params
        out["driving_region_params"] = drv_params
        out["bg_params"] = bg
        return out

    def teacher_outputs(self, variables: Dict[str, Any], ref_img: jax.Array,
                        video: jax.Array) -> Dict[str, jax.Array]:
        """The three teacher tensors the DM TRAIN LOSS consumes — deduped.

        Mathematically identical to the matching keys of
        :meth:`reconstruct_video` (every module is frozen eval-mode BN, so
        per-row results are batch-independent; the smaller conv batch only
        moves XLA's reduction associativity, measured max|d| ~4e-7 CPU /
        ~1.5e-4 TPU), but the per-VIDEO reference work runs once per
        video instead of once per frame:

        - region params of the ref image: b hourglass passes, not b*t over
          t identical copies;
        - the flow predictor's anti-alias source downsample: blurred once
          per ref, repeated at latent res;
        - the generator encoder: ``compute_fea`` on the b refs only — the
          reference computes the full (b*t) encode + decode and slices
          ``bottle_neck_feat[::f]`` (mouth_mask_6D.py:300-316); XLA DCEs the
          unused decode under jit but cannot slice a conv's batch after the
          fact, so the dedup is done here at the math level.

        The per-frame work (driving region params, bg affine, dense flow
        hourglass) is unchanged. PERF_TRAIN.md quantifies the step-time
        effect.
        """
        from dawn_tpu.models.lfg.warp import anti_alias_downsample

        b, t, h, w, c = video.shape
        drv = video.reshape(b * t, h, w, c)
        src_rep = jnp.broadcast_to(ref_img[:, None],
                                   (b, t, h, w, c)).reshape(b * t, h, w, c)

        src_params_b = self.region_predictor.apply(
            variables["region_predictor"], ref_img)
        src_params = jax.tree_util.tree_map(
            lambda x: jnp.repeat(x, t, axis=0), src_params_b)
        drv_params = self.region_predictor.apply(
            variables["region_predictor"], drv)
        bg = self.bg_predictor.apply(variables["bg_predictor"], src_rep, drv)

        sf = self.flow_predictor.scale_factor
        src_small = (anti_alias_downsample(ref_img, sf) if sf != 1
                     else ref_img)
        motion = self.flow_predictor.apply(
            variables["pixelwise_flow_predictor"],
            jnp.repeat(src_small, t, axis=0), drv_params, src_params, bg,
            source_downsampled=True)

        fea = self.generator.apply(variables["generator"], ref_img,
                                   method=LFGGenerator.compute_fea)
        ls = motion["optical_flow"].shape[1]
        return {
            "real_vid_grid": motion["optical_flow"].reshape(b, t, ls, ls, 2),
            "real_vid_conf": motion["occlusion_map"].reshape(b, t, ls, ls, 1),
            "ref_img_fea": fea,
        }

    def reconstruct_video(self, variables: Dict[str, Any], ref_img: jax.Array,
                          video: jax.Array) -> Dict[str, jax.Array]:
        """Teacher pass over a (B, T, H, W, 3) video with per-video ref image.

        Flattens (B, T) into the batch for one big conv program.
        """
        b, t, h, w, c = video.shape
        drv = video.reshape(b * t, h, w, c)
        src = jnp.broadcast_to(ref_img[:, None], (b, t, h, w, c)).reshape(b * t, h, w, c)
        out = self.motion_transfer(variables, src, drv)
        ls = out["optical_flow"].shape[1]
        return {
            "real_vid_grid": out["optical_flow"].reshape(b, t, ls, ls, 2),
            "real_vid_conf": out["occlusion_map"].reshape(b, t, ls, ls, 1),
            "real_out_vid": out["prediction"].reshape(b, t, h, w, c),
            "real_warped_vid": out["deformed"].reshape(b, t, h, w, c),
            "ref_img_fea": out["bottle_neck_feat"].reshape(b, t, ls, ls, -1)[:, 0],
        }
