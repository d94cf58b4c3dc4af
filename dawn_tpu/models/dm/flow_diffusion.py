"""FlowDiffusion: the DAWN model proper — UNet3D diffusion over LFG flow space.

Capability parity with the inference FlowDiffusion wrapper
(DM_3/modules/video_flow_diffusion_model_multiGPU_v0_crema_vgg_floss_plus_
faceemb_flow_fast_init_cond_test.py:96-452): face-location mask encoder
(:39-50), bbox-mask rasterization (:182-201), condition assembly
(audio ++ Δpose ++ Δblink, :348-350), DDIM sampling (:358) and per-frame LFG
decode (:372-385).

TPU redesign: ``sample_one_video`` is ONE jitted program — the 20-step DDIM
loop is a lax.scan and the "AE decode loop" is a batched conv program over all
frames, so the reference's two Python hot loops (with a host sync per
iteration) disappear entirely.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from dawn_tpu.models.dm.unet3d import Unet3D
from dawn_tpu.models.dm.diffusion import GaussianDiffusion
from dawn_tpu.models.lfg.generator import LFGGenerator


class FaceLocEncoder(nn.Module):
    """Two stride-2 convs embedding the binary face-location mask (:39-50).

    Note (reference quirk, kept for honesty not emulation): the reference
    never trains nor checkpoints this module — DAWN_*.pth stores only
    model.diffusion (train...6D.py:449-464), so at inference it runs with
    fresh random weights. We therefore seed it deterministically.
    """
    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.relu(nn.Conv(8, (3, 3), strides=2, padding=1, name="conv1")(x))
        return nn.relu(nn.Conv(16, (3, 3), strides=2, padding=1, name="conv2")(x))


def generate_bbox_mask(bbox: jax.Array, size: int) -> jax.Array:
    """Rasterize the frame-0 face bbox to a (B, size, size, 1) binary mask.

    bbox: (B, 6) = [x_min, x_max, y_min, y_max, H, W] in image pixels.
    Matches :182-201 including the reference's use of element 4 (H) to
    normalize x and element 5 (W) to normalize y (images are square so the
    swap is a no-op) and the int32 truncation of corners.
    """
    b = bbox.shape[0]
    x = bbox[:, 0:2] / bbox[:, 4:5] * size
    y = bbox[:, 2:4] / bbox[:, 5:6] * size
    x0 = x[:, 0].astype(jnp.int32)
    x1 = (x[:, 1] + 1).astype(jnp.int32)
    y0 = y[:, 0].astype(jnp.int32)
    y1 = (y[:, 1] + 1).astype(jnp.int32)
    rows = jnp.arange(size)[None, :, None]
    cols = jnp.arange(size)[None, None, :]
    mask = ((rows >= y0[:, None, None]) & (rows <= y1[:, None, None]) &
            (cols >= x0[:, None, None]) & (cols <= x1[:, None, None]))
    return mask.astype(jnp.float32)[..., None]


@dataclasses.dataclass
class FlowDiffusionConfig:
    img_size: int = 128
    pose_dim: int = 6
    win_width: int = 40
    sampling_timesteps: int = 20
    ddim_sampling_eta: float = 1.0
    null_cond_prob: float = 0.1
    use_residual_flow: bool = False
    attn_mode: str = "full"           # 'full' | 'local' | 'pallas'
    fuse_cond: Optional[bool] = None  # fuse the 3 condition cross-attns
                                      # (measured net e2e loss; A/B hook)
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    dtype: Any = jnp.float32       # UNet compute dtype (bf16 = ~30% faster)
    lfg_dtype: Any = jnp.float32   # LFG decode is warp/gather-bound: bf16
                                   # measured SLOWER on v5e at both sizes
                                   # (-2% at 128^2; 46.2 vs 46.8 fps e2e at
                                   # 256^2, 2026-08-19) — keep f32
    lfg_max_features: int = 512    # LFG decoder width (released: 512)
    lfg_num_bottleneck: int = 6    # LFG bottleneck ResBlocks (released: 6)
    lfg_decode_chunk: int = 0      # decode frames in lax.map chunks of this
                                   # size (0 = all at once). At 256^2 the
                                   # full-res conv activations for 200
                                   # frames exceed HBM — chunking bounds
                                   # that to O(chunk) while convs stay
                                   # batched; 16 measured fastest on v5e
                                   # (0.60 s / 200 frames, shared-gather
                                   # warps)

    @property
    def latent_size(self) -> int:
        return self.img_size // 4


class FlowDiffusion:
    """Bundles the UNet, diffusion math, frozen LFG decoder and mask encoder.

    Variables layout (a plain dict, orbax-serializable):
      {'unet': {...}, 'generator': {...}, 'face_loc': {...}}
    """

    def __init__(self, config: FlowDiffusionConfig = FlowDiffusionConfig()):
        self.config = config
        self.unet = Unet3D(dim=64, channels=3 + 256 + 16,
                           dim_mults=tuple(config.dim_mults),
                           cond_pose=config.pose_dim,
                           win_width=config.win_width,
                           attn_mode=config.attn_mode,
                           fuse_cond=config.fuse_cond,
                           dtype=config.dtype)
        self.diffusion = GaussianDiffusion(
            timesteps=1000,
            sampling_timesteps=config.sampling_timesteps,
            ddim_sampling_eta=config.ddim_sampling_eta,
            loss_type="l2",
            use_dynamic_thres=True,
            null_cond_prob=config.null_cond_prob)
        self.generator = LFGGenerator(
            max_features=config.lfg_max_features,
            num_bottleneck_blocks=config.lfg_num_bottleneck,
            dtype=config.lfg_dtype)
        self.face_loc = FaceLocEncoder()

    # ------------------------------------------------------------------ init
    def init_variables(self, rng: jax.Array, num_frames: int = 2) -> Dict[str, Any]:
        cfg = self.config
        s, ls = cfg.img_size, cfg.latent_size

        # One jitted init program: flax init runs thousands of tiny ops, and
        # dispatching them individually over the axon TPU tunnel takes ~10min;
        # under jit it is a single compile + execute.
        @jax.jit
        def _init(rng):
            r1, r2, r3 = jax.random.split(rng, 3)
            unet_vars = self.unet.init(
                r1, jnp.zeros((1, num_frames, ls, ls, 275)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, num_frames, 1024 + cfg.pose_dim + 2)))
            gen_vars = self.generator.init(
                r2, jnp.zeros((1, s, s, 3)), jnp.zeros((1, ls, ls, 2)),
                jnp.zeros((1, ls, ls, 1)), method=LFGGenerator.decode_with_flow)
            face_vars = self.face_loc.init(r3, jnp.zeros((1, s, s, 1)))
            return {"unet": unet_vars, "generator": gen_vars,
                    "face_loc": face_vars}

        return _init(rng)

    # ------------------------------------------------------------- condition
    def build_condition(self, audio_hubert, pose, eye, init_pose, init_eye):
        """cond = [hubert, pose - init, eye - init] (:337-350).

        audio_hubert (B,T,1024); pose (B,T,P); eye (B,T,2); init_* (B,D).
        If pose has fewer dims than init_pose (pose_dim=7 ckpts driven with
        6-d poses), pad pose with init's trailing column as the reference does.
        """
        p = self.config.pose_dim
        init_pose = init_pose[:, :p]
        pose = pose[..., :p]
        t = pose.shape[1]
        init_pose_b = jnp.broadcast_to(init_pose[:, None], (pose.shape[0], t, init_pose.shape[-1]))
        if pose.shape[-1] != init_pose.shape[-1]:
            pose = jnp.concatenate([pose, init_pose_b[..., -1:]], axis=-1)
        init_eye_b = jnp.broadcast_to(init_eye[:, None], eye.shape)
        return jnp.concatenate(
            [audio_hubert, pose - init_pose_b, eye - init_eye_b], axis=-1)

    # -------------------------------------------------------------- sampling
    def sample_one_video(self, variables: Dict[str, Any], rng: jax.Array,
                         sample_img: jax.Array, audio_hubert: jax.Array,
                         pose: jax.Array, eye: jax.Array, bbox: jax.Array,
                         init_pose: Optional[jax.Array] = None,
                         init_eye: Optional[jax.Array] = None,
                         cond_scale: float = 1.0,
                         noise_seq: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
        """One image + conditions -> video. Fully traceable; jit over (T,) shapes.

        sample_img: (B, H, W, 3) in [0,1]; audio_hubert: (B, T, 1024);
        pose: (B, T, P); eye: (B, T, 2); bbox: (B, 6); init_pose (B, P') /
        init_eye (B, 2) default to frame 0 of the driving signals.
        """
        cfg = self.config
        b, t = audio_hubert.shape[0], audio_hubert.shape[1]
        ls = cfg.latent_size

        if init_pose is None:
            init_pose = pose[:, 0]
        if init_eye is None:
            init_eye = eye[:, 0]
        cond = self.build_condition(audio_hubert, pose, eye, init_pose, init_eye)

        fea = self.generator.apply(variables["generator"], sample_img,
                                   method=LFGGenerator.compute_fea)  # (B, ls, ls, 256)
        mask = generate_bbox_mask(bbox, cfg.img_size)
        mask_emb = self.face_loc.apply(variables["face_loc"], mask)  # (B, ls, ls, 16)

        # fea/mask are constant across the DDIM scan AND across frames: their
        # init_conv contribution is precomputed ONCE on a single frame
        # (SplitInitConv linearity) and broadcast over T; the scan body runs
        # the 3-channel slice only — the reference re-runs the full
        # 275-channel 7x7 conv + concat every step (:1244, :776)
        static1 = self.unet.apply(
            variables["unet"],
            jnp.concatenate([fea[:, None], mask_emb[:, None]], axis=-1),
            jnp.zeros((b,), jnp.int32), precompute_static=True)
        static = jnp.broadcast_to(static1, (b, t) + static1.shape[2:])

        def denoise(x, tvec, c, drop):
            return self.unet.apply(variables["unet"], x, tvec, c, drop,
                                   static_feat=static)

        pred = self.diffusion.sample(denoise, rng, (b, t, ls, ls, 3),
                                     None, None, cond, cond_scale, noise_seq)

        grid = pred[..., :2]
        if cfg.use_residual_flow:
            from dawn_tpu.models.lfg.warp import make_coordinate_grid
            grid = grid + make_coordinate_grid(ls, ls, grid.dtype)
        conf = (pred[..., 2:3] + 1.0) * 0.5

        out = {"sample_vid_grid": grid, "sample_vid_conf": conf}

        # batched LFG decode: each identity encoded once, all (B, T) frames
        # decoded as one conv program (vs the reference's per-frame loop)
        ck = cfg.lfg_decode_chunk
        if ck and ck < t:
            nc = -(-t // ck)
            t_pad = nc * ck
            pad = ((0, 0), (0, t_pad - t)) + ((0, 0),) * 3
            grid_c = jnp.pad(grid, pad).reshape((b, nc, ck) + grid.shape[2:])
            conf_c = jnp.pad(conf, pad).reshape((b, nc, ck) + conf.shape[2:])

            def dec_chunk(gc):
                g, c = gc
                return self.generator.apply(
                    variables["generator"], sample_img, g, c,
                    method=LFGGenerator.decode_with_flow_batched)

            # lax.map over frame chunks bounds the full-res warp memory
            dec = jax.lax.map(dec_chunk, (grid_c.transpose(1, 0, 2, 3, 4, 5),
                                          conf_c.transpose(1, 0, 2, 3, 4, 5)))
            dec = {k: v.transpose(1, 0, 2, 3, 4, 5).reshape(
                (b, t_pad) + v.shape[3:])[:, :t] for k, v in dec.items()}
        else:
            dec = self.generator.apply(
                variables["generator"], sample_img, grid, conf,
                method=LFGGenerator.decode_with_flow_batched)
        out["sample_out_vid"] = dec["prediction"]          # (B, T, H, W, 3)
        out["sample_warped_vid"] = dec["deformed"]
        return out

    def make_sampler(self, cond_scale: float = 1.0):
        """Returns a jitted sampler closed over static config."""
        fn = functools.partial(self.sample_one_video, cond_scale=cond_scale)
        return jax.jit(lambda variables, rng, img, aud, pose, eye, bbox,
                       init_pose, init_eye:
                       fn(variables, rng, img, aud, pose, eye, bbox,
                          init_pose=init_pose, init_eye=init_eye))

    def make_batch_sampler(self, mesh, cond_scale: float = 1.0):
        """Multi-identity batched sampler pjit over a device mesh.

        Batch axis sharded over 'data' (BASELINE config #5: batched
        generation on a v5e pod slice); weights replicated. Every input
        gains a leading batch axis; returns the same dict with (B, T, ...)
        leaves.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        dat = NamedSharding(mesh, P("data"))
        fn = functools.partial(self.sample_one_video, cond_scale=cond_scale)
        return jax.jit(
            lambda variables, rng, img, aud, pose, eye, bbox, init_pose,
            init_eye: fn(variables, rng, img, aud, pose, eye, bbox,
                         init_pose=init_pose, init_eye=init_eye),
            in_shardings=(rep, rep, dat, dat, dat, dat, dat, dat, dat),
        )

    def make_seq_sampler(self, mesh, cond_scale: float = 1.0):
        """Sequence-parallel single-video sampler: FRAME axis over 'seq'.

        The reference's core VRAM story is bounding live activations per
        video length (README.md:34-38, the local-attention path); its
        multi-chip analogue is sharding the frame axis of the whole DDIM
        scan + decode over the 'seq' mesh axis so a video longer than one
        chip's HBM spreads across ICI. Weights and the source image are
        replicated; every (B, T, ...) input/output is sharded on T.

        The temporal attention does NOT rely on GSPMD: a pallas_call over a
        'seq'-sharded frame dim has no partitioning rule and would force a
        full-T all-gather of q/k/v around every kernel. The sampler instead
        runs a seq-enabled UNet whose attention is an explicit shard_map +
        ±window halo exchange (ops/local_attention.py::
        seq_sharded_local_attention) — one ppermute hop of the window-edge
        k/v over ICI per attention, the fused Pallas kernel unchanged on
        each local stripe. The video-wide GroupNorm / quantile reductions
        and the frame-local convs remain GSPMD-partitioned (partial-sum
        all-reduces, no gathers). ``tests/test_multichip_inference.py``
        pins both numerics and the no-full-T-all-gather property of the
        compiled program. T must be a multiple of the 'seq' axis size and
        T/shards must cover win_width.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        seq = NamedSharding(mesh, P(None, "seq"))
        m = FlowDiffusion.__new__(FlowDiffusion)
        m.__dict__.update(self.__dict__)
        m.unet = self.unet.clone(seq_mesh=mesh)
        fn = functools.partial(m.sample_one_video, cond_scale=cond_scale)
        return jax.jit(
            lambda variables, rng, img, aud, pose, eye, bbox, init_pose,
            init_eye: fn(variables, rng, img, aud, pose, eye, bbox,
                         init_pose=init_pose, init_eye=init_eye),
            in_shardings=(rep, rep, rep, seq, seq, seq, rep, rep, rep),
            out_shardings=seq,
        )
