"""DM (flow diffusion) training: stage-1 / stage-2 loops, TPU-native.

Capability parity with DM_3/train_vdm_hdtf_wpose_plus_faceemb_init_cond_
liploss_6D.py (stage 1: fixed-length clips, ref frame 0, loss = eps-loss +
0.15*floss + 0.15*mouth_loss, Adam(2e-4, betas 0.9/0.99), cosine LR, grad clip
2.0, fp16 AMP) and ..._6D_s2.py (stage 2: random-length clips, frame 0 split
off as the init condition, NaN-grad guard).

TPU redesign: one jitted SPMD train step over a ('data', 'seq') mesh — batch
data-parallel, frames sequence-parallel (GSPMD inserts the temporal-attention
and FFT collectives). bf16 compute replaces CUDA AMP; the NaN guard is a
jnp.where on the global grad-finite flag (the reference skips the step on the
host, train_s2.py:326-339).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.flatten_util import ravel_pytree
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dawn_tpu.models.dm.unet3d import Unet3D
from dawn_tpu.models.dm.diffusion import GaussianDiffusion
from dawn_tpu.models.dm.flow_diffusion import (
    FaceLocEncoder, FlowDiffusionConfig, generate_bbox_mask,
)
from dawn_tpu.models.lfg.flow_ae import FlowAE
from dawn_tpu.ops.fourier import hf_loss_2
from dawn_tpu.train.augment import color_jitter_video


def generate_mouth_mask(mouth_lmk: jax.Array, latent_size: int,
                        img_size: int) -> jax.Array:
    """Rasterize the mouth-landmark bbox at latent resolution.

    mouth_lmk: (B, T, K, 2) xy pixel coords of landmarks 48:67 (the mouth ring,
    datasets_..._lmk_rand.py:239). Returns (B, T, ls, ls, 1) binary mask.
    Reference: mouth_mask_6D.py:238 (per-frame bbox of the mouth points).
    """
    scale = latent_size / img_size
    x0 = jnp.floor(mouth_lmk[..., 0].min(axis=-1) * scale).astype(jnp.int32)
    x1 = jnp.ceil(mouth_lmk[..., 0].max(axis=-1) * scale).astype(jnp.int32)
    y0 = jnp.floor(mouth_lmk[..., 1].min(axis=-1) * scale).astype(jnp.int32)
    y1 = jnp.ceil(mouth_lmk[..., 1].max(axis=-1) * scale).astype(jnp.int32)
    rows = jnp.arange(latent_size)[None, None, :, None]
    cols = jnp.arange(latent_size)[None, None, None, :]
    mask = ((rows >= y0[..., None, None]) & (rows <= y1[..., None, None]) &
            (cols >= x0[..., None, None]) & (cols <= x1[..., None, None]))
    return mask.astype(jnp.float32)[..., None]


@dataclasses.dataclass
class DMTrainConfig:
    img_size: int = 128
    fea_channels: int = 256   # LFG bottleneck width (min(max_features, be*4))
    pose_dim: int = 6
    win_width: int = 40
    stage: int = 1            # 1: fixed clips, ref = frame 0 INCLUDED in the
                              # diffused video (train...6D.py); 2: frame 0 is
                              # split off as the init condition and ONLY
                              # frames 1: are diffused (rand_6D.py:249-250),
                              # with per-step random clip lengths 30-40
                              # sampled by the train script via length
                              # buckets (train..._s2.py:281-292)
    lr: float = 2e-4
    total_steps: int = 250_000
    grad_clip: float = 2.0
    floss_weight: float = 0.15
    mouth_weight: float = 0.15
    null_cond_prob: float = 0.1
    use_fft_floss: bool = False    # stage-1 uses MSE floss; the _test wrapper
                                   # uses the temporal-FFT hf_loss_2 variant
    color_jitter: bool = True
    remat: str = "none"       # 'none' | 'dots' | 'full': jax.checkpoint
                              # around the UNet apply inside the loss.
                              # 'dots' saves only contraction outputs
                              # (recomputes elementwise/norm chains in the
                              # backward — trades FLOPs for HBM activation
                              # traffic); 'full' recomputes the whole
                              # forward. Measured A/B in PERF_TRAIN.md.
    compute_dtype: Any = jnp.float32
    ema_decay: Optional[float] = 0.9999  # None disables; the reference ships
                                         # an EMA class but never wires it
                                         # (ca_multi_test.py:125-138) — here
                                         # it works

    @property
    def latent_size(self) -> int:
        return self.img_size // 4


class DMTrainer:
    """Owns model defs + optimizer; produces the jitted sharded train step."""

    def __init__(self, config: DMTrainConfig = DMTrainConfig(),
                 flow_ae: Optional[FlowAE] = None,
                 unet_kw: Optional[Dict[str, Any]] = None):
        self.config = config
        self.in_channels = 3 + config.fea_channels + 16
        kw: Dict[str, Any] = dict(dim=64, channels=self.in_channels,
                                  cond_pose=config.pose_dim,
                                  win_width=config.win_width,
                                  dtype=config.compute_dtype)
        kw.update(unet_kw or {})   # yaml `unet:` overrides (tiny topologies
        self.unet = Unet3D(**kw)   # for tests / ablations; deployed = dim 64)
        self.diffusion = GaussianDiffusion(
            timesteps=1000, sampling_timesteps=20,
            loss_type="l2", use_dynamic_thres=True,
            null_cond_prob=config.null_cond_prob)
        self.flow_ae = flow_ae or FlowAE()
        self.face_loc = FaceLocEncoder()
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.grad_clip),
            optax.adam(optax.cosine_decay_schedule(config.lr, config.total_steps),
                       b1=0.9, b2=0.99),
        )

    # ----------------------------------------------------------------- init
    def init_state(self, rng: jax.Array, num_frames: int = 4) -> Dict[str, Any]:
        """Training state with FLAT (raveled) parameters.

        The UNet has ~2k parameter leaves; running the optimizer and NaN
        guard leaf-wise produces an HLO graph XLA chews on for tens of
        minutes. Raveling into one vector fuses the whole optimizer into a
        handful of ops (the unravel inside the loss is cheap slicing).
        """
        cfg = self.config
        ls = cfg.latent_size
        r1, r2, r3 = jax.random.split(rng, 3)
        unet_vars = self.unet.init(
            r1, jnp.zeros((1, num_frames, ls, ls, self.in_channels)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, num_frames, 1024 + cfg.pose_dim + 2)))
        lfg_vars = self.flow_ae.init_variables(r2, cfg.img_size)
        face_vars = self.face_loc.init(r3, jnp.zeros((1, cfg.img_size, cfg.img_size, 1)))
        flat, unravel = ravel_pytree(unet_vars["params"])
        self._unravel = unravel
        state = {
            "params": flat,
            "opt_state": self.tx.init(flat),
            "step": jnp.zeros((), jnp.int32),
            "frozen": {"lfg": lfg_vars, "face_loc": face_vars},
        }
        if cfg.ema_decay is not None:
            # independent buffer: params and ema live in one donated pytree
            state["ema_params"] = jnp.array(flat)
        return state

    def unet_variables(self, state: Dict[str, Any]) -> Dict[str, Any]:
        """Flat state params -> flax variables dict for the UNet."""
        return {"params": self._unravel(state["params"])}

    # ----------------------------------------------------------------- loss
    def prepare_inputs(self, rng_jit, batch):
        """(jittered) video/cond/mouth_lmk with the stage's frame-0 handling.

        Stage 1: the reference frame is frame 0 of the SAME clip that gets
        diffused (mouth_mask_6D.py). Stage 2: frame 0 is split off as the
        init condition — ref_img = vid[:, 0], diffused video = vid[:, 1:],
        condition rows 1: (deltas still vs frame 0), and the mouth landmarks
        keep the reference's own off-by-one slice mouth_lmk[:, :t-1]
        (train..._s2.py:290 slices :selct_frames-1, i.e. frames 0..t-2).
        """
        cfg = self.config
        video = batch["video"].astype(jnp.float32) / 255.0
        if cfg.color_jitter:
            video = color_jitter_video(rng_jit, video)
        ref_img = video[:, 0]
        cond, mouth_lmk = self.prepare_cond(batch)
        if cfg.stage == 2:
            video = video[:, 1:]
        return video, ref_img, cond, mouth_lmk

    def prepare_cond(self, batch):
        """Condition rows + mouth landmarks with the stage's frame-0 slice
        (the non-video half of prepare_inputs; shared by the cached-teacher
        loss which carries no video)."""
        cfg = self.config
        # condition: audio ++ delta pose ++ delta blink vs frame 0 (:225-240)
        pose = batch["pose"][..., : cfg.pose_dim]
        blink = batch["blink"]
        cond = jnp.concatenate(
            [batch["hubert"], pose - pose[:, :1], blink - blink[:, :1]], axis=-1)
        mouth_lmk = batch.get("mouth_lmk")
        if cfg.stage == 2:
            cond = cond[:, 1:]
            if mouth_lmk is not None:
                mouth_lmk = mouth_lmk[:, :-1]
        return cond, mouth_lmk

    def teacher_precompute(self, frozen, video_255: jax.Array) -> Dict[str, jax.Array]:
        """Frozen-teacher outputs for the CACHED-teacher training mode.

        The train loss consumes the raw video ONLY through the frozen LFG
        teacher (real_vid_grid/real_vid_conf/ref_img_fea — see loss_fn), so
        these three tensors can be precomputed once per clip and reused
        across epochs (PERF_TRAIN.md quantifies the step-time effect; the
        reference recomputes the teacher every step, mouth_mask_6D.py:300).
        Stage-aware: stage 2 splits frame 0 off as the reference before the
        teacher runs, exactly as prepare_inputs does.
        """
        video = video_255.astype(jnp.float32) / 255.0
        ref_img = video[:, 0]
        if self.config.stage == 2:
            video = video[:, 1:]
        return self.flow_ae.teacher_outputs(frozen["lfg"], ref_img, video)

    TEACHER_KEYS = ("real_vid_grid", "real_vid_conf", "ref_img_fea")

    def loss_fn(self, params, frozen, rng, batch) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """batch: video (B,T,H,W,3) in [0,255], hubert (B,T,1024),
        pose (B,T,P), blink (B,T,2), bbox (B,6), mouth_lmk (B,T,K,2).

        Cached-teacher mode: when the batch carries the TEACHER_KEYS
        (precomputed by :meth:`teacher_precompute`, cached on the host
        across epochs) instead of "video", the frozen LFG teacher pass —
        ~29 % of the step, PERF_TRAIN.md — is skipped. Color jitter is
        skipped too: the loss consumes the video only through the teacher,
        so jitter only ever acted through these tensors (documented trade,
        DEVIATIONS.md)."""
        cfg = self.config
        rng_jit, rng_diff = jax.random.split(rng)

        if "real_vid_grid" in batch:      # cached-teacher mode (static)
            teacher = {k: batch[k].astype(jnp.float32)
                       for k in self.TEACHER_KEYS}
            cond, mouth_lmk = self.prepare_cond(batch)
            b, t = teacher["real_vid_grid"].shape[:2]
        else:
            video, ref_img, cond, mouth_lmk = self.prepare_inputs(rng_jit, batch)
            b, t = video.shape[0], video.shape[1]

            # frozen LFG teacher -> GT flow/occlusion + ref feature (no grad).
            # teacher_outputs dedups the per-video ref work (region params /
            # source blur / encoder feature once per video, not per frame) —
            # matches reconstruct_video's tensors to f32 roundoff; PERF_TRAIN.md
            # has the attribution that motivated it
            teacher = jax.lax.stop_gradient(
                self.flow_ae.teacher_outputs(frozen["lfg"], ref_img, video))
        ls = cfg.latent_size
        x_start = jnp.concatenate(
            [teacher["real_vid_grid"], teacher["real_vid_conf"] * 2.0 - 1.0],
            axis=-1)                                         # (B,T,ls,ls,3)

        bbox_mask = generate_bbox_mask(batch["bbox"], cfg.img_size)
        mask_emb = self.face_loc.apply(frozen["face_loc"], bbox_mask)
        fea = teacher["ref_img_fea"]

        fea_t = jnp.broadcast_to(fea[:, None], (b, t) + fea.shape[1:])
        mask_t = jnp.broadcast_to(mask_emb[:, None], (b, t) + mask_emb.shape[1:])

        # seq-parallel: make_sharded_step installs a seq_mesh-enabled clone so
        # temporal attention runs as shard_map + halo exchange instead of a
        # GSPMD full-T all-gather around the Pallas kernel (VERDICT r4 #2)
        unet = getattr(self, "_step_unet", None)
        if unet is None:
            unet = self.unet

        def denoise_p(p, x, tvec, c, drop):
            return unet.apply({"params": self._unravel(p)}, x, tvec, c, drop)

        if cfg.remat == "dots":
            denoise_p = jax.checkpoint(
                denoise_p, policy=jax.checkpoint_policies.dots_saveable)
        elif cfg.remat == "full":
            denoise_p = jax.checkpoint(denoise_p)
        denoise = functools.partial(denoise_p, params)

        rng_t, rng_p = jax.random.split(rng_diff)
        tvec = jax.random.randint(rng_t, (b,), 0, self.diffusion.timesteps)
        loss_elem, pred_x0, _ = self.diffusion.p_losses(
            denoise, rng_p, x_start, tvec, fea_t, mask_t, cond)

        eps_loss = loss_elem.mean()

        pred_flow = pred_x0[..., :2]
        if cfg.use_fft_floss:
            floss = hf_loss_2(pred_flow, teacher["real_vid_grid"], axis=1).mean()
        else:
            floss = jnp.square(pred_x0 - x_start).mean()

        if mouth_lmk is not None:
            mmask = generate_mouth_mask(mouth_lmk, ls, cfg.img_size)
            denom = jnp.maximum(mmask.sum(), 1.0)
            mouth_loss = (loss_elem * mmask).sum() / denom
        else:
            mouth_loss = jnp.zeros(())

        total = eps_loss + cfg.floss_weight * floss + cfg.mouth_weight * mouth_loss
        metrics = {"loss": eps_loss, "floss": floss, "mouth_loss": mouth_loss,
                   "total": total}
        return total, metrics

    # ----------------------------------------------------------------- step
    def train_step(self, state, rng, batch):
        (_, metrics), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
            state["params"], state["frozen"], rng, batch)

        # NaN-grad guard on the single flat gradient vector (the reference
        # skips the optimizer step on the host, _s2.py:326-339). The WHOLE
        # update is rolled back on a non-finite step — including the Adam
        # moments and schedule count, which zeroed grads alone would still
        # decay/advance, distorting the first finite step afterwards.
        finite = jnp.isfinite(grads).all()
        grads = jnp.where(finite, grads, jnp.zeros_like(grads))

        updates, opt_state = self.tx.update(grads, state["opt_state"], state["params"])
        updates = jnp.where(finite, updates, jnp.zeros_like(updates))
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old),
            opt_state, state["opt_state"])
        params = state["params"] + updates
        metrics["grads_finite"] = finite.astype(jnp.float32)
        new_state = {**state, "params": params, "opt_state": opt_state,
                     "step": state["step"] + 1}
        if "ema_params" in state:
            d = self.config.ema_decay
            new_state["ema_params"] = state["ema_params"] * d + params * (1 - d)
        return new_state, metrics

    # ------------------------------------------------------------- monitoring
    def snapshot(self, state, rng, batch, max_frames: int = 4):
        """Training-time visual monitoring (train...6D.py:354-446).

        Runs the teacher + one noisy denoise (pred_x0) on the first sample of
        the batch, decodes BOTH real and fake flow through the frozen LFG and
        returns a dict of numpy arrays: real/fake decoded frames plus flow and
        confidence figures — the same panels the reference writes as GIF grids.
        """
        from dawn_tpu.utils.misc import flow2fig, conf2fig

        cfg = self.config
        video = batch["video"][:1].astype(jnp.float32) / 255.0
        t = min(max_frames, video.shape[1])
        video = video[:, :t]
        pose = batch["pose"][:1, :t, : cfg.pose_dim]
        blink = batch["blink"][:1, :t]
        cond = jnp.concatenate(
            [batch["hubert"][:1, :t], pose - pose[:, :1],
             blink - blink[:, :1]], axis=-1)

        teacher = self.flow_ae.reconstruct_video(
            state["frozen"]["lfg"], video[:, 0], video)
        x_start = jnp.concatenate(
            [teacher["real_vid_grid"], teacher["real_vid_conf"] * 2 - 1], -1)
        bbox_mask = generate_bbox_mask(batch["bbox"][:1], cfg.img_size)
        mask_emb = self.face_loc.apply(state["frozen"]["face_loc"], bbox_mask)
        fea_t = jnp.broadcast_to(teacher["ref_img_fea"][:, None],
                                 (1, t) + teacher["ref_img_fea"].shape[1:])
        mask_t = jnp.broadcast_to(mask_emb[:, None], (1, t) + mask_emb.shape[1:])

        params = state.get("ema_params", state["params"])

        def denoise(x, tvec, c, drop):
            return self.unet.apply({"params": self._unravel(params)},
                                   x, tvec, c, drop)

        tvec = jnp.full((1,), self.diffusion.timesteps // 2, jnp.int32)
        _, pred_x0, _ = self.diffusion.p_losses(
            denoise, rng, x_start, tvec, fea_t, mask_t, cond)

        fake_grid = pred_x0[..., :2]
        fake_conf = (pred_x0[..., 2:3] + 1) * 0.5
        dec = self.flow_ae.generator.apply(
            state["frozen"]["lfg"]["generator"], video[0, :1].repeat(t, 0),
            fake_grid[0], fake_conf[0],
            method=type(self.flow_ae.generator).decode_with_flow)

        real_grid = np.asarray(teacher["real_vid_grid"][0])
        return {
            "real_frames": np.asarray(video[0]),
            "real_decode": np.asarray(teacher["real_out_vid"][0]),
            "fake_decode": np.asarray(dec["prediction"]),
            "real_flow_fig": np.stack([flow2fig(real_grid[i],
                                                grid_size=real_grid.shape[1],
                                                img_size=cfg.img_size)
                                       for i in range(t)]),
            "fake_flow_fig": np.stack([flow2fig(np.asarray(fake_grid[0, i]),
                                                grid_size=real_grid.shape[1],
                                                img_size=cfg.img_size)
                                       for i in range(t)]),
            "real_conf_fig": np.stack([conf2fig(np.asarray(
                teacher["real_vid_conf"][0, i, ..., 0]), cfg.img_size)
                for i in range(t)]),
            "fake_conf_fig": np.stack([conf2fig(np.asarray(
                fake_conf[0, i, ..., 0]), cfg.img_size) for i in range(t)]),
        }

    def make_sharded_step(self, mesh: Mesh):
        """jit the step over the mesh: batch over 'data', frames over 'seq'.

        in_shardings must match the batch pytree exactly, and mouth
        landmarks are optional (no --lmk-dir), so the jit is built per
        batch-key-set and cached.

        When the mesh has a >1 'seq' axis the step's UNet is swapped for a
        seq_mesh-enabled clone (same params, static config only): temporal
        attention becomes the explicit shard_map + ±window halo exchange
        (ops/local_attention.seq_sharded_local_attention) with the fused
        Pallas stripe kernel — forward AND backward — per shard, instead of
        GSPMD all-gathering full-T q/k/v around the kernel. This bounds
        per-device attention memory at O(T/shards * (T/shards + 2w)) in
        TRAINING, the multi-chip extension of the reference's VRAM story
        (DM_3/modules/local_attention.py:275-342). Constraints: the diffused
        frame count must divide the 'seq' axis and T/shards >= win_width
        (seq_sharded_local_attention asserts); and the 'data' axis should
        fully shard the batch (per-device batch 1) — the UNet's (b, t) ->
        (b*t) conv reshapes are only GSPMD-expressible then, otherwise GSPMD
        re-gathers conv activations at full T around every conv (measured on
        the 8-dev CPU mesh; see test_sharded_train_step_no_full_t_allgather)
        and the memory bound is silently lost."""
        seq_on = mesh.shape.get("seq", 1) > 1
        self._step_unet = self.unet.clone(seq_mesh=mesh) if seq_on else None
        rep = NamedSharding(mesh, P())
        spec = {
            "video": P("data", "seq"), "hubert": P("data", "seq"),
            "pose": P("data", "seq"), "blink": P("data", "seq"),
            "bbox": P("data"), "mouth_lmk": P("data", "seq"),
            # cached-teacher mode: the precomputed teacher tensors shard
            # exactly like the video they replace (frames over 'seq');
            # the per-video ref feature is per-sample only
            "real_vid_grid": P("data", "seq"),
            "real_vid_conf": P("data", "seq"),
            "ref_img_fea": P("data"),
        }

        @functools.lru_cache(maxsize=None)
        def jitted(keys: Tuple[str, ...]):
            bs = {k: NamedSharding(mesh, spec[k]) for k in keys}
            return jax.jit(self.train_step,
                           in_shardings=(rep, rep, bs),
                           donate_argnums=(0,))

        def step(state, rng, batch):
            return jitted(tuple(sorted(batch)))(state, rng, batch)

        return step
