"""Unified end-to-end inference API + CLI — the dawn_tpu VideoGenerator.

Capability parity with unified_video_generator.py: the same four-stage
pipeline (extract_pose -> process_audio -> generate_pose_blink ->
generate_final_video), the same cache-file contract (init_pose.npy (1,7),
init_eye_bbox.npy (1,8), target_audio.npy (T,1024), dri_pose.npy (T,6),
dri_blink.npy (T,2) — SURVEY.md section 1) and the same CLI flags
(--audio_path --image_path --output_path --cache_path --resolution).

TPU redesign: every model stage is a jitted JAX program; HuBERT runs on
device; PBnet pose+blink decode in one call each; the diffusion + LFG decode
is a single jit. Host work is only file IO and the 3DDFA face-prep stage.
Checkpoints are the released torch .pth files, converted on load.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Any, Dict, Optional

import numpy as np

# pose normalization constants (unified_video_generator.py:95-98) — single
# source of truth is pose_blink's 8-d set (tvae_eval:20-23); these are its
# documented slices so the two entry points cannot drift apart
from dawn_tpu.pipeline.pose_blink import (DEFAULT_BLINK_2, DEFAULT_POSE_6,
                                          MAX_VALS_8, MIN_VALS_8)

POSE_MAX, POSE_MIN = MAX_VALS_8[:6], MIN_VALS_8[:6]
# 3DDFA-failure fallbacks (:275-278, :338-341): 7-d pose = 6-d + trailing 0,
# 8-d eye_bbox = blink(2) ++ default face box [x0, x1, y0, y1, H, W]
DEFAULT_POSE = np.concatenate(
    [DEFAULT_POSE_6, np.zeros((1, 1), np.float32)], axis=1)
DEFAULT_EYE_BBOX = np.concatenate(
    [DEFAULT_BLINK_2,
     np.array([[64, 64, 192, 192, 256, 256]], np.float32)], axis=1)


def inv_transform(x: np.ndarray, min_vals: np.ndarray, max_vals: np.ndarray):
    return x * (max_vals - min_vals) + min_vals


def pad_to_bucket(arrays, t: int, bucket: int, max_n_frames: int):
    """Edge-pad (T, D) conditioning arrays so T rounds up to a multiple of
    ``bucket`` (capped at max_n_frames); returns (padded_arrays, t_padded)."""
    t_pad = min(max_n_frames, -(-t // bucket) * bucket)
    if t_pad <= t:
        return list(arrays), t
    pad = ((0, t_pad - t), (0, 0))
    return [np.pad(a, pad, mode="edge") for a in arrays], t_pad


def _resolve_asset(path: Optional[str], default: Optional[str],
                   kind: str) -> Optional[str]:
    """Missing DEFAULT asset locations degrade to the random-weight fallback
    (so assetless machines can run/bench the pipeline); an EXPLICITLY given
    path that does not exist raises — silently generating a garbage video
    from random weights after a path typo would look like a model bug."""
    if not path:
        return None
    if os.path.exists(path):
        return path
    if path == default:
        print(f"[{kind}] default asset missing ({path}) — "
              f"random-weight fallback")
        return None
    raise FileNotFoundError(f"{kind}: {path} does not exist")


@dataclasses.dataclass
class GeneratorPaths:
    """Model asset locations (all optional; stages degrade gracefully)."""
    hubert_dir: Optional[str] = "./pretrain_models/hubert-large-ls960-ft"
    pbnet_pose_ckpt: Optional[str] = "./pretrain_models/pbnet_seperate/pose/checkpoint_40000.pth.tar"
    pbnet_blink_ckpt: Optional[str] = "./pretrain_models/pbnet_seperate/blink/checkpoint_95000.pth.tar"
    dawn_ckpt: Optional[str] = None       # DAWN_{128,256}.pth
    lfg_ckpt: Optional[str] = None        # LFG_*.pth
    tddfa_onnx_dir: Optional[str] = None  # 3DDFA onnx assets (host stage)


class VideoGenerator:
    """One-image + one-wav -> talking-head video."""

    def __init__(self, audio_path: str, image_path: str, output_path: str,
                 cache_path: str, resolution: int = 128,
                 paths: Optional[GeneratorPaths] = None,
                 max_n_frames: int = 200, win_width: int = 40,
                 sampling_step: int = 20, ddim_sampling_eta: float = 1.0,
                 cond_scale: float = 1.0, attn_mode: str = "local",
                 seed: int = 1234, bucket_frames: int = 25):
        self.audio_path = audio_path
        self.image_path = image_path
        self.output_path = output_path
        self.cache_path = cache_path
        self.resolution = resolution
        # fresh instance per generator — a shared mutable default would leak
        # one caller's path mutations into every later default construction
        self.paths = paths if paths is not None else GeneratorPaths()
        self.max_n_frames = max_n_frames
        self.win_width = win_width
        self.sampling_step = sampling_step
        self.ddim_sampling_eta = ddim_sampling_eta
        self.cond_scale = cond_scale
        self.attn_mode = attn_mode
        self.seed = seed
        # XLA compiles one program per video length. bucket_frames > 0 rounds
        # T up to the next multiple (conditioning padded by repeating the
        # last frame, output trimmed) so videos of similar length reuse the
        # compiled program — the XLA-side answer to the reference's
        # update_num_frames (ca_multi_test.py:959-965). 0 = exact length.
        # Default 25 (1 s at 25 fps): cold compile is minutes (BENCH_r02
        # tail), so paying ~4% padded frames to stop recompiling per video
        # length is the right production default (VERDICT r2 weak #1).
        self.bucket_frames = bucket_frames
        # persistent XLA/Mosaic compile cache: first-ever run on a machine
        # pays the minutes-long compile, every restart after that skips it
        # (utils/compile_cache.py has the on-chip measurements)
        from dawn_tpu.utils.compile_cache import enable_compile_cache
        enable_compile_cache()
        os.makedirs(cache_path, exist_ok=True)
        os.makedirs(output_path, exist_ok=True)
        self._hubert = None
        self._pbnet: Dict[str, Any] = {}
        self._video_model = None
        self._sampler = None

    @classmethod
    def from_config(cls, config_path: str, audio_path: str, image_path: str,
                    output_path: str, cache_path: str,
                    paths_override: Optional[Dict[str, str]] = None,
                    **overrides):
        """Build from a reference-style DAWN yaml (config/DAWN_{128,256}.yaml
        keys: input_size, max_n_frames, win_width, sampling_step,
        ddim_sampling_eta, cond_scale, random_seed, model_config ckpt paths
        — unified_video_generator.py:119-129). kwargs override the yaml;
        ``paths_override`` replaces individual GeneratorPaths fields
        (explicit paths, strict) while unset ones keep the yaml/default
        resolution."""
        import yaml
        with open(config_path) as f:
            cfg = yaml.safe_load(f) or {}
        mc = cfg.get("model_config") or {}
        # yaml-shipped checkpoint locations are default-like: when absent on
        # this machine, degrade to the assetless fallback instead of raising
        # (pass `paths`/`paths_override` to demand specific checkpoints)
        paths = overrides.pop("paths", None)
        if paths is None:
            fields = dict(
                dawn_ckpt=_resolve_asset(mc.get("diffusion_pretrained_pth"),
                                         mc.get("diffusion_pretrained_pth"),
                                         "config dawn_ckpt"),
                lfg_ckpt=_resolve_asset(mc.get("ae_pretrained_pth"),
                                        mc.get("ae_pretrained_pth"),
                                        "config lfg_ckpt"))
            fields.update({k: v for k, v in (paths_override or {}).items()
                           if v})
            paths = GeneratorPaths(**fields)
        kw = dict(resolution=cfg.get("input_size", 128),
                  max_n_frames=cfg.get("max_n_frames", 200),
                  win_width=cfg.get("win_width", 40),
                  sampling_step=cfg.get("sampling_step", 20),
                  ddim_sampling_eta=cfg.get("ddim_sampling_eta", 1.0),
                  cond_scale=cfg.get("cond_scale", 1.0),
                  attn_mode=cfg.get("attn_mode", "local"),
                  seed=cfg.get("random_seed", 1234))
        kw.update(overrides)
        return cls(audio_path, image_path, output_path, cache_path,
                   paths=paths, **kw)

    # ------------------------------------------------------------ stage 1
    def extract_pose(self) -> None:
        """Face -> init_pose.npy (1,7) + init_eye_bbox.npy (1,8).

        Runs the 3DDFA host stage when its assets are available; otherwise
        writes the reference's documented fallback constants (:275-278).
        """
        pose, eye_bbox = None, None
        try:
            from dawn_tpu.pipeline.face_prep import extract_init_states
            pose, eye_bbox = extract_init_states(
                self.image_path, self.paths.tddfa_onnx_dir)
        except Exception as e:
            print(f"[extract_pose] 3DDFA stage unavailable ({e}); "
                  f"using default init state")
        if pose is None:
            pose, eye_bbox = DEFAULT_POSE, DEFAULT_EYE_BBOX
        np.save(os.path.join(self.cache_path, "init_pose.npy"),
                pose.reshape(1, -1))
        np.save(os.path.join(self.cache_path, "init_eye_bbox.npy"),
                eye_bbox.reshape(1, -1))

    # ------------------------------------------------------------ stage 2
    def _hubert_forward(self):
        if self._hubert is None:
            import jax
            import jax.numpy as jnp
            from dawn_tpu.models.hubert import HubertModel
            from dawn_tpu.models.hubert.model import HubertConfig

            hub_dir = _resolve_asset(self.paths.hubert_dir,
                                     GeneratorPaths.hubert_dir, "hubert")
            if hub_dir:
                from dawn_tpu.weights.hubert_convert import (
                    convert_hubert_pretrained)
                variables, cfg = convert_hubert_pretrained(hub_dir)
                model = HubertModel(cfg)
            else:
                # assetless fallback (mirrors _init_video_model): the full
                # hubert-large topology at random init, so the pipeline runs
                # (and can be benchmarked) on machines without checkpoints
                print("[process_audio] no HuBERT checkpoint dir — "
                      "random hubert-large weights")
                cfg = HubertConfig.large()
                model = HubertModel(cfg)
                variables = model.init(jax.random.PRNGKey(self.seed),
                                       jnp.zeros((1, 4000), jnp.float32))
            fwd = jax.jit(lambda w: model.apply(variables, w))
            self._hubert = lambda w: np.asarray(fwd(jnp.asarray(w)))
        return self._hubert

    def process_audio(self) -> None:
        """WAV -> target_audio.npy (T, 1024) 25 fps HuBERT features."""
        from dawn_tpu.pipeline.audio import process_audio
        feats = process_audio(self.audio_path, self._hubert_forward())
        np.save(os.path.join(self.cache_path, "target_audio.npy"), feats)

    # ------------------------------------------------------------ stage 3
    def _load_pbnet(self, ckpt_path: Optional[str], kind: str):
        import yaml
        import jax
        from dawn_tpu.models.pbnet import build_pbnet
        from dawn_tpu.weights import convert_pbnet_checkpoint

        default = (GeneratorPaths.pbnet_pose_ckpt if kind == "pose"
                   else GeneratorPaths.pbnet_blink_ckpt)
        ckpt_path = _resolve_asset(ckpt_path, default, f"pbnet-{kind}")
        if ckpt_path:
            folder = os.path.dirname(ckpt_path)
            with open(os.path.join(folder, "opt.yaml"), "rb") as f:
                opt = dict(yaml.load(f, Loader=yaml.Loader))
        else:
            # assetless fallback: the deployed transformerreemb6 topology at
            # random init (same degradation contract as _init_video_model)
            print(f"[generate_pose_blink] no PBnet {kind} checkpoint — "
                  f"random transformerreemb6 weights")
            opt, ckpt_path = {}, None
        # dim overrides exactly as the reference applies them (:79-92)
        opt["audio_dim"] = 1024
        if kind == "pose":
            opt["pos_dim"], opt["eye_dim"] = 6, 0
        else:
            opt["pos_dim"], opt["eye_dim"] = 2, 0
        model = build_pbnet(opt, deterministic=True)
        if ckpt_path:
            variables = convert_pbnet_checkpoint(
                ckpt_path, num_layers=model.hp.num_layers)
        else:
            variables = model.init_variables(jax.random.PRNGKey(self.seed))
        return model, variables

    def _pbnet_entry(self, kind: str):
        """(model, variables, jitted generate) per kind, built once — repeat
        calls (batch OOD runs, benches) must not re-trace."""
        if kind not in self._pbnet:
            import jax
            ckpt = (self.paths.pbnet_pose_ckpt if kind == "pose"
                    else self.paths.pbnet_blink_ckpt)
            model, variables = self._load_pbnet(ckpt, kind)
            gen = jax.jit(lambda v, r, i, a: model.generate(v, r, i, a))
            self._pbnet[kind] = (model, variables, gen)
        return self._pbnet[kind]

    def generate_pose_blink(self) -> None:
        """audio + init state -> dri_pose.npy (T,6) + dri_blink.npy (T,2)."""
        import jax
        import jax.numpy as jnp

        cache = self.cache_path
        audio = np.load(os.path.join(cache, "target_audio.npy"))[None]
        try:
            init_pose = np.load(os.path.join(cache, "init_pose.npy"))[:, :6]
            init_blink = np.load(os.path.join(cache, "init_eye_bbox.npy"))[:, :2]
        except Exception:
            init_pose = DEFAULT_POSE[:, :6]
            init_blink = DEFAULT_EYE_BBOX[:, :2]

        init_pose_n = (init_pose - POSE_MIN) / (POSE_MAX - POSE_MIN)

        _, vars_p, gen_p = self._pbnet_entry("pose")
        _, vars_b, gen_b = self._pbnet_entry("blink")

        rng = jax.random.PRNGKey(self.seed)
        rp, rb = jax.random.split(rng)
        out_p = np.asarray(gen_p(vars_p, rp, jnp.asarray(init_pose_n),
                                 jnp.asarray(audio)))[0]
        out_b = np.asarray(gen_b(vars_b, rb, jnp.asarray(init_blink),
                                 jnp.asarray(audio)))[0]
        out_p = inv_transform(out_p + init_pose_n, POSE_MIN, POSE_MAX)
        out_b = out_b + init_blink
        np.save(os.path.join(cache, "dri_pose.npy"), out_p)
        np.save(os.path.join(cache, "dri_blink.npy"), out_b)

    # ------------------------------------------------------------ stage 4
    def _init_video_model(self):
        if self._video_model is not None:
            return self._video_model
        import jax
        from dawn_tpu.models.dm.flow_diffusion import FlowDiffusion, FlowDiffusionConfig
        from dawn_tpu.weights import convert_dawn_checkpoint, convert_lfg_checkpoint

        cfg = FlowDiffusionConfig(
            img_size=self.resolution, pose_dim=6, win_width=self.win_width,
            sampling_timesteps=self.sampling_step,
            ddim_sampling_eta=self.ddim_sampling_eta, attn_mode=self.attn_mode)
        model = FlowDiffusion(cfg)
        variables = model.init_variables(jax.random.PRNGKey(self.seed))
        if self.paths.dawn_ckpt:
            variables["unet"] = convert_dawn_checkpoint(self.paths.dawn_ckpt)
        else:
            print("[video_model] no DAWN checkpoint given — random UNet weights")
        if self.paths.lfg_ckpt:
            lfg = convert_lfg_checkpoint(self.paths.lfg_ckpt)
            variables["generator"] = lfg["generator"]
        else:
            print("[video_model] no LFG checkpoint given — random decoder weights")
        self._video_model = (model, variables)
        return self._video_model

    def generate_final_video(self) -> str:
        import cv2
        import jax
        import jax.numpy as jnp
        from PIL import Image

        cache = self.cache_path
        s = self.resolution
        name = os.path.splitext(os.path.basename(self.image_path))[0]
        video_dir = os.path.join(self.output_path, name, "video")
        img_dir = os.path.join(self.output_path, name, "img")
        os.makedirs(video_dir, exist_ok=True)
        os.makedirs(img_dir, exist_ok=True)

        image = Image.open(self.image_path).convert("RGB").resize((s, s),
                                                                  Image.BILINEAR)
        img = np.asarray(image, np.float32) / 255.0

        hubert = np.load(os.path.join(cache, "target_audio.npy"))
        t = min(self.max_n_frames, hubert.shape[0])
        hubert = hubert[:t]
        pose = np.load(os.path.join(cache, "dri_pose.npy"))[:t]
        blink = np.load(os.path.join(cache, "dri_blink.npy"))[:t]

        if self.bucket_frames > 0:
            (hubert, pose, blink), _ = pad_to_bucket(
                (hubert, pose, blink), t, self.bucket_frames,
                self.max_n_frames)
        try:
            real_pose = np.load(os.path.join(cache, "init_pose.npy"))
            eye_bbox = np.load(os.path.join(cache, "init_eye_bbox.npy"))
        except Exception:
            real_pose, eye_bbox = np.zeros((1, 7), np.float32), DEFAULT_EYE_BBOX

        model, variables = self._init_video_model()
        if self._sampler is None:
            # one jitted program: DDIM scan + batched LFG decode. cond_scale
            # is a python float -> static under jit (new scale recompiles,
            # same as the reference's CFG branch being data-independent)
            self._sampler = jax.jit(
                lambda v, r, *a, **k: model.sample_one_video(v, r, *a, **k),
                static_argnames=("cond_scale",))
        out = self._sampler(
            variables, jax.random.PRNGKey(self.seed),
            jnp.asarray(img[None]), jnp.asarray(hubert[None]),
            jnp.asarray(pose[None]), jnp.asarray(blink[None]),
            jnp.asarray(eye_bbox[:, 2:8].astype(np.float32)),
            init_pose=jnp.asarray(real_pose[:, :6].astype(np.float32)),
            init_eye=jnp.asarray(eye_bbox[:, :2].astype(np.float32)),
            cond_scale=self.cond_scale)
        frames = np.asarray(out["sample_out_vid"])[0][:t]      # (T, H, W, 3)

        silent_path = os.path.join(video_dir, f"{name}_silent.mp4")
        writer = cv2.VideoWriter(silent_path, cv2.VideoWriter_fourcc(*"mp4v"),
                                 25, (s, s))
        for i in range(t):
            frame = (np.clip(frames[i], 0, 1) * 255).astype(np.uint8)
            bgr = cv2.cvtColor(frame, cv2.COLOR_RGB2BGR)
            writer.write(bgr)
            cv2.imwrite(os.path.join(img_dir, f"{i:03d}.png"), bgr)
        writer.release()

        final_path = os.path.join(video_dir, f"{name}.mp4")
        if not self._mux_audio(silent_path, final_path, t):
            final_path = silent_path
        print(f"[generate_final_video] wrote {final_path} ({t} frames)")
        return final_path

    def _mux_audio(self, video_path: str, out_path: str, num_frames: int) -> bool:
        """ffmpeg audio mux when the binary exists (:567-586); else skip."""
        import shutil
        import subprocess
        if shutil.which("ffmpeg") is None:
            return False
        # the reference appends '-shortest' AFTER the output file
        # (unified:567-586) — old ffmpeg ignores trailing options with a
        # warning, ffmpeg >= 7 hard-errors. The effective reference command
        # therefore never applied it; '-t' below already bounds duration, so
        # it is dropped here rather than replicated.
        cmd = ["ffmpeg", "-y", "-i", self.audio_path, "-i", video_path,
               "-vcodec", "copy", "-t", f"{num_frames / 25.0:.3f}",
               "-pix_fmt", "yuv420p", out_path]
        return subprocess.run(cmd, capture_output=True).returncode == 0

    # -------------------------------------------------------------- driver
    def run(self) -> str:
        print("1. Extracting pose information...")
        self.extract_pose()
        print("2. Processing audio...")
        self.process_audio()
        print("3. Generating pose and blink data...")
        self.generate_pose_blink()
        print("4. Generating final video...")
        return self.generate_final_video()


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="DAWN-TPU unified video generator")
    p.add_argument("--audio_path", default="WRA_MarcoRubio_000.wav")
    p.add_argument("--image_path", default="real_female_1.jpeg")
    p.add_argument("--output_path", default="output")
    p.add_argument("--cache_path", default="cache/tmp")
    p.add_argument("--resolution", type=int, default=None,
                   help="128 or 256 (default: the config's input_size, "
                        "else 128); explicit values override the config")
    p.add_argument("--config", default=None,
                   help="reference-style DAWN yaml (defaults to "
                        "configs/dawn_{resolution}.yaml when that file "
                        "exists, exactly like unified_video_generator.py "
                        "loading config/DAWN_{resolution}.yaml)")
    p.add_argument("--hubert_dir", default=None)
    p.add_argument("--pbnet_pose_ckpt", default=None)
    p.add_argument("--pbnet_blink_ckpt", default=None)
    p.add_argument("--dawn_ckpt", default=None)
    p.add_argument("--lfg_ckpt", default=None)
    p.add_argument("--attn", default=None, choices=["full", "local", "pallas"],
                   help="default: the config's attn_mode, else 'local'")
    p.add_argument("--bucket_frames", type=int, default=25,
                   help="round video length up to this multiple so similar-"
                        "length videos reuse one compiled program (0 = exact; "
                        "default 25 = 1 s at 25 fps, since a fresh compile "
                        "costs minutes per distinct length)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    resolution = args.resolution if args.resolution is not None else 128
    config = args.config
    if config is None:
        default_cfg = os.path.join("configs", f"dawn_{resolution}.yaml")
        config = default_cfg if os.path.exists(default_cfg) else None
    # explicit CLI paths (strict: a typo raises); unset fields fall through
    # to the yaml's model_config / GeneratorPaths defaults
    user_paths = {k: v for k, v in dict(
        hubert_dir=args.hubert_dir,
        pbnet_pose_ckpt=args.pbnet_pose_ckpt,
        pbnet_blink_ckpt=args.pbnet_blink_ckpt,
        dawn_ckpt=args.dawn_ckpt, lfg_ckpt=args.lfg_ckpt).items() if v}
    overrides = dict(bucket_frames=args.bucket_frames)
    if args.attn is not None:
        overrides["attn_mode"] = args.attn
    if config is not None:
        if args.resolution is not None:
            # an explicit --resolution wins over the config's input_size
            overrides["resolution"] = args.resolution
        gen = VideoGenerator.from_config(
            config, args.audio_path, args.image_path, args.output_path,
            args.cache_path, paths_override=user_paths, **overrides)
    else:
        gen = VideoGenerator(args.audio_path, args.image_path,
                             args.output_path, args.cache_path, resolution,
                             paths=GeneratorPaths(**user_paths), **overrides)
    gen.run()


if __name__ == "__main__":
    main()
