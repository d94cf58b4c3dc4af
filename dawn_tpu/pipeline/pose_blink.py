"""Standalone PBnet pose/blink drive generation — separate and JOINT modes.

Capability parity with PBnet/src/evaluate/tvae_eval_single_both_eye_pose.py
(:43-152, the script the legacy run_ood_test pipeline calls): loads a PBnet
checkpoint with its sibling opt.yaml, normalizes the init state with the
8-d min/max constants (:20-23), generates with fixed seed 1234 (:84), adds the
init state back, de-normalizes, and writes dri_pose.npy (T,6) +
dri_blink.npy (T,2).

Two checkpoint layouts:
- 'both' (joint): one reemb5 CVAE over the 8-d [pose(6), blink(2)] vector
  (pretrain_models/pbnet_both, run_DM_v0_df_test_128_both_pose_blink.sh:25).
- separate: two CVAEs (pose 6-d, blink 2-d), the unified generator's layout
  (unified_video_generator.py:101-113).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

# 8-d joint normalization constants (tvae_eval_single_both_eye_pose.py:20-23)
MAX_VALS_8 = np.array([90, 90, 90, 1, 720, 1080, 1, 1], np.float32)
MIN_VALS_8 = np.array([-90, -90, -90, 0, 0, 0, 0, 0], np.float32)
# 3DDFA-failure fallbacks (:73-77)
DEFAULT_POSE_6 = np.array([[0, 0, 0, 4.79e-04, 5.65e+01, 6.49e+01]], np.float32)
DEFAULT_BLINK_2 = np.array([[0.3, 0.3]], np.float32)


def _load_init(init_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    try:
        pose = np.load(os.path.join(init_dir, "init_pose.npy"))[:, :6]
        blink = np.load(os.path.join(init_dir, "init_eye_bbox.npy"))[:, :2]
        return pose.astype(np.float32), blink.astype(np.float32)
    except Exception:
        return DEFAULT_POSE_6, DEFAULT_BLINK_2


import functools


@functools.lru_cache(maxsize=4)
def load_pbnet_with_opt(ckpt_path: str, pos_dim: int, eye_dim: int):
    """CVAE + converted weights from a .pth.tar + sibling opt.yaml.

    lru-cached: batch drivers (scripts/ood_test.py) call the generate
    functions once per (pair, sample) — without the cache every iteration
    would reload + reconvert the torch checkpoint and re-trace generate."""
    import yaml
    from dawn_tpu.models.pbnet import build_pbnet
    from dawn_tpu.weights import convert_pbnet_checkpoint

    with open(os.path.join(os.path.dirname(ckpt_path), "opt.yaml"), "rb") as f:
        opt = dict(yaml.load(f, Loader=yaml.Loader))
    opt["audio_dim"] = 1024
    opt["pos_dim"], opt["eye_dim"] = pos_dim, eye_dim
    model = build_pbnet(opt, deterministic=True)
    variables = convert_pbnet_checkpoint(ckpt_path,
                                         num_layers=model.hp.num_layers)
    return model, variables


def generate_drives_joint(ckpt_path: str, audio: np.ndarray,
                          init_pose: np.ndarray, init_blink: np.ndarray,
                          seed: int = 1234, fact: float = 1.0
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Joint 8-d generation (the 'both' checkpoint).

    audio: (T, 1024); init_pose (1, 6); init_blink (1, 2).
    Returns (dri_pose (T, 6), dri_blink (T, 2)) in physical units.
    """
    import jax
    import jax.numpy as jnp

    model, variables = load_pbnet_with_opt(ckpt_path, pos_dim=6, eye_dim=2)
    init8 = np.concatenate([init_pose[:, :6], init_blink[:, :2]], axis=-1)
    init8n = (init8 - MIN_VALS_8) / (MAX_VALS_8 - MIN_VALS_8)

    rng = jax.random.PRNGKey(seed)
    out = np.asarray(model.generate(
        variables, rng, jnp.asarray(init8n), jnp.asarray(audio[None]),
        fact=fact))[0]
    out = (out + init8n) * (MAX_VALS_8 - MIN_VALS_8) + MIN_VALS_8
    return out[:, :6], out[:, 6:]


def generate_drives_separate(pose_ckpt: str, blink_ckpt: str,
                             audio: np.ndarray, init_pose: np.ndarray,
                             init_blink: np.ndarray, seed: int = 1234,
                             fact: float = 1.0
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """Separate pose/blink checkpoints (unified_video_generator.py:252-302)."""
    import jax
    import jax.numpy as jnp

    model_p, vars_p = load_pbnet_with_opt(pose_ckpt, pos_dim=6, eye_dim=0)
    model_b, vars_b = load_pbnet_with_opt(blink_ckpt, pos_dim=2, eye_dim=0)

    pose_max, pose_min = MAX_VALS_8[:6], MIN_VALS_8[:6]
    init_pose_n = (init_pose[:, :6] - pose_min) / (pose_max - pose_min)

    rp, rb = jax.random.split(jax.random.PRNGKey(seed))
    aud = jnp.asarray(audio[None])
    out_p = np.asarray(model_p.generate(vars_p, rp, jnp.asarray(init_pose_n),
                                        aud, fact=fact))[0]
    out_b = np.asarray(model_b.generate(vars_b, rb,
                                        jnp.asarray(init_blink[:, :2]),
                                        aud, fact=fact))[0]
    out_p = (out_p + init_pose_n) * (pose_max - pose_min) + pose_min
    out_b = out_b + init_blink[:, :2]
    return out_p, out_b


def run(audio_path: str, init_dir: str, output_dir: str,
        ckpt: Optional[str] = None, pose_ckpt: Optional[str] = None,
        blink_ckpt: Optional[str] = None, seed: int = 1234) -> None:
    """CLI entry: target_audio .npy + init dir -> dri_pose/dri_blink .npy."""
    audio = np.load(audio_path).astype(np.float32)
    init_pose, init_blink = _load_init(init_dir)
    if ckpt:
        pose, blink = generate_drives_joint(ckpt, audio, init_pose, init_blink,
                                            seed)
    else:
        pose, blink = generate_drives_separate(pose_ckpt, blink_ckpt, audio,
                                               init_pose, init_blink, seed)
    os.makedirs(output_dir, exist_ok=True)
    np.save(os.path.join(output_dir, "dri_pose.npy"), pose)
    np.save(os.path.join(output_dir, "dri_blink.npy"), blink)
    print(f"wrote dri_pose.npy {pose.shape} / dri_blink.npy {blink.shape} "
          f"to {output_dir}")


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description="PBnet drive generation "
                                "(tvae_eval_single_both_eye_pose parity)")
    p.add_argument("--audio_path", required=True,
                   help="target_audio.npy (T, 1024)")
    p.add_argument("--init_pose_blink", required=True,
                   help="dir with init_pose.npy / init_eye_bbox.npy")
    p.add_argument("--output", required=True)
    p.add_argument("--ckpt", default=None, help="joint 'both' checkpoint")
    p.add_argument("--pose_ckpt", default=None)
    p.add_argument("--blink_ckpt", default=None)
    p.add_argument("--seed", type=int, default=1234)
    a = p.parse_args(argv)
    if not a.ckpt and not (a.pose_ckpt and a.blink_ckpt):
        p.error("give --ckpt (joint) or both --pose_ckpt and --blink_ckpt")
    run(a.audio_path, a.init_pose_blink, a.output, a.ckpt, a.pose_ckpt,
        a.blink_ckpt, a.seed)


if __name__ == "__main__":
    main()
