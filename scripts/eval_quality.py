"""Quality evaluation: FVD-style Frechet + lip-sync proxy for generated videos.

The quality leg of the north-star (BASELINE.md): reconstruction fixtures on
the held-out split, JSON metrics out — the reference's golden-output pattern
(LFG/test_flowautoenc_hdtf_video.py:57 writes per-video losses to JSON).

Usage:
  python scripts/eval_quality.py --real-dir DIR --fake-dir DIR \
      [--lfg-ckpt LFG_128.pth] [--i3d-ckpt rgb_imagenet.pt] \
      [--mouth-lmk-dir DIR] [--out quality.json]

real/fake dirs hold matching-named .npy videos (T, H, W, 3) uint8 or float
[0,1]; mouth-lmk dir (optional) matching .npy (T, K, 2) pixel landmarks.
Without --lfg-ckpt the LFG feature extractor is random-init (pipeline smoke
only — Frechet numbers are then NOT comparable across runs). With
--i3d-ckpt (the public pytorch-i3d Kinetics-400 weights; torch-free
reader) the report additionally carries the REAL standard FVD
(evaluate/i3d.py, parity-tested converter).
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_videos(d):
    names, vids = [], []
    for p in sorted(glob.glob(os.path.join(d, "*.npy"))):
        v = __import__("numpy").load(p)
        if v.dtype == __import__("numpy").uint8:
            v = v.astype("float32") / 255.0
        names.append(os.path.splitext(os.path.basename(p))[0])
        vids.append(v)
    return names, vids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--real-dir", required=True)
    ap.add_argument("--fake-dir", required=True)
    ap.add_argument("--lfg-ckpt", default=None)
    ap.add_argument("--i3d-ckpt", default=None,
                    help="pytorch-i3d Kinetics-400 state dict (.pt) for the "
                         "standard FVD backbone")
    ap.add_argument("--mouth-lmk-dir", default=None)
    ap.add_argument("--out", default="quality.json")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu)")
    args = ap.parse_args()

    import numpy as np
    from dawn_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dawn_tpu.models.lfg import LFGGenerator
    from dawn_tpu.evaluate.quality import evaluate_quality, lip_sync_proxy

    real_names, real = _load_videos(args.real_dir)
    fake_names, fake = _load_videos(args.fake_dir)
    common = [n for n in real_names if n in set(fake_names)]
    assert common, "no matching video names between real and fake dirs"
    tmin = min(min(v.shape[0] for v in real), min(v.shape[0] for v in fake))
    ridx = {n: i for i, n in enumerate(real_names)}
    fidx = {n: i for i, n in enumerate(fake_names)}
    R = np.stack([real[ridx[n]][:tmin] for n in common])
    F = np.stack([fake[fidx[n]][:tmin] for n in common])

    generator = LFGGenerator()
    if args.lfg_ckpt:
        from dawn_tpu.weights import convert_lfg_checkpoint
        variables = convert_lfg_checkpoint(args.lfg_ckpt)["generator"]
    else:
        print("WARNING: no --lfg-ckpt; feature extractor is random-init",
              file=sys.stderr)
        import jax.numpy as jnp
        variables = generator.init(
            jax.random.PRNGKey(0), jnp.zeros((1,) + R.shape[2:4] + (3,)),
            method=LFGGenerator.compute_fea)

    mouth = None
    if args.mouth_lmk_dir:
        mouth = np.stack([
            np.load(os.path.join(args.mouth_lmk_dir, n + ".npy"))[:tmin]
            for n in common])

    report = evaluate_quality(generator, variables, R, F, mouth)
    if args.i3d_ckpt:
        from dawn_tpu.evaluate.i3d import fvd_i3d
        from dawn_tpu.weights.i3d_convert import convert_i3d
        report["fvd_i3d"] = float(fvd_i3d(convert_i3d(args.i3d_ckpt), R, F))
    # per-video L1 like the reference's JSON fixture
    report["per_video_l1"] = {
        n: float(np.abs(F[i] - R[i]).mean()) for i, n in enumerate(common)}
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items()
                      if not isinstance(v, dict)}, indent=2))


if __name__ == "__main__":
    main()
