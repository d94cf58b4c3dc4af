"""FULL-pipeline benchmark: all four VideoGenerator stages, one process.

BENCH_*.json and bench.py time stage 4 only (DDIM + LFG decode) — the
reference's own headline phase. The BASELINE north star, though, is
"e2e seconds per 10 s video", and the reference pipeline also runs HuBERT
(stage 2) and PBnet (stage 3) per video (unified_video_generator.py:402-414).
This script drives the real `VideoGenerator.run()` path on synthetic assets
(10-s WAV, portrait PNG) with random weights — throughput is
weight-independent — and reports per-stage wall times, cold (compile) and
warm (steady), plus the warm e2e total.

Usage: python scripts/bench_pipeline.py [--resolution 128] [--seconds 10]
                                        [--json-out BENCH_pipeline.json]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_assets(tmp, seconds, resolution):
    import numpy as np
    from scipy.io import wavfile
    from PIL import Image

    rng = np.random.RandomState(0)
    wav = (rng.randn(16000 * seconds) * 3000).astype(np.int16)
    wav_path = os.path.join(tmp, "speech.wav")
    wavfile.write(wav_path, 16000, wav)

    img = (rng.rand(resolution, resolution, 3) * 255).astype(np.uint8)
    img_path = os.path.join(tmp, "face.png")
    Image.fromarray(img).save(img_path)
    return wav_path, img_path


def time_stages(gen):
    """Run the four stages exactly as VideoGenerator.run(), timed."""
    out = {}
    t0 = time.perf_counter(); gen.extract_pose()
    out["extract_pose"] = time.perf_counter() - t0
    t0 = time.perf_counter(); gen.process_audio()
    out["process_audio"] = time.perf_counter() - t0
    t0 = time.perf_counter(); gen.generate_pose_blink()
    out["generate_pose_blink"] = time.perf_counter() - t0
    t0 = time.perf_counter(); gen.generate_final_video()
    out["generate_final_video"] = time.perf_counter() - t0
    out["e2e"] = sum(out.values())
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=128)
    ap.add_argument("--seconds", type=int, default=10)
    ap.add_argument("--attn", default="local")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import jax
    from dawn_tpu.pipeline.generator import GeneratorPaths, VideoGenerator

    tmp = tempfile.mkdtemp(prefix="dawn_bench_pipeline_")
    wav_path, img_path = synth_assets(tmp, args.seconds, args.resolution)

    # nonexistent asset dirs -> every stage takes its random-weight fallback
    paths = GeneratorPaths(hubert_dir=None, pbnet_pose_ckpt=None,
                           pbnet_blink_ckpt=None, dawn_ckpt=None,
                           lfg_ckpt=None, tddfa_onnx_dir=None)
    gen = VideoGenerator(
        wav_path, img_path, os.path.join(tmp, "out"),
        os.path.join(tmp, "cache"), resolution=args.resolution, paths=paths,
        sampling_step=args.steps, attn_mode=args.attn)

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)
    cold = time_stages(gen)
    print("cold (incl. model build + compile): "
          + "  ".join(f"{k}={v:.1f}s" for k, v in cold.items()),
          file=sys.stderr)
    warm_runs = [time_stages(gen) for _ in range(2)]
    warm = min(warm_runs, key=lambda r: r["e2e"])
    print("warm: " + "  ".join(f"{k}={v:.2f}s" for k, v in warm.items()),
          file=sys.stderr)

    n_frames = min(args.seconds * 25, gen.max_n_frames)
    rec = {
        "metric": (f"full-pipeline e2e seconds per {args.seconds}s video "
                   f"({args.resolution}x{args.resolution}, all 4 stages: "
                   f"3DDFA-fallback + HuBERT + PBnet + {args.steps}-step "
                   f"DDIM + LFG decode + mp4 write, {n_frames} frames)"),
        "value": round(warm["e2e"], 3),
        "unit": "seconds",
        "stages_warm_s": {k: round(v, 3) for k, v in warm.items()},
        "stages_cold_s": {k: round(v, 1) for k, v in cold.items()},
        "frames": n_frames,
        "warm_fps": round(n_frames / warm["e2e"], 2),
    }
    line = json.dumps(rec)
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line + "\n")
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
