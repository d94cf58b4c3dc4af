"""Batch OOD testing — the run_ood_test/*.sh pipeline as one script.

Capability parity with run_ood_test/run_DM_v0_df_test_{128,256}_*.sh: for each
(image, audio) pair run the full 4-stage pipeline (3DDFA init state -> HuBERT
-> PBnet drives [joint 'both' or separate pose/blink checkpoints] -> DM
sample + LFG decode) at 128 or 256, caching each stage's .npy artifacts under
cache/<tag>/ exactly like the legacy multi-conda-env scripts — except here it
is a single process and the models stay resident across pairs.

Usage:
  python scripts/ood_test.py --pairs pairs.txt --resolution 128 \
      [--both-ckpt .../pbnet_both/checkpoint_100000.pth.tar |
       --pose-ckpt ... --blink-ckpt ...] \
      --dawn-ckpt DAWN_128.pth --lfg-ckpt LFG_128.pth --hubert-dir ...

pairs.txt: one "image_path audio_path" per line (defaults to the repo demo
pair the reference README uses: real_female_1.jpeg WRA_MarcoRubio_000.wav).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", default=None,
                    help="file of 'image audio' lines; default: demo pair")
    ap.add_argument("--image", default="real_female_1.jpeg")
    ap.add_argument("--audio", default="WRA_MarcoRubio_000.wav")
    ap.add_argument("--output", default="output/ood_test")
    ap.add_argument("--cache", default="cache")
    ap.add_argument("--resolution", type=int, default=128, choices=[128, 256])
    ap.add_argument("--both-ckpt", default=None,
                    help="joint pose+blink PBnet checkpoint (reemb5 8-d)")
    ap.add_argument("--pose-ckpt", default=None)
    ap.add_argument("--blink-ckpt", default=None)
    ap.add_argument("--dawn-ckpt", default=None)
    ap.add_argument("--lfg-ckpt", default=None)
    ap.add_argument("--hubert-dir", default=None)
    ap.add_argument("--seed", type=int, default=1234)
    args = ap.parse_args()

    if args.pairs:
        with open(args.pairs) as f:
            pairs = [ln.split() for ln in f if ln.strip()]
    else:
        pairs = [(args.image, args.audio)]

    from dawn_tpu.pipeline.generator import GeneratorPaths, VideoGenerator
    from dawn_tpu.pipeline import pose_blink

    for i, (image, audio) in enumerate(pairs):
        tag = f"{os.path.splitext(os.path.basename(image))[0]}_" \
              f"{os.path.splitext(os.path.basename(audio))[0]}"
        cache = os.path.join(args.cache, tag)
        print(f"[{i + 1}/{len(pairs)}] {tag}")
        t0 = time.time()

        paths = GeneratorPaths(
            hubert_dir=args.hubert_dir or GeneratorPaths.hubert_dir,
            pbnet_pose_ckpt=args.pose_ckpt or GeneratorPaths.pbnet_pose_ckpt,
            pbnet_blink_ckpt=args.blink_ckpt or GeneratorPaths.pbnet_blink_ckpt,
            dawn_ckpt=args.dawn_ckpt, lfg_ckpt=args.lfg_ckpt)
        gen = VideoGenerator(audio, image, args.output, cache,
                             args.resolution, paths, seed=args.seed)
        gen.extract_pose()
        gen.process_audio()
        if args.both_ckpt:
            # joint-checkpoint drive generation (the *_both_* OOD scripts)
            pose_blink.run(os.path.join(cache, "target_audio.npy"), cache,
                           cache, ckpt=args.both_ckpt, seed=args.seed)
        else:
            gen.generate_pose_blink()
        out = gen.generate_final_video()
        print(f"  -> {out} ({time.time() - t0:.1f}s)")


if __name__ == "__main__":
    main()
