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
    ap.add_argument("--resolution", type=int, default=128,
                    help="128/256 in production (the shipped checkpoints); "
                         "other sizes run the assetless random-weight "
                         "topology (tests)")
    ap.add_argument("--sampling-step", type=int, default=20)
    ap.add_argument("--win-width", type=int, default=40)
    ap.add_argument("--bucket-frames", type=int, default=25)
    ap.add_argument("--both-ckpt", default=None,
                    help="joint pose+blink PBnet checkpoint (reemb5 8-d)")
    ap.add_argument("--pose-ckpt", default=None)
    ap.add_argument("--blink-ckpt", default=None)
    ap.add_argument("--dawn-ckpt", default=None)
    ap.add_argument("--lfg-ckpt", default=None)
    ap.add_argument("--hubert-dir", default=None)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--metrics", action="store_true",
                    help="after generating, emit metrics.json (Frechet / "
                         "diversity / multimodality / identity-accuracy / "
                         "lip-sync) over the whole batch — the one-command "
                         "generate->metrics path (golden-output pattern, "
                         "LFG/test_flowautoenc_hdtf_video.py:57)")
    ap.add_argument("--samples-per-pair", type=int, default=1,
                    help=">=2 enables the multimodality metric (several "
                         "generations of the same conditioning)")
    ap.add_argument("--real-dir", default=None,
                    help="folder of GT videos named <tag>.mp4 for the "
                         "Frechet reference set + mouth lip-sync proxy")
    args = ap.parse_args()

    if args.pairs:
        with open(args.pairs) as f:
            pairs = [ln.split() for ln in f if ln.strip()]
    else:
        pairs = [(args.image, args.audio)]

    from dawn_tpu.pipeline.generator import GeneratorPaths, VideoGenerator
    from dawn_tpu.pipeline import pose_blink

    gen_videos, gen_labels, src_images, real_videos = [], [], [], []
    gen_audio = []
    # models + jitted programs stay resident across (pair, sample) iterations
    # — a fresh VideoGenerator per iteration would rebuild HuBERT/PBnet and
    # re-trace every jit (the XLA compile cache only saves the compile)
    resident = {"_video_model": None, "_hubert": None, "_pbnet": {},
                "_sampler": None}

    paths = GeneratorPaths(
        hubert_dir=args.hubert_dir or GeneratorPaths.hubert_dir,
        pbnet_pose_ckpt=args.pose_ckpt or GeneratorPaths.pbnet_pose_ckpt,
        pbnet_blink_ckpt=args.blink_ckpt or GeneratorPaths.pbnet_blink_ckpt,
        dawn_ckpt=args.dawn_ckpt, lfg_ckpt=args.lfg_ckpt)

    for i, (image, audio) in enumerate(pairs):
        tag = f"{os.path.splitext(os.path.basename(image))[0]}_" \
              f"{os.path.splitext(os.path.basename(audio))[0]}"
        cache = os.path.join(args.cache, tag)

        for s_idx in range(args.samples_per_pair):
            print(f"[{i + 1}/{len(pairs)}] {tag} sample {s_idx}")
            t0 = time.time()
            # outputs keyed by the (image, audio) TAG — the generator itself
            # keys by image name only, so two pairs sharing an image would
            # overwrite each other's frames
            outdir = os.path.join(args.output, tag
                                  if args.samples_per_pair == 1
                                  else os.path.join(f"s{s_idx}", tag))
            name = os.path.splitext(os.path.basename(image))[0]
            img_dir = os.path.join(outdir, name, "img")
            if os.path.isdir(img_dir):
                # stale higher-numbered PNGs from a longer earlier run would
                # otherwise leak into the metrics frame stack
                for f in os.listdir(img_dir):
                    os.remove(os.path.join(img_dir, f))
            gen = VideoGenerator(audio, image, outdir, cache,
                                 args.resolution, paths,
                                 win_width=args.win_width,
                                 sampling_step=args.sampling_step,
                                 bucket_frames=args.bucket_frames,
                                 seed=args.seed + s_idx)
            for k, v in resident.items():
                if v:
                    setattr(gen, k, v)
            gen.extract_pose()
            gen.process_audio()
            if args.both_ckpt:
                # joint-checkpoint drive generation (the *_both_* OOD scripts)
                pose_blink.run(os.path.join(cache, "target_audio.npy"), cache,
                               cache, ckpt=args.both_ckpt,
                               seed=args.seed + s_idx)
            else:
                gen.generate_pose_blink()
            out = gen.generate_final_video()
            resident = {k: getattr(gen, k) for k in resident}
            print(f"  -> {out} ({time.time() - t0:.1f}s)")

            if args.metrics:
                name = os.path.splitext(os.path.basename(image))[0]
                gen_videos.append(_load_frames(
                    os.path.join(outdir, name, "img"), args.resolution))
                gen_labels.append(i)
                # the driving HuBERT features of THIS clip — feeds the
                # offset-sweep AV-sync proxy (no GT video needed)
                import numpy as _np
                gen_audio.append(_np.load(
                    os.path.join(cache, "target_audio.npy")))
        if args.metrics:
            src_images.append(_load_image(image, args.resolution))
            if args.real_dir:
                real = _load_video(os.path.join(args.real_dir, f"{tag}.mp4"),
                                   args.resolution)
                for _ in range(args.samples_per_pair):
                    real_videos.append(real)

    if args.metrics:
        _emit_metrics(args, resident["_video_model"], gen_videos, gen_labels,
                      src_images, real_videos, gen_audio)


def _load_image(path, size):
    import numpy as np
    from PIL import Image
    img = Image.open(path).convert("RGB").resize((size, size), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


def _load_frames(img_dir, size):
    import numpy as np
    import cv2
    frames = []
    for f in sorted(os.listdir(img_dir)):
        if f.endswith(".png"):
            bgr = cv2.imread(os.path.join(img_dir, f))
            if bgr.shape[:2] != (size, size):  # stale frames from a prior
                bgr = cv2.resize(bgr, (size, size))  # run at another res
            frames.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
    return np.asarray(frames, np.float32) / 255.0


def _load_video(path, size):
    import numpy as np
    import cv2
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, bgr = cap.read()
        if not ok:
            break
        bgr = cv2.resize(bgr, (size, size))
        frames.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
    cap.release()
    return np.asarray(frames, np.float32) / 255.0


def _emit_metrics(args, video_model, gen_videos, gen_labels, src_images,
                  real_videos, gen_audio=None):
    import json
    import numpy as np
    from dawn_tpu.evaluate.quality import evaluate_generated_batch

    t = min(v.shape[0] for v in gen_videos)
    videos = np.stack([v[:t] for v in gen_videos])
    real = (np.stack([r[:t] for r in real_videos])
            if real_videos else None)
    audio = (np.stack([a[:t] for a in gen_audio])
             if gen_audio and all(a.shape[0] >= t for a in gen_audio)
             else None)
    model, variables = video_model
    report = evaluate_generated_batch(
        model.generator, variables["generator"], videos,
        np.asarray(gen_labels), np.stack(src_images), real_videos=real,
        audio_feats=audio)
    path = os.path.join(args.output, "metrics.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"metrics -> {path}")
    print(json.dumps({k: v for k, v in report.items()
                      if not isinstance(v, (dict, list))}, indent=2))


if __name__ == "__main__":
    main()
