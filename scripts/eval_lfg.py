"""LFG reconstruction eval driver — the reference's golden-output test.

Capability parity with LFG/test_flowautoenc_hdtf_video.py (and its 256/CREMA
variants): loads an LFG checkpoint, reconstructs held-out videos through the
frozen FlowAE, writes per-video L1 losses to JSON plus side-by-side
(driving | reconstruction) videos.

Usage:
  python scripts/eval_lfg.py --lfg-ckpt LFG_128_1000ep.pth \
      --frames-dir <video tree> [--img-size 128] [--num-videos 10]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lfg-ckpt", required=True)
    ap.add_argument("--frames-dir", required=True)
    ap.add_argument("--img-size", type=int, default=128)
    ap.add_argument("--num-videos", type=int, default=10)
    ap.add_argument("--workdir", default="runs/lfg_eval")
    ap.add_argument("--write-videos", action="store_true")
    args = ap.parse_args()

    from dawn_tpu.models.lfg.flow_ae import FlowAE
    from dawn_tpu.weights import convert_lfg_checkpoint
    from dawn_tpu.evaluate.lfg_recon import evaluate_reconstruction
    from dawn_tpu.train.data import FramesDataset, HDTF_TEST_SPLIT

    flow_ae = FlowAE()
    variables = convert_lfg_checkpoint(args.lfg_ckpt)

    ds = FramesDataset(args.frames_dir, mode="test", image_size=args.img_size)
    held_out = [i for i, v in enumerate(ds.videos) if v in HDTF_TEST_SPLIT] \
        or list(range(len(ds)))

    def video_iter():
        for i in held_out:
            s = ds.sample(i)
            yield s["name"], s["video"]

    losses = evaluate_reconstruction(
        flow_ae, variables, video_iter(),
        json_path=os.path.join(args.workdir, "recon_losses.json"),
        video_dir=os.path.join(args.workdir, "videos")
        if args.write_videos else None,
        max_videos=args.num_videos)
    mean = sum(losses.values()) / max(len(losses), 1)
    print(f"{len(losses)} videos, mean L1 {mean:.5f}")


if __name__ == "__main__":
    main()
