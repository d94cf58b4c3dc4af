"""Batch audio feature extraction — HuBERT and/or mel+F0 over a wav tree.

Capability parity with the dataset-scale extractors in hubert_extract/
data_gen/process_lrs3/ (process_audio_hubert*.py batch variants and
process_audio_mel_f0.py): walks --wav-dir, writes one .npy (hubert, (T,1024)
interpolated to 25 fps) and/or one .npz (mel/f0/f0_coarse) per wav into
--out-dir, skipping existing outputs for resumability.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--features", default="hubert",
                    choices=["hubert", "mel_f0", "both"])
    ap.add_argument("--hubert-dir", default=None,
                    help="HF hubert-large-ls960-ft directory")
    args = ap.parse_args()
    if args.features in ("hubert", "both") and not args.hubert_dir:
        ap.error("--hubert-dir is required for --features hubert/both "
                 "(no random-weight fallback here: extracted features feed "
                 "training/eval and must come from the real checkpoint)")

    import numpy as np
    from dawn_tpu.pipeline.audio import read_wav_16k

    wavs = sorted(f for f in os.listdir(args.wav_dir) if f.endswith(".wav"))
    os.makedirs(args.out_dir, exist_ok=True)
    print(f"{len(wavs)} wavs")

    hubert_fwd = None
    if args.features in ("hubert", "both"):
        import jax
        import jax.numpy as jnp
        from dawn_tpu.models.hubert import HubertModel
        from dawn_tpu.weights.hubert_convert import convert_hubert_pretrained
        variables, cfg = convert_hubert_pretrained(args.hubert_dir)
        model = HubertModel(cfg)
        fwd = jax.jit(lambda w: model.apply(variables, w))
        hubert_fwd = lambda w: np.asarray(fwd(jnp.asarray(w)))

    for i, name in enumerate(wavs):
        base = os.path.splitext(name)[0]
        wav_path = os.path.join(args.wav_dir, name)
        try:
            wav = read_wav_16k(wav_path)
        except Exception as e:
            print(f"skip {name}: {e}")
            continue
        if hubert_fwd is not None:
            out = os.path.join(args.out_dir, base + ".npy")
            if not os.path.exists(out):
                from dawn_tpu.pipeline.audio import process_audio
                np.save(out, process_audio(wav_path, hubert_fwd))
        if args.features in ("mel_f0", "both"):
            out = os.path.join(args.out_dir, base + "_mel_f0.npz")
            if not os.path.exists(out):
                from dawn_tpu.pipeline.mel_f0 import extract_mel_f0
                mel, f0, f0c = extract_mel_f0(wav)
                np.savez(out, mel=mel, f0=f0, f0_coarse=f0c)
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{len(wavs)}")
    print("done")


if __name__ == "__main__":
    main()
