"""Drive the WHOLE `VideoGenerator.run()` — all four stages, assetless.

The reference's only end-to-end entry is `unified_video_generator.py` run by
hand; here the equivalent (pipeline/generator.py) is an automated test: a
synthetic WAV + PNG go in, every stage runs on its documented
random-weight/constant fallback, and the cache-file contract (SURVEY §1) plus
the final mp4 come out. HuBERT is shrunk to one layer (output width stays
1024) so the CPU run is seconds, not minutes; everything else is the real
deployed topology at reduced resolution/steps.
"""

import os

import numpy as np
import pytest


@pytest.fixture()
def tiny_hubert(monkeypatch):
    from dawn_tpu.models.hubert.model import HubertConfig
    tiny = HubertConfig(hidden_size=1024, num_hidden_layers=1,
                        num_attention_heads=16, intermediate_size=128,
                        conv_dim=(32,) * 7)
    monkeypatch.setattr(HubertConfig, "large", classmethod(lambda cls: tiny))
    return tiny


def test_from_config(tmp_path):
    """Reference-style yaml -> constructor fields (unified:119-129)."""
    from dawn_tpu.pipeline.generator import VideoGenerator

    gen = VideoGenerator.from_config(
        "configs/dawn_256.yaml", "a.wav", "i.png",
        str(tmp_path / "out"), str(tmp_path / "cache"))
    assert gen.resolution == 256
    assert gen.max_n_frames == 200
    assert gen.win_width == 40
    assert gen.sampling_step == 20
    assert gen.ddim_sampling_eta == 1.0
    assert gen.seed == 1234
    # yaml-shipped ckpt paths are default-like: absent on this machine ->
    # resolved to None (assetless fallback) instead of a stage-4 crash
    assert gen.paths.dawn_ckpt is None
    assert gen.paths.lfg_ckpt is None
    # overrides win
    gen = VideoGenerator.from_config(
        "configs/dawn_128.yaml", "a.wav", "i.png",
        str(tmp_path / "out"), str(tmp_path / "cache"),
        sampling_step=2, attn_mode="full")
    assert gen.resolution == 128 and gen.sampling_step == 2
    assert gen.attn_mode == "full"


def test_explicit_missing_asset_raises(tmp_path):
    """An explicitly supplied (non-default) missing path must fail loudly,
    not silently generate garbage from random weights; missing DEFAULT
    locations still fall back (see _resolve_asset)."""
    from dawn_tpu.pipeline.generator import _resolve_asset, GeneratorPaths

    with pytest.raises(FileNotFoundError):
        _resolve_asset(str(tmp_path / "typo.pth.tar"), None, "pbnet-pose")
    assert _resolve_asset(GeneratorPaths.pbnet_pose_ckpt,
                          GeneratorPaths.pbnet_pose_ckpt, "pbnet-pose") is None
    assert _resolve_asset(None, None, "x") is None
    real = tmp_path / "ok.pth"
    real.write_bytes(b"")
    assert _resolve_asset(str(real), None, "x") == str(real)


def test_load_pth_missing_file_raises():
    from dawn_tpu.weights.pth_reader import load_pth
    with pytest.raises(FileNotFoundError):
        load_pth("/nonexistent/checkpoint.pth")


def test_run_assetless(tmp_path, tiny_hubert):
    from scipy.io import wavfile
    from PIL import Image
    from dawn_tpu.pipeline.generator import GeneratorPaths, VideoGenerator

    rng = np.random.RandomState(0)
    wav_path = str(tmp_path / "speech.wav")
    wavfile.write(wav_path, 16000,
                  (rng.randn(int(16000 * 1.2)) * 3000).astype(np.int16))
    img_path = str(tmp_path / "face.png")
    Image.fromarray((rng.rand(40, 40, 3) * 255).astype(np.uint8)).save(img_path)

    cache = str(tmp_path / "cache")
    out_dir = str(tmp_path / "out")
    paths = GeneratorPaths(hubert_dir=None, pbnet_pose_ckpt=None,
                           pbnet_blink_ckpt=None, dawn_ckpt=None,
                           lfg_ckpt=None, tddfa_onnx_dir=None)
    gen = VideoGenerator(wav_path, img_path, out_dir, cache, resolution=32,
                         paths=paths, sampling_step=2, win_width=4,
                         bucket_frames=25)
    final_path = gen.run()

    # the .npy cache contract (unified_video_generator.py:53,195-200,299-302)
    t = 30  # 1.2 s * 25 fps
    assert np.load(os.path.join(cache, "init_pose.npy")).shape == (1, 7)
    assert np.load(os.path.join(cache, "init_eye_bbox.npy")).shape == (1, 8)
    assert np.load(os.path.join(cache, "target_audio.npy")).shape == (t, 1024)
    assert np.load(os.path.join(cache, "dri_pose.npy")).shape == (t, 6)
    assert np.load(os.path.join(cache, "dri_blink.npy")).shape == (t, 2)

    # final video exists (muxed when ffmpeg is present, silent otherwise)
    assert os.path.exists(final_path) and final_path.endswith(".mp4")
    import cv2
    cap = cv2.VideoCapture(final_path)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == t
    frame_ok, frame = cap.read()
    cap.release()
    assert frame_ok and frame.shape == (32, 32, 3)

    # per-frame PNG dump (reference :359-393 writes both)
    name = os.path.splitext(os.path.basename(img_path))[0]
    pngs = os.listdir(os.path.join(out_dir, name, "img"))
    assert len(pngs) == t

    # a second run must reuse every cached jitted program — no re-tracing
    # (models/jits are cached on the VideoGenerator: _hubert, _pbnet, _sampler)
    # — and, seeded, must reproduce the frames byte-for-byte
    frame0 = open(os.path.join(out_dir, name, "img", pngs[0]), "rb").read()
    gen.run()
    assert gen._sampler._cache_size() == 1
    for kind in ("pose", "blink"):
        assert gen._pbnet[kind][2]._cache_size() == 1
    assert open(os.path.join(out_dir, name, "img", pngs[0]), "rb").read() \
        == frame0
