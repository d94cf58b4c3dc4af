"""Mel/F0 extraction sanity tests (pure numpy path, no librosa in image)."""

import numpy as np

from dawn_tpu.pipeline.mel_f0 import (
    extract_f0, extract_mel, extract_mel_f0, f0_to_coarse, mel_filterbank,
)

SR = 16000


def _tone(freq, seconds=1.0, sr=SR):
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_mel_shape_and_frames():
    wav = _tone(220.0, 1.0)
    mel = extract_mel(wav)
    # librosa center=True frame count: 1 + len // hop
    assert mel.shape == (1 + len(wav) // 320, 80)
    assert np.isfinite(mel).all()


def test_mel_peak_tracks_frequency():
    fb = mel_filterbank()
    centers_hz = np.linspace(0, SR / 2, 513)
    for freq in (300.0, 1000.0, 3000.0):
        mel = extract_mel(_tone(freq))
        band = int(np.argmax(mel.mean(0)))
        # band center frequency from the filterbank peak
        peak_hz = centers_hz[np.argmax(fb[band])]
        assert abs(peak_hz - freq) / freq < 0.25, (freq, peak_hz)


def test_f0_detects_pitch():
    for freq in (110.0, 220.0, 440.0):
        f0 = extract_f0(_tone(freq))
        voiced = f0[f0 > 0]
        assert len(voiced) > 0.8 * len(f0)
        assert abs(np.median(voiced) - freq) / freq < 0.05, (
            freq, np.median(voiced))


def test_f0_silence_unvoiced():
    rng = np.random.RandomState(0)
    f0 = extract_f0(rng.randn(SR).astype(np.float32) * 1e-4)
    assert (f0 == 0).mean() > 0.5


def test_f0_to_coarse_range():
    f0 = np.array([0.0, 80.0, 200.0, 750.0, 900.0])
    c = f0_to_coarse(f0)
    assert c[0] == 1 and c[1] == 1 and c[3] == 255 and c[4] == 255
    assert 1 < c[2] < 255


def test_extract_mel_f0_lengths_match():
    mel, f0, f0c = extract_mel_f0(_tone(330.0, 0.7))
    assert len(mel) == len(f0) == len(f0c)
