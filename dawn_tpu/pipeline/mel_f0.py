"""Mel-spectrogram + F0 extraction — the alternative audio features.

Capability parity with hubert_extract/data_gen/process_lrs3/
process_audio_mel_f0.py: 16 kHz wav -> log10-mel with the reference's EXACT
parameters (fft 512, hop 320, win 512 hann, center=False, 80 Slaney-scale mel
bins, fmin 80, fmax 7600, eps 1e-6 — :23-56) and F0 (80-750 Hz, hop 320,
:58-75) with NATSpeech's f0_to_coarse bucketing. Parity is tested by driving
the reference extract_mel_from_fname through a numpy librosa shim
(tests/test_audio_features.py).

Pure numpy: the reference's librosa/parselmouth are not in this image. The
mel path reproduces librosa.stft(center=False) + librosa.filters.mel (Slaney
scale + slaney norm) exactly; F0 uses a windowed-autocorrelation tracker in
place of Praat's to_pitch_ac (same hop/bounds; DEVIATIONS.md) — the coarse
buckets match since f0_to_coarse only sees the Hz values.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


# ------------------------------------------------------------------ mel

def _hz_to_mel_slaney(f):
    f = np.asarray(f, np.float64)
    lin = f / 200.0 * 3.0
    log_region = f >= 1000.0
    return np.where(log_region,
                    15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / np.log(6.4) * 27.0,
                    lin)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, np.float64)
    lin = m * 200.0 / 3.0
    log_region = m >= 15.0
    return np.where(log_region, 1000.0 * np.exp(np.log(6.4) / 27.0 * (m - 15.0)),
                    lin)


def mel_filterbank(sr: int = 16000, n_fft: int = 512, n_mels: int = 80,
                   fmin: float = 80.0, fmax: float = 7600.0) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular filters
    (librosa.filters.mel defaults). Returns (n_mels, n_fft//2+1)."""
    fft_freqs = np.linspace(0, sr / 2.0, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax),
                          n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)
    fb = np.zeros((n_mels, len(fft_freqs)))
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        fb[i] = np.maximum(0, np.minimum(lower, upper))
    # slaney norm: scale by 2 / bandwidth
    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    return (fb * enorm[:, None]).astype(np.float32)


def stft_mag(wav: np.ndarray, n_fft: int = 512, hop: int = 320,
             win_length: int = 512, center: bool = False) -> np.ndarray:
    """|STFT| with a periodic hann window (librosa.stft semantics). The
    reference calls librosa.stft(center=False) (process_audio_mel_f0.py:39-41)
    so no padding by default. Returns (frames, n_fft//2+1)."""
    x = wav.astype(np.float64)
    if center:
        x = np.pad(x, (n_fft // 2, n_fft // 2), mode="reflect")
    win = np.hanning(win_length + 1)[:-1]          # periodic hann
    if win_length < n_fft:
        win = np.pad(win, ((n_fft - win_length) // 2,) * 2)
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * win[None, :]
    return np.abs(np.fft.rfft(frames, n=n_fft, axis=1)).astype(np.float32)


def extract_mel(wav: np.ndarray, sr: int = 16000, n_fft: int = 512,
                hop: int = 320, win_length: int = 512, n_mels: int = 80,
                fmin: float = 80.0, fmax: float = 7600.0,
                eps: float = 1e-6) -> np.ndarray:
    """16 kHz wav -> (T, n_mels) log10 mel (process_audio_mel_f0.py:23-56)."""
    spc = stft_mag(wav, n_fft, hop, win_length, center=False)  # (T, bins)
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)     # (mels, bins)
    mel = spc @ fb.T
    return np.log10(np.maximum(eps, mel)).astype(np.float32)


# ------------------------------------------------------------------- f0

def extract_f0(wav: np.ndarray, sr: int = 16000, hop: int = 320,
               f0_min: float = 80.0, f0_max: float = 750.0,
               frame_length: int = 512,
               voicing_threshold: float = 0.3) -> np.ndarray:
    """Frame-wise F0 via normalized autocorrelation (the Praat to_pitch_ac
    replacement; same hop and 80-750 Hz search band,
    process_audio_mel_f0.py:58-75). Unvoiced frames -> 0."""
    lag_min = int(sr / f0_max)
    lag_max = int(sr / f0_min)
    pad = frame_length // 2
    x = np.pad(wav.astype(np.float64), (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - frame_length) // hop
    idx = np.arange(frame_length)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx]
    frames = frames - frames.mean(axis=1, keepdims=True)
    win = np.hanning(frame_length)
    fw = frames * win
    # autocorrelation via FFT, normalized by the window autocorrelation (Praat)
    nfft = int(2 ** np.ceil(np.log2(2 * frame_length)))
    spec = np.fft.rfft(fw, nfft, axis=1)
    ac = np.fft.irfft(np.abs(spec) ** 2, nfft, axis=1)[:, : lag_max + 1]
    wac = np.fft.irfft(np.abs(np.fft.rfft(win, nfft)) ** 2, nfft)[: lag_max + 1]
    ac = ac / np.maximum(wac[None, :], 1e-10)
    r0 = np.maximum(ac[:, :1], 1e-10)
    r = ac / r0
    band = r[:, lag_min: lag_max + 1]
    # octave cost favoring higher candidates (shorter lags) — Praat's fix for
    # subharmonic lag maxima tying with the true period
    lags = np.arange(lag_min, lag_max + 1)
    octave_cost = 0.05 * np.log2(lags / lag_min)
    best = np.argmax(band - octave_cost[None, :], axis=1)
    strength = band[np.arange(n_frames), best]
    f0 = sr / (best + lag_min).astype(np.float64)
    f0 = np.where(strength > voicing_threshold, f0, 0.0)
    return f0.astype(np.float32)


def f0_to_coarse(f0: np.ndarray, f0_bin: int = 256, f0_min: float = 80.0,
                 f0_max: float = 750.0) -> np.ndarray:
    """NATSpeech pitch bucketing (utils/commons/pitch_utils.py): mel-scale
    quantization into [1, f0_bin-1]; 0 Hz (unvoiced) -> bucket 1."""
    f0_mel = 1127.0 * np.log(1.0 + np.asarray(f0, np.float64) / 700.0)
    mel_min = 1127.0 * np.log(1.0 + f0_min / 700.0)
    mel_max = 1127.0 * np.log(1.0 + f0_max / 700.0)
    f0_mel = np.where(f0_mel > 0,
                      (f0_mel - mel_min) * (f0_bin - 2) / (mel_max - mel_min) + 1,
                      f0_mel)
    f0_mel = np.clip(f0_mel, 1, f0_bin - 1)
    return np.rint(f0_mel).astype(np.int64)


def extract_mel_f0(wav: np.ndarray, sr: int = 16000
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mel (T,80), f0 (T,), f0_coarse (T,)) with f0 length-matched to mel
    (process_audio_mel_f0.py:58-75)."""
    mel = extract_mel(wav, sr)
    f0 = extract_f0(wav, sr)
    if len(f0) < len(mel):
        f0 = np.concatenate([f0, np.full(len(mel) - len(f0), f0[-1])])
    f0 = f0[: len(mel)].astype(np.float32)
    return mel, f0, f0_to_coarse(f0)
