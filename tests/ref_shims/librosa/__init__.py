"""Minimal numpy librosa shim for driving the reference's
process_audio_mel_f0.py in tests (the image has no librosa).

Implements only what extract_mel_from_fname touches: ``librosa.stft``
(center=False path), ``librosa.filters.mel`` (Slaney scale, slaney norm —
the librosa defaults), and ``librosa.core.load`` (unused for ndarray input).
Written independently from dawn_tpu.pipeline.mel_f0 (different structure, and
the STFT here is cross-checked against torch.stft in the test) so a
parameterization mistake on either side fails the parity test.
"""

import numpy as np

from . import core, filters  # noqa: F401


def stft(y, n_fft=2048, hop_length=None, win_length=None, window="hann",
         center=True, pad_mode="constant"):
    """Complex STFT, (1 + n_fft//2, n_frames) like librosa."""
    assert window == "hann"
    if win_length is None:
        win_length = n_fft
    if hop_length is None:
        hop_length = win_length // 4
    y = np.asarray(y, np.float64)
    if center:
        y = np.pad(y, (n_fft // 2, n_fft // 2), mode="reflect")
    # periodic hann, centered in an n_fft frame
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win_length) / win_length)
    lpad = (n_fft - win_length) // 2
    w = np.pad(w, (lpad, n_fft - win_length - lpad))
    n_frames = 1 + (len(y) - n_fft) // hop_length
    out = np.empty((n_fft // 2 + 1, n_frames), np.complex128)
    for t in range(n_frames):
        seg = y[t * hop_length: t * hop_length + n_fft] * w
        out[:, t] = np.fft.rfft(seg)
    return out
