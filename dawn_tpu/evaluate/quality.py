"""Video quality harness: FVD-style Frechet metrics + lip-sync proxy.

Round-1 gap (VERDICT item 6): the north-star requires FVD / lip-sync parity
against the released checkpoints, and the repo had the Frechet math
(evaluate/metrics.py, ported from PBnet/src/evaluate/action2motion/fid.py)
but no video feature extractor and no lip metric.

Feature extractor: the frozen LFG encoder (``compute_fea``, the same
256-channel bottleneck the diffusion model is conditioned on). With the
released LFG checkpoint loaded it is a strong talking-head feature space —
documented as the interim FVD proxy. The STANDARD FVD backbone now ships
too: ``dawn_tpu.evaluate.i3d`` (flax Kinetics-400 I3D) +
``dawn_tpu.weights.i3d_convert`` (torch-free converter for the public
pytorch-i3d weights, parity-tested in tests/test_i3d.py); pass
``--i3d-ckpt`` to scripts/eval_quality.py once the weights are fetched —
this image itself cannot fetch them (zero egress).

Lip-sync proxy: mouth-region L1 + SSIM between generated and ground-truth
frames, masked by the rasterized mouth-landmark bbox (the same rasterizer the
mouth loss uses, train/train_dm.py::generate_mouth_mask; reference mouth
masking: ..._init_cond_mouth_mask_6D.py:238).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from dawn_tpu.evaluate.metrics import frechet_distance


# ------------------------------------------------------------- features

import functools


@functools.lru_cache(maxsize=8)
def _fea_fn(generator):
    """Jitted per-frame feature extractor, cached per generator module so
    repeat metric calls in one process don't re-trace (variables are a jit
    ARGUMENT, not a closure, so one trace serves every checkpoint)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fea(variables, x):
        f = generator.apply(variables, x, method=type(generator).compute_fea)
        return jnp.concatenate([f.mean(axis=(1, 2)), f.std(axis=(1, 2))], -1)

    return fea


def lfg_frame_features(generator, variables, videos: np.ndarray,
                       batch: int = 64) -> np.ndarray:
    """Per-frame LFG-encoder features.

    videos: (N, T, H, W, 3) float32 in [0, 1]. Returns (N*T, 2*C): spatial
    mean ++ spatial std of the encoder bottleneck per frame.
    """
    import jax.numpy as jnp

    n, t = videos.shape[:2]
    frames = videos.reshape((n * t,) + videos.shape[2:])
    fea = _fea_fn(generator)

    out = []
    for i in range(0, len(frames), batch):
        out.append(np.asarray(fea(variables, jnp.asarray(frames[i: i + batch]))))
    return np.concatenate(out, axis=0)


def video_features(frame_feats: np.ndarray, n_videos: int) -> np.ndarray:
    """(N*T, D) frame features -> (N, 2D) per-video features
    (temporal mean ++ temporal std) — the FVD-style sample unit."""
    f = frame_feats.reshape(n_videos, -1, frame_feats.shape[-1])
    return np.concatenate([f.mean(axis=1), f.std(axis=1)], axis=-1)


def fvd_proxy(generator, variables, real: np.ndarray, fake: np.ndarray,
              per_video: bool = False) -> float:
    """Frechet distance between LFG-feature distributions of real and fake
    video sets (N, T, H, W, 3). per_video=True pools over time first (FVD
    sample = video); default treats frames as samples (FID-style, stable for
    small N)."""
    fr = lfg_frame_features(generator, variables, real)
    ff = lfg_frame_features(generator, variables, fake)
    if per_video:
        fr = video_features(fr, real.shape[0])
        ff = video_features(ff, fake.shape[0])
    return frechet_distance(fr, ff)


def _fvd_both(generator, variables, real, fake):
    """Frame- and video-level Frechet from ONE feature extraction."""
    fr = lfg_frame_features(generator, variables, real)
    ff = lfg_frame_features(generator, variables, fake)
    frames = frechet_distance(fr, ff)
    videos = frechet_distance(video_features(fr, real.shape[0]),
                              video_features(ff, fake.shape[0]))
    return frames, videos


# ------------------------------------------------------------ lip proxy

def mouth_mask_images(mouth_lmk: np.ndarray, img_size: int) -> np.ndarray:
    """(N, T, K, 2) pixel landmarks -> (N, T, H, W, 1) binary mouth-bbox
    masks at image resolution (train_dm.generate_mouth_mask at scale 1)."""
    from dawn_tpu.train.train_dm import generate_mouth_mask
    import jax.numpy as jnp
    return np.asarray(generate_mouth_mask(jnp.asarray(mouth_lmk), img_size,
                                          img_size))


def _ssim2d(a: np.ndarray, b: np.ndarray, c1=0.01 ** 2, c2=0.03 ** 2,
            win: int = 7) -> np.ndarray:
    """Per-pixel SSIM map over (..., H, W) grayscale in [0,1] with a uniform
    window (scipy-free separable box filter)."""
    def box(x):
        k = np.ones(win) / win
        x = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), -1, x)
        return np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"),
                                   -2, x)

    mu_a, mu_b = box(a), box(b)
    va = box(a * a) - mu_a ** 2
    vb = box(b * b) - mu_b ** 2
    cov = box(a * b) - mu_a * mu_b
    return ((2 * mu_a * mu_b + c1) * (2 * cov + c2)
            / ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2)))


def lip_sync_proxy(gen: np.ndarray, gt: np.ndarray,
                   mouth_lmk: Optional[np.ndarray] = None) -> Dict[str, float]:
    """Mouth-region L1 and SSIM between generated and GT videos.

    gen/gt: (N, T, H, W, 3) in [0, 1]. mouth_lmk: (N, T, K, 2) pixel coords
    (landmarks 48:67); when None the center-lower-third crop is used (the
    3DDFA-failure fallback region).
    """
    h, w = gt.shape[2], gt.shape[3]
    if mouth_lmk is not None:
        mask = mouth_mask_images(mouth_lmk, h)
    else:
        mask = np.zeros(gt.shape[:4] + (1,), np.float32)
        mask[:, :, int(h * 0.55): int(h * 0.85),
             int(w * 0.3): int(w * 0.7)] = 1.0
    denom = max(float(mask.sum() * 3), 1.0)
    l1 = float((np.abs(gen - gt) * mask).sum() / denom)
    gray_g = gen.mean(-1)
    gray_t = gt.mean(-1)
    smap = _ssim2d(gray_g, gray_t)
    ssim = float((smap * mask[..., 0]).sum() / max(float(mask.sum()), 1.0))
    return {"mouth_l1": l1, "mouth_ssim": ssim}


def _mouth_region_mask(shape4, mouth_lmk: Optional[np.ndarray]) -> np.ndarray:
    """(N, T, H, W, 1) mouth mask: landmark bbox when available, else the
    center-lower-third fallback crop (the 3DDFA-failure region)."""
    h, w = shape4[2], shape4[3]
    if mouth_lmk is not None:
        return mouth_mask_images(mouth_lmk, h)
    mask = np.zeros(tuple(shape4[:4]) + (1,), np.float32)
    mask[:, :, int(h * 0.55): int(h * 0.85), int(w * 0.3): int(w * 0.7)] = 1.0
    return mask


def av_sync_proxy(videos: np.ndarray, audio_feats: np.ndarray,
                  mouth_lmk: Optional[np.ndarray] = None,
                  max_offset: int = 8) -> Dict[str, float]:
    """Offset-sweep audio <-> mouth-motion correlation (VERDICT r3 #9).

    A checkpoint-free AV-sync signal stronger than mouth-SSIM: audio
    activity a_t = ||f_{t+1} - f_t||_2 over the per-frame audio features
    (HuBERT at 25 fps) should co-vary with mouth-region motion energy
    m_t = mean |I_{t+1} - I_t| over the mouth mask, and should co-vary BEST
    at offset 0 — shifted audio must score worse (sanity-tested in
    tests/test_quality.py). Reports the Pearson correlation at offset 0,
    the argmax offset over [-max_offset, max_offset] (a synced clip gives
    0; a constant lag shows up here), and the margin of the offset-0 score
    over the mean |offset| >= 3 score.

    videos: (N, T, H, W, 3) in [0, 1]; audio_feats: (N, T, D).
    """
    n, t = videos.shape[:2]
    mask = _mouth_region_mask(videos.shape, mouth_lmk)[:, 1:, ..., 0]
    dm = np.abs(np.diff(videos.mean(-1), axis=1))            # (N, T-1, H, W)
    m = ((dm * mask).sum((-1, -2))
         / np.maximum(mask.sum((-1, -2)), 1.0))              # (N, T-1)
    a = np.linalg.norm(np.diff(np.asarray(audio_feats, np.float32), axis=1),
                       axis=-1)                              # (N, T-1)

    def corr(x, y):
        x = x - x.mean()
        y = y - y.mean()
        d = np.sqrt((x * x).sum() * (y * y).sum())
        return float((x * y).sum() / d) if d > 0 else 0.0

    corrs = {}
    for off in range(-max_offset, max_offset + 1):
        vals = []
        for i in range(n):
            if off >= 0:              # audio leads video by `off` frames
                x, y = a[i, off:], m[i, : t - 1 - off]
            else:
                x, y = a[i, : t - 1 + off], m[i, -off:]
            if x.shape[0] >= 4:
                vals.append(corr(x, y))
        corrs[off] = float(np.mean(vals)) if vals else 0.0
    # ties break toward |offset| 0: degenerate/flat correlations report a
    # 0 offset, not whichever extreme happens to iterate first (ADVICE r4)
    best = max(corrs, key=lambda d: (corrs[d], -abs(d)))
    far = [v for d, v in corrs.items() if abs(d) >= 3]
    return {"av_corr": corrs[0], "av_offset": int(best),
            "av_margin": corrs[0] - float(np.mean(far)) if far else 0.0}


def evaluate_quality(generator, variables, real: np.ndarray, fake: np.ndarray,
                     mouth_lmk: Optional[np.ndarray] = None,
                     audio_feats: Optional[np.ndarray] = None) -> Dict[str, float]:
    """The full quality report for a set of (real, generated) videos."""
    if real.shape[0] >= 2:
        frames_fd, videos_fd = _fvd_both(generator, variables, real, fake)
    else:
        frames_fd, videos_fd = fvd_proxy(generator, variables, real, fake), None
    out = {
        "fvd_lfg_frames": frames_fd,
        "l1": float(np.abs(fake - real).mean()),
    }
    if videos_fd is not None:
        out["fvd_lfg_videos"] = videos_fd
    out.update(lip_sync_proxy(fake, real, mouth_lmk))
    if audio_feats is not None:
        out.update(av_sync_proxy(fake, audio_feats, mouth_lmk))
    return out


def evaluate_generated_batch(generator, variables, videos: np.ndarray,
                             labels: np.ndarray, source_images: np.ndarray,
                             real_videos: Optional[np.ndarray] = None,
                             mouth_lmk: Optional[np.ndarray] = None,
                             audio_feats: Optional[np.ndarray] = None) -> Dict:
    """One-command metrics for an OOD generation batch (scripts/ood_test.py
    --metrics): Frechet + diversity + multimodality + accuracy + lip-sync,
    per identity and aggregate.

    videos: (N, T, H, W, 3) generated clips in [0, 1]; labels: (N,) identity
    index of each clip (>= 2 clips per identity enables multimodality);
    source_images: (num_identities, H, W, 3); real_videos: optional GT clips
    aligned with ``videos`` for the Frechet reference set and the mouth
    proxy (without GT, the reference set is the source-image features —
    golden-output pattern: LFG/test_flowautoenc_hdtf_video.py:57).
    """
    from dawn_tpu.evaluate.metrics import (diversity_multimodality,
                                           nearest_centroid_probs,
                                           recognition_accuracy)

    labels = np.asarray(labels, np.int64)
    num_ids = int(labels.max()) + 1
    frame_feats = lfg_frame_features(generator, variables, videos)
    vid_feats = video_features(frame_feats, videos.shape[0])

    src_feats = lfg_frame_features(generator, variables,
                                   source_images[:, None])

    report: Dict = {"per_identity": {}}
    t = videos.shape[1]
    frame_labels = np.repeat(labels, t)

    if real_videos is not None:
        real_feats = lfg_frame_features(generator, variables, real_videos)
        report["frechet_frames_vs_real"] = frechet_distance(
            real_feats, frame_feats)
        report.update({f"lip_{k}": v for k, v in
                       lip_sync_proxy(videos, real_videos, mouth_lmk).items()})
    else:
        report["lip_note"] = ("no GT videos supplied - mouth proxy needs "
                              "--real-dir")
    if audio_feats is not None:
        # AV-sync needs no GT video — it correlates the generated mouth
        # motion against the driving audio features directly
        report.update({f"sync_{k}": v for k, v in
                       av_sync_proxy(videos, audio_feats, mouth_lmk).items()})

    div, mm = diversity_multimodality(
        vid_feats, labels, num_ids,
        multimodality_times=min(20, max(1, np.bincount(labels).min() - 1) * 4))
    report["diversity"] = div
    report["multimodality"] = mm

    # identity-recognition accuracy: source-image features are the
    # centroids; a generated frame should land nearest its own identity
    probs = nearest_centroid_probs(src_feats, np.arange(num_ids),
                                   frame_feats, num_ids)
    acc, confusion = recognition_accuracy(probs, frame_labels)
    report["identity_accuracy"] = acc
    report["identity_confusion"] = confusion.tolist()

    for c in range(num_ids):
        sel = labels == c
        rep_c: Dict = {
            "n_clips": int(sel.sum()),
            "frechet_frames_vs_source": frechet_distance(
                np.repeat(src_feats[c: c + 1], 8, axis=0),
                frame_feats[np.repeat(sel, t)]) if sel.any() else None,
        }
        if real_videos is not None and sel.any():
            rep_c.update({f"lip_{k}": v for k, v in lip_sync_proxy(
                videos[sel], real_videos[sel],
                None if mouth_lmk is None else mouth_lmk[sel]).items()})
        if audio_feats is not None and sel.any():
            rep_c.update({f"sync_{k}": v for k, v in av_sync_proxy(
                videos[sel], audio_feats[sel],
                None if mouth_lmk is None else mouth_lmk[sel]).items()})
        report["per_identity"][int(c)] = rep_c
    return report
