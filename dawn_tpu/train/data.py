"""Training datasets: chunked-npy HDTF readers, TPU-native.

Capability parity with DM_3/datasets_hdtf_wpose_lmk_block_lmk.py (25-frame
chunk_%04d.npy blocks per modality per video, length_dict.pkl, the held-out
41-video test split + bad-video blacklist :60-84), the _rand variant's mouth
landmarks, and PBnet/src/datasets/datasets_hdtf_pos_chunk_norm_eye_fast.py
(in-RAM pose/eye cache + min/max normalization).

TPU redesign: instead of torch DataLoader worker processes, block reads go
through the native threaded prefetcher (dawn_tpu.runtime) when built, and
batches are assembled host-side into fixed-shape numpy arrays (static frame
buckets, so every train step hits the jit cache).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

BLOCK = 25

# Held-out HDTF evaluation split (datasets_..._lmk.py:73-81) and bad videos
# (:83) — the fixture every reference dataset class hardcodes.
HDTF_TEST_SPLIT = [
    "RD_Radio14_000", "RD_Radio30_000", "RD_Radio47_000", "RD_Radio56_000",
    "WDA_AmyKlobuchar1_001", "WDA_BarbaraLee0_000", "WDA_BobCasey0_000",
    "WDA_CatherineCortezMasto_000", "WDA_DebbieDingell1_000",
    "WDA_DonaldMcEachin_000", "WDA_EricSwalwell_000", "WDA_HenryWaxman_000",
    "WDA_JanSchakowsky1_000", "WDA_JoeDonnelly_000", "WDA_JohnSarbanes1_000",
    "WDA_JoeNeguse_001", "WDA_KatieHill_000", "WDA_LucyMcBath_000",
    "WDA_MazieHirono0_000", "WDA_NancyPelosi1_000", "WDA_PattyMurray0_000",
    "WDA_RaulRuiz_000", "WDA_SeanPatrickMaloney_000", "WDA_TammyBaldwin0_000",
    "WDA_TerriSewell0_000", "WDA_TomCarper_000", "WDA_WhipJimClyburn_000",
    "WRA_AdamKinzinger0_000", "WRA_AnnWagner_000", "WRA_BobCorker_000",
    "WRA_CandiceMiller0_000", "WRA_CathyMcMorrisRodgers2_000",
    "WRA_CoryGardner1_000", "WRA_DebFischer1_000", "WRA_DianeBlack1_000",
    "WRA_ErikPaulsen_000", "WRA_GeorgeLeMieux_000", "WRA_JebHensarling0_001",
    "WRA_JoeHeck1_000", "WRA_JohnKasich1_001", "WRA_MarcoRubio_000",
]
HDTF_BAD_VIDEOS = ["WDA_DanKildee_000", "WDA_PatrickLeahy1_000",
                   "WRA_KristiNoem2_000", "RD_Radio39_000"]


def _block_paths(video_dir: str, start: int, end: int):
    """chunk paths + intra-block offsets for frames [start, end). The last
    block index comes from end-1: a range ending exactly on a block boundary
    (e.g. [0, 25)) must not touch the next chunk, which may not exist."""
    assert end > start, (start, end)
    b0, b1 = start // BLOCK, (end - 1) // BLOCK
    p0, p1 = start - b0 * BLOCK, end - b1 * BLOCK
    paths = [os.path.join(video_dir, f"chunk_{i:04d}.npy")
             for i in range(b0, b1 + 1)]
    return paths, p0, p1


def _assemble_blocks(arrs, p0: int, p1: int) -> np.ndarray:
    if len(arrs) == 1:
        return arrs[0][p0:p1]
    parts = [arrs[0][p0:]] + list(arrs[1:-1]) + [arrs[-1][:p1]]
    return np.concatenate(parts)


def read_block_range(video_dir: str, start: int, end: int,
                     reader: "Optional[NativeChunkReader]" = None) -> np.ndarray:
    """Frames [start, end) across chunk_%04d.npy blocks (get_block_data,
    datasets_..._lmk.py:149-181). With ``reader`` the chunk files are read
    by the native threaded prefetcher (parallel I/O); default is np.load."""
    paths, p0, p1 = _block_paths(video_dir, start, end)
    arrs = reader.read_many(paths) if reader is not None \
        else [np.load(p) for p in paths]
    return _assemble_blocks(arrs, p0, p1)


class NativeChunkReader:
    """Parallel .npy reads through the C++ NpyPrefetcher
    (runtime/src/npy_prefetch.cpp) — the torch-DataLoader-workers
    replacement. ``read_many`` submits every path at once so the reader
    threads overlap the file I/O, then reassembles results in order."""

    def __init__(self, n_threads: int = 4, queue_cap: int = 32):
        from dawn_tpu.runtime.native import NpyPrefetcher
        self._pf = NpyPrefetcher(n_threads, queue_cap)

    @staticmethod
    def _header(path):
        """npy dtype/shape — the C++ side returns HEADER-STRIPPED payload
        bytes (npy_prefetch.cpp::npy_payload_offset), so the tiny header is
        read here while the bulk payload reads run on the pool threads."""
        with open(path, "rb") as f:
            ver = np.lib.format.read_magic(f)
            if ver == (1, 0):
                return np.lib.format.read_array_header_1_0(f)
            return np.lib.format.read_array_header_2_0(f)

    def read_many(self, paths) -> List[np.ndarray]:
        metas = [self._header(p) for p in paths]
        for i, p in enumerate(paths):
            self._pf.submit(p, i)
        out: List[Optional[np.ndarray]] = [None] * len(paths)
        cap = max(os.path.getsize(p) for p in paths)
        for _ in paths:
            buf, tag = self._pf.next(cap)
            shape, fortran, dtype = metas[tag]
            arr = np.frombuffer(buf.tobytes(), dtype=dtype)
            out[tag] = arr.reshape(shape, order="F" if fortran else "C")
        return out  # type: ignore[return-value]

    def close(self) -> None:
        self._pf.close()


def _pad_frames(a: np.ndarray, n: int) -> np.ndarray:
    """Edge-pad the leading (time) axis of ``a`` up to n frames."""
    if a.shape[0] >= n:
        return a
    pad = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad, mode="edge")


class HDTFVideoDataset:
    """DM training dataset over per-modality chunk dirs.

    Layout: {frames,hubert,pose,eye,lmk}_dir each containing one subdir per
    video id full of 25-frame chunk_%04d.npy blocks; length_dict.pkl maps
    video id -> total frames.
    """

    def __init__(self, frames_dir: str, hubert_dir: str, pose_dir: str,
                 eye_dir: str, length_dict_path: str,
                 lmk_dir: Optional[str] = None, mode: str = "train",
                 num_frames: int = 20, seed: int = 0,
                 start_stride: Optional[int] = None):
        with open(length_dict_path, "rb") as f:
            self.len_dict = pickle.load(f)
        self.dirs = dict(frames=frames_dir, hubert=hubert_dir, pose=pose_dir,
                         eye=eye_dir, lmk=lmk_dir)
        self.mode = mode
        self.num_frames = num_frames
        # start_stride quantizes clip starts to a grid so the same (video,
        # start) clips recur across epochs — the teacher-cache mode's key
        # space (PERF_TRAIN.md). None = the reference's uniform random start
        # (datasets_..._lmk.py:141).
        self.start_stride = start_stride
        self.rng = np.random.RandomState(seed)
        if mode == "train":
            self.videos = [v for v in sorted(os.listdir(frames_dir))
                           if v not in HDTF_TEST_SPLIT and v not in HDTF_BAD_VIDEOS]
        else:
            self.videos = list(HDTF_TEST_SPLIT)

    def __len__(self) -> int:
        return len(self.videos)

    def sample(self, idx: int,
               reader: Optional[NativeChunkReader] = None) -> Dict[str, np.ndarray]:
        name = self.videos[idx]
        total = self.len_dict[name]
        nf = min(self.num_frames, total)
        if total <= nf:
            start = 0
        elif self.start_stride:
            n_starts = (total - nf) // self.start_stride + 1
            start = int(self.rng.randint(n_starts)) * self.start_stride
        else:
            start = int(self.rng.randint(total - nf))
        end = start + nf

        def block(kind):
            return read_block_range(os.path.join(self.dirs[kind], name),
                                    start, end, reader)

        out = {
            # video keeps its STORED dtype (uint8 blocks stay uint8): the
            # loss casts to f32/255 on DEVICE (train_dm.prepare_inputs), so
            # uint8 frames cross host->HBM at 1/4 the bytes
            "video": block("frames"),                          # (T, H, W, 3) 0-255
            "hubert": block("hubert").astype(np.float32),      # (T, 1024)
            "pose": block("pose").astype(np.float32),          # (T, 7)
            "blink": block("eye").astype(np.float32)[:, :2],   # (T, 2)
            "name": name,
            "start": start,
        }
        if self.dirs["lmk"]:
            lmk = block("lmk").astype(np.float32)              # (T, 68, 2)
            out["mouth_lmk"] = lmk[:, 48:67]                   # mouth ring (:239)
            # frame-0 face bbox for the location mask
            out["bbox"] = np.array([lmk[0, :, 0].min(), lmk[0, :, 0].max(),
                                    lmk[0, :, 1].min(), lmk[0, :, 1].max(),
                                    out["video"].shape[1], out["video"].shape[2]],
                                   np.float32)
        else:
            h, w = out["video"].shape[1:3]
            out["bbox"] = np.array([0, w - 1, 0, h - 1, h, w], np.float32)
        return out

    def batches(self, batch_size: int, steps: int,
                reader: Optional[NativeChunkReader] = None,
                with_meta: bool = False,
                ) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite shuffled fixed-shape batches. Videos shorter than
        num_frames are edge-padded to the batch shape (same padding the
        inference pipeline uses for length buckets) — np.stack over ragged
        samples would crash mid-training otherwise.

        with_meta=True yields (batch, [(name, start), ...]) — the clip
        identities the teacher cache keys on."""
        for _ in range(steps):
            idxs = self.rng.randint(len(self.videos), size=batch_size)
            samples = [self.sample(int(i), reader) for i in idxs]
            batch = {}
            for k in samples[0]:
                if k in ("name", "start"):
                    continue
                arrs = [_pad_frames(s[k], self.num_frames)
                        if s[k].ndim and k != "bbox" else s[k]
                        for s in samples]
                batch[k] = np.stack(arrs)
            if with_meta:
                yield batch, [(s["name"], s["start"]) for s in samples]
            else:
                yield batch

    def batches_prefetched(self, batch_size: int, steps: int,
                           n_threads: int = 4, depth: int = 2,
                           with_meta: bool = False,
                           transform=None,
                           ) -> Iterator[Dict[str, np.ndarray]]:
        """Overlapped input pipeline (VERDICT r4 #7): a host thread assembles
        batches — chunk files read in parallel by the C++ NpyPrefetcher —
        into a bounded queue while the device runs the current step. The
        depth-2 queue is the reference CudaDataLoader's queue_size
        (PBnet/src/utils/utils.py:32); batch CONTENT is identical to
        :meth:`batches` (same self.rng stream, same assembly).

        ``transform(batch) -> batch`` runs ON THE WORKER THREAD — pass the
        host->device put here (jnp.asarray / device_put) so the transfer
        itself overlaps the running step (the CudaDataLoader's
        cuda-stream-prefetch equivalent)."""
        import queue
        import threading

        reader = NativeChunkReader(n_threads)
        q: "queue.Queue" = queue.Queue(maxsize=depth)

        def worker():
            try:
                for b in self.batches(batch_size, steps, reader=reader,
                                      with_meta=with_meta):
                    if transform is not None:
                        b = ((transform(b[0]), b[1]) if with_meta
                             else transform(b))
                    q.put(b)
                q.put(None)
            except BaseException as e:  # surfaced on the consumer side
                q.put(e)
            finally:
                reader.close()

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item


class TeacherCache:
    """Disk cache of frozen-LFG teacher outputs, keyed (video id, clip start).

    The DM train loss consumes raw frames ONLY through the frozen teacher
    (DMTrainer.loss_fn), so the three teacher tensors are precomputed once
    per clip and reused every epoch — the TPU-first replacement for the
    reference's per-step teacher recompute (mouth_mask_6D.py:300-316);
    PERF_TRAIN.md has the step-time attribution. Use with
    HDTFVideoDataset(start_stride=...) so clip starts recur across epochs.

    Entries are one .npz per clip (~1.3 MB f32 at 20f/128²: grid/conf at
    latent res + the (32,32,256) ref feature). ``dtype=np.float16`` halves
    that at ~5e-4 absolute quantization on [-1,1] tensors.
    """

    def __init__(self, root: str, dtype=np.float32):
        os.makedirs(root, exist_ok=True)
        self.root = root
        self.dtype = dtype
        self.hits = 0
        self.misses = 0

    def _path(self, name: str, start: int) -> str:
        return os.path.join(self.root, f"{name}__{start:06d}.npz")

    def get(self, name: str, start: int) -> Optional[Dict[str, np.ndarray]]:
        p = self._path(name, start)
        if not os.path.exists(p):
            return None
        with np.load(p) as z:
            return {k: z[k].astype(np.float32) for k in z.files}

    def put(self, name: str, start: int, entry: Dict[str, np.ndarray]) -> None:
        tmp = self._path(name, start) + ".tmp"
        # write-then-rename: a concurrent reader never sees a torn file
        with open(tmp, "wb") as f:
            np.savez(f, **{k: np.asarray(v).astype(self.dtype)
                           for k, v in entry.items()})
        os.replace(tmp, self._path(name, start))

    def convert_batch(self, batch: Dict[str, np.ndarray], meta,
                      compute_fn) -> Dict[str, np.ndarray]:
        """Raw batch -> cached-teacher batch (video replaced by the teacher
        keys). ``compute_fn(video_255) -> {key: (B, ...)}`` runs the frozen
        teacher on device for batches with any cache miss; every miss is
        then stored, so epoch 2+ is all hits."""
        entries = [self.get(n, s) for n, s in meta]
        if any(e is None for e in entries):
            teacher = {k: np.asarray(v)
                       for k, v in compute_fn(batch["video"]).items()}
            for i, (n, s) in enumerate(meta):
                if entries[i] is None:
                    self.misses += 1
                    self.put(n, s, {k: v[i] for k, v in teacher.items()})
                else:
                    self.hits += 1
        else:
            self.hits += len(entries)
            teacher = {k: np.stack([e[k] for e in entries])
                       for k in entries[0]}
        out = {k: v for k, v in batch.items() if k != "video"}
        out.update(teacher)
        return out


# PBnet pose normalization constants (datasets_..._eye_fast.py:62-65)
PBNET_POSE_MAX = np.array([90, 90, 90, 1, 720, 1080], np.float32)
PBNET_POSE_MIN = np.array([-90, -90, -90, 0, 0, 0], np.float32)


class PBnetPoseDataset:
    """PBnet training dataset: in-RAM cache of pose/eye/hubert npys
    (datasets_hdtf_pos_chunk_norm_eye_fast.py:100-115, 240-263)."""

    def __init__(self, hubert_dir: str, pose_dir: str, eye_dir: str,
                 length_dict_path: str, mode: str = "train",
                 num_frames: int = 100, seed: int = 0):
        with open(length_dict_path, "rb") as f:
            self.len_dict = pickle.load(f)
        self.num_frames = num_frames
        self.rng = np.random.RandomState(seed)
        names = (sorted(set(os.listdir(pose_dir)) - set(HDTF_TEST_SPLIT)
                        - set(HDTF_BAD_VIDEOS))
                 if mode == "train" else list(HDTF_TEST_SPLIT))
        self.cache = {}
        for name in names:
            try:
                self.cache[name] = {
                    "hubert": np.concatenate([
                        np.load(os.path.join(hubert_dir, name, f))
                        for f in sorted(os.listdir(os.path.join(hubert_dir, name)))]),
                    "pose": np.concatenate([
                        np.load(os.path.join(pose_dir, name, f))
                        for f in sorted(os.listdir(os.path.join(pose_dir, name)))]),
                    "eye": np.concatenate([
                        np.load(os.path.join(eye_dir, name, f))
                        for f in sorted(os.listdir(os.path.join(eye_dir, name)))]),
                }
            except Exception:
                continue
        self.names = list(self.cache)

    @staticmethod
    def normalize_pose(pose: np.ndarray) -> np.ndarray:
        return (pose[..., :6] - PBNET_POSE_MIN) / (PBNET_POSE_MAX - PBNET_POSE_MIN)

    def sample(self, idx: int) -> Dict[str, np.ndarray]:
        name = self.names[idx]
        d = self.cache[name]
        total = min(len(d["hubert"]), len(d["pose"]), len(d["eye"]))
        nf = min(self.num_frames, total)
        start = 0 if total <= nf else int(self.rng.randint(total - nf))
        sl = slice(start, start + nf)
        return {
            "hubert": d["hubert"][sl].astype(np.float32),
            "pose": self.normalize_pose(d["pose"][sl].astype(np.float32)),
            "eye": d["eye"][sl, :2].astype(np.float32),
            "name": name,
        }

    def batches(self, batch_size: int, steps: int):
        for _ in range(steps):
            idxs = self.rng.randint(len(self.names), size=batch_size)
            samples = [self.sample(int(i)) for i in idxs]
            yield {k: np.stack([_pad_frames(s[k], self.num_frames)
                                for s in samples])
                   for k in samples[0] if k != "name"}


class FramesDataset:
    """Generic video-folder dataset for LFG training
    (LFG/frames_dataset.py): root contains one entry per video — a directory
    of frame images (png/jpg), a chunked-npy directory (chunk_*.npy of 25
    frames), or an .mp4 (read via cv2). Train mode returns a random
    (source, driving) frame pair (:135-167); test mode the full video.
    """

    def __init__(self, root_dir: str, mode: str = "train",
                 image_size: int = 256, augment=None, seed: int = 0,
                 id_sampling: bool = False):
        self.root = root_dir
        self.mode = mode
        self.image_size = image_size
        self.augment = augment
        self.rng = np.random.RandomState(seed)
        self.videos = sorted(os.listdir(root_dir))
        if id_sampling:
            # person-id sampling: group videos by the prefix before '#'
            ids = sorted({v.split("#")[0] for v in self.videos})
            self._by_id = {i: [v for v in self.videos if v.split("#")[0] == i]
                           for i in ids}
            self.videos = ids
        self.id_sampling = id_sampling

    def __len__(self):
        return len(self.videos)

    def _read_video(self, name: str) -> np.ndarray:
        """(T, H, W, 3) float32 [0,1]."""
        import glob as _glob
        path = os.path.join(self.root, name)
        if os.path.isdir(path):
            chunks = sorted(_glob.glob(os.path.join(path, "chunk_*.npy")))
            if chunks:
                vid = np.concatenate([np.load(c) for c in chunks])
                return vid.astype(np.float32) / 255.0
            import cv2
            frames = []
            for f in sorted(os.listdir(path)):
                if f.lower().endswith((".png", ".jpg", ".jpeg")):
                    img = cv2.cvtColor(cv2.imread(os.path.join(path, f)),
                                       cv2.COLOR_BGR2RGB)
                    frames.append(img)
            return np.stack(frames).astype(np.float32) / 255.0
        if path.endswith((".mp4", ".gif", ".avi")):
            import cv2
            cap = cv2.VideoCapture(path)
            frames = []
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            cap.release()
            return np.stack(frames).astype(np.float32) / 255.0
        if path.endswith(".npy"):
            return np.load(path).astype(np.float32) / 255.0
        raise ValueError(f"unsupported video entry {path}")

    def _resize(self, frame: np.ndarray) -> np.ndarray:
        s = self.image_size
        if frame.shape[0] == s and frame.shape[1] == s:
            return frame
        import cv2
        return cv2.resize(frame, (s, s), interpolation=cv2.INTER_AREA)

    def sample(self, idx: int):
        name = self.videos[idx]
        if self.id_sampling:
            name = self._by_id[name][self.rng.randint(len(self._by_id[name]))]
        vid = self._read_video(name)
        t = len(vid)
        if self.mode == "train":
            i, j = sorted(self.rng.choice(t, size=2, replace=True))
            src, drv = self._resize(vid[i]), self._resize(vid[j])
            if self.augment is not None:
                src, drv = self.augment(self.rng, src, drv)
            return {"source": src, "driving": drv, "name": name}
        return {"video": np.stack([self._resize(f) for f in vid]),
                "name": name}

    def batches(self, batch_size: int, steps: int):
        for _ in range(steps):
            idxs = self.rng.randint(len(self.videos), size=batch_size)
            samples = [self.sample(int(i)) for i in idxs]
            yield {k: np.stack([s[k] for s in samples])
                   for k in ("source", "driving")}


class DatasetRepeater:
    """Repeats a dataset num_repeats times per epoch
    (frames_dataset.py:178-192)."""

    def __init__(self, dataset, num_repeats: int = 100):
        self.dataset = dataset
        self.num_repeats = num_repeats

    def __len__(self):
        return self.num_repeats * len(self.dataset)

    def sample(self, idx: int):
        return self.dataset.sample(idx % len(self.dataset))


class PairedDataset:
    """(source video, driving video) pairs for animation demos
    (frames_dataset.py:194-233): explicit pairs list or the index
    cross-product."""

    def __init__(self, dataset: "FramesDataset", pairs_list=None,
                 number_of_pairs: int = 20, seed: int = 0):
        self.dataset = dataset
        if pairs_list:
            names = {v: i for i, v in enumerate(dataset.videos)}
            self.pairs = [(names[a], names[b]) for a, b in pairs_list]
        else:
            rng = np.random.RandomState(seed)
            n = len(dataset)
            self.pairs = [(int(rng.randint(n)), int(rng.randint(n)))
                          for _ in range(number_of_pairs)]

    def __len__(self):
        return len(self.pairs)

    def sample(self, idx: int):
        i, j = self.pairs[idx]
        mode = self.dataset.mode
        self.dataset.mode = "test"
        try:
            a = self.dataset.sample(i)
            b = self.dataset.sample(j)
        finally:
            self.dataset.mode = mode
        return {"source_video": a["video"], "driving_video": b["video"],
                "source_name": a["name"], "driving_name": b["name"]}


# ------------------------------------------------------- padded collation

def lengths_to_mask(lengths: np.ndarray, max_len: int = None) -> np.ndarray:
    """(B,) lengths -> (B, T) bool mask (tensors_eye.py:4-8)."""
    lengths = np.asarray(lengths)
    t = int(max_len if max_len is not None else lengths.max())
    return np.arange(t)[None, :] < lengths[:, None]


def collate_padded(samples, keys=("x", "hubert")):
    """Zero-pad variable-length (T_i, D) sequences to the batch max and
    build the validity mask (tensors_eye.py:10-44 collate semantics).

    samples: list of dicts with (T_i, D) arrays under ``keys``.
    Returns {key: (B, T, D)}, plus 'mask' (B, T) and 'lengths' (B,).
    """
    lengths = np.asarray([len(s[keys[0]]) for s in samples])
    t = int(lengths.max())
    out = {}
    for k in keys:
        d = samples[0][k].shape[-1]
        canvas = np.zeros((len(samples), t, d), samples[0][k].dtype)
        for i, s in enumerate(samples):
            canvas[i, : len(s[k])] = s[k]
        out[k] = canvas
    out["mask"] = lengths_to_mask(lengths, t)
    out["lengths"] = lengths
    if "name" in samples[0]:
        out["videoname"] = [s["name"] for s in samples]
    return out
