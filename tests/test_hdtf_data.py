"""Chunked-npy HDTF dataset readers (dawn_tpu/train/data.py).

Regression anchors for two real bugs: read_block_range touching a
nonexistent chunk when the range ends exactly on a 25-frame block boundary,
and ragged np.stack crashes when a video is shorter than num_frames.
"""

import os
import pickle

import numpy as np
import pytest

from dawn_tpu.train.data import (BLOCK, HDTFVideoDataset, PBnetPoseDataset,
                                 read_block_range, _pad_frames)


def _write_chunks(d, total, shape=()):
    os.makedirs(d, exist_ok=True)
    vals = np.arange(total, dtype=np.float32)
    data = vals.reshape((total,) + (1,) * len(shape)) * np.ones((1,) + shape,
                                                                np.float32)
    for b in range(-(-total // BLOCK)):
        np.save(os.path.join(d, f"chunk_{b:04d}.npy"),
                data[b * BLOCK:(b + 1) * BLOCK])
    return data


class TestReadBlockRange:
    def test_exact_block_boundary_end(self, tmp_path):
        """[0, 25) of a 25-frame video: chunk_0001 does not exist and must
        not be touched."""
        d = str(tmp_path / "v")
        data = _write_chunks(d, 25)
        out = read_block_range(d, 0, 25)
        assert np.array_equal(out, data)

    def test_spanning_and_interior(self, tmp_path):
        d = str(tmp_path / "v")
        data = _write_chunks(d, 60, shape=(3,))
        assert np.array_equal(read_block_range(d, 24, 26), data[24:26])
        assert np.array_equal(read_block_range(d, 0, 60), data)
        assert np.array_equal(read_block_range(d, 30, 50), data[30:50])
        assert np.array_equal(read_block_range(d, 49, 50), data[49:50])

    def test_empty_range_rejected(self, tmp_path):
        d = str(tmp_path / "v")
        _write_chunks(d, 25)
        with pytest.raises(AssertionError):
            read_block_range(d, 5, 5)


@pytest.fixture()
def hdtf_root(tmp_path):
    """Two train videos: 25 frames (boundary case) and 15 frames (shorter
    than num_frames)."""
    lengths = {"vid_a": 25, "vid_b": 15}
    dirs = {}
    for kind, shape in [("frames", (8, 8, 3)), ("hubert", (1024,)),
                        ("pose", (7,)), ("eye", (8,))]:
        root = str(tmp_path / kind)
        dirs[kind] = root
        for name, total in lengths.items():
            _write_chunks(os.path.join(root, name), total, shape)
    ld = str(tmp_path / "length_dict.pkl")
    with open(ld, "wb") as f:
        pickle.dump(lengths, f)
    return dirs, ld


class TestHDTFVideoDataset:
    def test_batches_fixed_shape_with_short_video(self, hdtf_root):
        dirs, ld = hdtf_root
        ds = HDTFVideoDataset(dirs["frames"], dirs["hubert"], dirs["pose"],
                              dirs["eye"], ld, num_frames=20, seed=0)
        assert sorted(ds.videos) == ["vid_a", "vid_b"]
        for batch in ds.batches(batch_size=4, steps=3):
            assert batch["video"].shape == (4, 20, 8, 8, 3)
            assert batch["hubert"].shape == (4, 20, 1024)
            assert batch["pose"].shape == (4, 20, 7)
            assert batch["blink"].shape == (4, 20, 2)
            assert batch["bbox"].shape == (4, 6)

    def test_short_video_edge_padded(self, hdtf_root):
        dirs, ld = hdtf_root
        ds = HDTFVideoDataset(dirs["frames"], dirs["hubert"], dirs["pose"],
                              dirs["eye"], ld, num_frames=20, seed=0)
        i = ds.videos.index("vid_b")
        s = ds.sample(i)
        assert s["video"].shape[0] == 15          # sample() stays exact
        padded = _pad_frames(s["video"], 20)      # batches() pads
        assert padded.shape[0] == 20
        assert np.array_equal(padded[15], padded[14])  # edge repeat


class TestTeacherCache:
    """Disk cache of frozen-teacher outputs (PERF_TRAIN.md): miss -> compute
    + store, hit -> byte-stable reload, start_stride makes the key space
    finite so hits actually recur across epochs."""

    @staticmethod
    def _fake_compute(calls):
        def compute(video):
            calls.append(video.shape)
            b, t = video.shape[:2]
            base = np.asarray(video, np.float32).mean(axis=(2, 3, 4))
            return {
                "real_vid_grid": np.tile(base[..., None, None, None],
                                         (1, 1, 4, 4, 2)),
                "real_vid_conf": np.tile(base[..., None, None, None],
                                         (1, 1, 4, 4, 1)),
                "ref_img_fea": np.tile(base[:, :1, None], (1, 4, 8)),
            }
        return compute

    def test_convert_batch_miss_then_hit(self, tmp_path):
        from dawn_tpu.train.data import TeacherCache
        cache = TeacherCache(str(tmp_path / "tc"))
        r = np.random.RandomState(0)
        batch = {"video": r.rand(2, 3, 8, 8, 3).astype(np.float32) * 255,
                 "hubert": r.randn(2, 3, 16).astype(np.float32)}
        meta = [("vid_a", 0), ("vid_b", 25)]
        calls = []
        out1 = cache.convert_batch(batch, meta, self._fake_compute(calls))
        assert len(calls) == 1                       # computed once
        assert "video" not in out1
        assert out1["real_vid_grid"].shape == (2, 3, 4, 4, 2)
        assert np.array_equal(out1["hubert"], batch["hubert"])
        assert cache.misses == 2 and cache.hits == 0

        out2 = cache.convert_batch(batch, meta, self._fake_compute(calls))
        assert len(calls) == 1                       # pure cache hit
        assert cache.hits == 2
        for k in ("real_vid_grid", "real_vid_conf", "ref_img_fea"):
            np.testing.assert_allclose(out2[k], out1[k], err_msg=k)

    def test_f16_entries_quantize_not_corrupt(self, tmp_path):
        from dawn_tpu.train.data import TeacherCache
        cache = TeacherCache(str(tmp_path / "tc"), dtype=np.float16)
        entry = {"real_vid_grid": np.random.RandomState(1)
                 .uniform(-1, 1, (3, 4, 4, 2)).astype(np.float32)}
        cache.put("v", 0, entry)
        got = cache.get("v", 0)
        assert got["real_vid_grid"].dtype == np.float32   # upcast on read
        np.testing.assert_allclose(got["real_vid_grid"],
                                   entry["real_vid_grid"], atol=6e-4)

    def test_start_stride_quantizes_clip_starts(self, hdtf_root):
        dirs, ld = hdtf_root
        ds = HDTFVideoDataset(dirs["frames"], dirs["hubert"], dirs["pose"],
                              dirs["eye"], ld, num_frames=10, seed=0,
                              start_stride=5)
        i = ds.videos.index("vid_a")                # 25 frames, nf=10
        starts = {ds.sample(i)["start"] for _ in range(40)}
        assert starts <= {0, 5, 10, 15}             # (25-10)//5+1 = 4 slots
        assert len(starts) > 1                      # still randomized

    def test_batches_with_meta(self, hdtf_root):
        dirs, ld = hdtf_root
        ds = HDTFVideoDataset(dirs["frames"], dirs["hubert"], dirs["pose"],
                              dirs["eye"], ld, num_frames=10, seed=0,
                              start_stride=5)
        batch, meta = next(iter(ds.batches(batch_size=3, steps=1,
                                           with_meta=True)))
        assert "start" not in batch and "name" not in batch
        assert len(meta) == 3
        for name, start in meta:
            assert name in ("vid_a", "vid_b")
            assert start % 5 == 0


class TestPBnetPoseDataset:
    def test_batches_and_normalization(self, tmp_path):
        lengths = {"vid_a": 120, "vid_b": 40}     # vid_b < num_frames
        for kind, shape in [("hubert", (1024,)), ("pose", (7,)),
                            ("eye", (8,))]:
            for name, total in lengths.items():
                _write_chunks(str(tmp_path / kind / name), total, shape)
        ld = str(tmp_path / "length_dict.pkl")
        with open(ld, "wb") as f:
            pickle.dump(lengths, f)
        ds = PBnetPoseDataset(str(tmp_path / "hubert"), str(tmp_path / "pose"),
                              str(tmp_path / "eye"), ld, num_frames=100,
                              seed=0)
        batch = next(iter(ds.batches(batch_size=4, steps=1)))
        assert batch["hubert"].shape == (4, 100, 1024)
        assert batch["pose"].shape == (4, 100, 6)
        assert batch["eye"].shape == (4, 100, 2)
        # min/max normalization formula (datasets_..._eye_fast.py:62-65)
        from dawn_tpu.train.data import PBNET_POSE_MAX, PBNET_POSE_MIN
        raw = ds.cache["vid_a"]["pose"][:1, :6].astype(np.float32)
        expect = (raw - PBNET_POSE_MIN) / (PBNET_POSE_MAX - PBNET_POSE_MIN)
        got = ds.normalize_pose(raw)
        assert np.allclose(got, expect)


class TestNativePrefetch:
    """The C++ NpyPrefetcher wired into the chunk reader (VERDICT r4 #7):
    parallel reads must return the same arrays as np.load, and the
    overlapped batches_prefetched iterator must produce batch-for-batch the
    same content as the synchronous batches()."""

    @staticmethod
    def _native_or_skip():
        from dawn_tpu.runtime import native
        if native.load() is None:
            pytest.skip("libdawn_rt.so unavailable")

    def test_read_many_matches_npload(self, tmp_path):
        self._native_or_skip()
        from dawn_tpu.train.data import NativeChunkReader
        d = str(tmp_path / "v")
        _write_chunks(d, 60, shape=(5,))
        paths = [os.path.join(d, f"chunk_{i:04d}.npy") for i in range(3)]
        reader = NativeChunkReader(n_threads=3)
        try:
            arrs = reader.read_many(paths)
        finally:
            reader.close()
        for p, a in zip(paths, arrs):
            assert np.array_equal(a, np.load(p)), p

    def test_read_block_range_with_reader(self, tmp_path):
        self._native_or_skip()
        from dawn_tpu.train.data import NativeChunkReader
        d = str(tmp_path / "v")
        data = _write_chunks(d, 60, shape=(3,))
        reader = NativeChunkReader(n_threads=2)
        try:
            assert np.array_equal(read_block_range(d, 24, 52, reader),
                                  data[24:52])
            assert np.array_equal(read_block_range(d, 0, 25, reader),
                                  data[:25])
        finally:
            reader.close()

    def test_batches_prefetched_content_parity(self, hdtf_root):
        self._native_or_skip()
        dirs, ld = hdtf_root

        def make():
            return HDTFVideoDataset(dirs["frames"], dirs["hubert"],
                                    dirs["pose"], dirs["eye"], ld,
                                    num_frames=20, seed=3)

        sync = list(make().batches(batch_size=2, steps=4))
        pre = list(make().batches_prefetched(batch_size=2, steps=4,
                                             n_threads=3))
        assert len(sync) == len(pre) == 4
        for bs, bp in zip(sync, pre):
            assert set(bs) == set(bp)
            for k in bs:
                np.testing.assert_array_equal(bs[k], bp[k], err_msg=k)

    def test_prefetched_surfaces_worker_errors(self, hdtf_root):
        self._native_or_skip()
        dirs, ld = hdtf_root
        ds = HDTFVideoDataset(dirs["frames"], dirs["hubert"], dirs["pose"],
                              dirs["eye"], ld, num_frames=20, seed=0)
        ds.dirs["hubert"] = str(ld) + "_missing"   # break one modality
        with pytest.raises(Exception):
            list(ds.batches_prefetched(batch_size=1, steps=1))
