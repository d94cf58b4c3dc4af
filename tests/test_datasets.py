"""FramesDataset / DatasetRepeater / PairedDataset / pair augmentation."""

import os

import numpy as np
import pytest

from dawn_tpu.train.augment import augment_frame_pair
from dawn_tpu.train.data import DatasetRepeater, FramesDataset, PairedDataset


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("videos")
    rng = np.random.RandomState(0)
    for name in ("vidA", "vidB"):
        d = root / name
        d.mkdir()
        for c in range(2):
            np.save(d / f"chunk_{c:03d}.npy",
                    rng.randint(0, 255, (25, 32, 32, 3), np.uint8))
    np.save(root / "vidC.npy", rng.randint(0, 255, (10, 48, 48, 3), np.uint8))
    return str(root)


class TestFramesDataset:
    def test_train_pair(self, video_root):
        ds = FramesDataset(video_root, mode="train", image_size=32)
        s = ds.sample(0)
        assert s["source"].shape == (32, 32, 3)
        assert s["driving"].shape == (32, 32, 3)
        assert 0.0 <= s["source"].min() and s["source"].max() <= 1.0

    def test_test_full_video(self, video_root):
        ds = FramesDataset(video_root, mode="test", image_size=32)
        s = ds.sample(0)
        assert s["video"].shape == (50, 32, 32, 3)

    def test_npy_entry_resized(self, video_root):
        ds = FramesDataset(video_root, mode="test", image_size=32)
        idx = ds.videos.index("vidC.npy")
        s = ds.sample(idx)
        assert s["video"].shape == (10, 32, 32, 3)

    def test_batches(self, video_root):
        ds = FramesDataset(video_root, mode="train", image_size=32,
                           augment=augment_frame_pair)
        b = next(ds.batches(4, 1))
        assert b["source"].shape == (4, 32, 32, 3)
        assert np.isfinite(b["source"]).all()

    def test_repeater_and_pairs(self, video_root):
        ds = FramesDataset(video_root, mode="train", image_size=32)
        rep = DatasetRepeater(ds, num_repeats=5)
        assert len(rep) == 5 * len(ds)
        assert "source" in rep.sample(len(ds) + 1)
        pd = PairedDataset(FramesDataset(video_root, mode="test",
                                         image_size=32), number_of_pairs=3)
        p = pd.sample(0)
        assert p["source_video"].ndim == 4 and p["driving_video"].ndim == 4


class TestPairAugment:
    def test_shapes_and_range(self):
        rng = np.random.RandomState(0)
        src = rng.rand(32, 32, 3).astype(np.float32)
        drv = rng.rand(32, 32, 3).astype(np.float32)
        s, d = augment_frame_pair(rng, src, drv)
        assert s.shape == src.shape and d.shape == drv.shape
        assert s.min() >= 0.0 and s.max() <= 1.0

    def test_time_flip_swaps(self):
        rng = np.random.RandomState(1)
        src = np.zeros((8, 8, 3), np.float32)
        drv = np.ones((8, 8, 3), np.float32)
        swapped = 0
        for _ in range(50):
            s, d = augment_frame_pair(rng, src, drv, brightness=0, contrast=0,
                                      saturation=0, hue=0,
                                      horizontal_flip=False)
            swapped += int(s.mean() > 0.5)
        assert 10 < swapped < 40   # ~50% swap rate


class TestFrameBucketing:
    def test_pad_to_bucket(self):
        from dawn_tpu.pipeline.generator import pad_to_bucket
        a = np.arange(73 * 4, dtype=np.float32).reshape(73, 4)
        (p,), t_pad = pad_to_bucket([a], 73, 25, 200)
        assert t_pad == 75 and p.shape == (75, 4)
        np.testing.assert_array_equal(p[73], a[72])     # edge padding
        (p,), t_pad = pad_to_bucket([a], 73, 25, 74)    # cap at max_n_frames
        assert t_pad == 74 and p.shape == (74, 4)
        (p,), t_pad = pad_to_bucket([a[:50]], 50, 25, 200)  # exact multiple
        assert t_pad == 50 and p.shape == (50, 4)
