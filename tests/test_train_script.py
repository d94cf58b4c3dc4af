"""End-to-end test of scripts/train_dm.py — the stage-1 training CLI.

Drives the SCRIPT's main() (not just the trainer) at tiny yaml-configured
topology over a synthetic chunked-npy HDTF tree: the teacher-cache +
prefetch production path (PERF_TRAIN.md), metrics.jsonl, and the final
checkpoint. A second invocation over the same data must be 100 % cache
hits (the dataset RNG streams are seed-deterministic).
Reference entry being exercised: DM_3/train_vdm_hdtf_wpose_plus_faceemb_
init_cond_liploss_6D.py (config-driven constants, per-interval logging).
"""

import importlib.util
import json
import os
import pickle
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_CFG = """
img_size: 32
fea_channels: 32
win_width: 2
num_frames: 4
batch_size: 4
lr: 2.0e-4
total_steps: 10
grad_clip: 2.0
floss_weight: 0.15
mouth_weight: 0.15
null_cond_prob: 0.1
random_seed: 1234
unet:
  dim: 16
  dim_mults: [1, 2]
lfg:
  generator: {block_expansion: 8, max_features: 32, num_bottleneck_blocks: 1}
  region: {block_expansion: 4, max_features: 16, num_blocks: 2}
  bg: {block_expansion: 4, max_features: 16, num_blocks: 2}
  flow: {block_expansion: 4, max_features: 16, num_blocks: 2}
"""


def _write_chunks(d, total, shape, dtype=np.float32, scale=1.0):
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(hash(d) % (2 ** 31))
    from dawn_tpu.train.data import BLOCK
    for b in range(-(-total // BLOCK)):
        nfr = min(BLOCK, total - b * BLOCK)
        arr = (rng.rand(nfr, *shape) * scale).astype(dtype)
        np.save(os.path.join(d, f"chunk_{b:04d}.npy"), arr)


@pytest.fixture()
def hdtf_tree(tmp_path):
    s = 32
    lengths = {"vid_a": 30, "vid_b": 30}
    kinds = [("frames", (s, s, 3), np.uint8, 255),
             ("hubert", (1024,), np.float32, 1),
             ("pose", (7,), np.float32, 1),
             ("eye", (8,), np.float32, 1),
             ("lmk", (68, 2), np.float32, s)]
    for kind, shape, dt, scale in kinds:
        for name in lengths:
            _write_chunks(str(tmp_path / kind / name), lengths[name],
                          shape, dt, scale)
    ld = str(tmp_path / "length_dict.pkl")
    with open(ld, "wb") as f:
        pickle.dump(lengths, f)
    cfg = str(tmp_path / "tiny.yaml")
    with open(cfg, "w") as f:
        f.write(TINY_CFG)
    return tmp_path, ld, cfg


def _run_main(argv, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "train_dm_script", os.path.join(REPO, "scripts", "train_dm.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", argv)
    real_stdout = sys.stdout
    try:
        mod.main()
    finally:
        sys.stdout = real_stdout   # the script tees stdout into train.log


def test_train_script_teacher_cache_e2e(hdtf_tree, monkeypatch):
    root, ld, cfg = hdtf_tree
    work = root / "run"
    cache = root / "teacher_cache"
    argv = [
        "train_dm.py", "--config", cfg,
        "--frames-dir", str(root / "frames"),
        "--hubert-dir", str(root / "hubert"),
        "--pose-dir", str(root / "pose"),
        "--eye-dir", str(root / "eye"),
        "--lmk-dir", str(root / "lmk"),
        "--length-dict", ld,
        "--workdir", str(work),
        "--steps", "3", "--log-every", "1", "--ckpt-every", "1000",
        "--sample-every", "0",
        "--teacher-cache", str(cache), "--prefetch",
    ]
    _run_main(argv, monkeypatch)

    # teacher cache populated: one .npz per distinct (video, start) clip
    entries = [f for f in os.listdir(cache) if f.endswith(".npz")]
    assert entries, "no teacher-cache entries written"
    with np.load(os.path.join(str(cache), entries[0])) as z:
        assert set(z.files) == {"real_vid_grid", "real_vid_conf",
                                "ref_img_fea"}
        assert z["real_vid_grid"].shape == (4, 8, 8, 2)   # t, ls, ls, 2

    # metrics.jsonl: one record per logged step, finite losses
    lines = [json.loads(ln) for ln in
             (work / "metrics.jsonl").read_text().splitlines()]
    assert len(lines) == 3
    for rec in lines:
        assert np.isfinite(rec["total"])
        assert "teacher_cache_hit_rate" in rec

    # the final checkpoint exists
    assert os.path.isdir(work / "ckpt")
    assert os.listdir(work / "ckpt")

    # second run over the same seed-deterministic clip stream: pure hits
    _run_main(argv, monkeypatch)
    lines2 = [json.loads(ln) for ln in
              (work / "metrics.jsonl").read_text().splitlines()]
    assert len(lines2) == 6
    assert lines2[-1]["teacher_cache_hit_rate"] == 1.0
    assert len([f for f in os.listdir(cache) if f.endswith(".npz")]) \
        == len(entries)   # nothing recomputed
