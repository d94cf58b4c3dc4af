"""Assertions over committed bench artifacts (regenerated on TPU each round).

The reference's long-video headline is "video length linearly related to
VRAM" (README.md:34-38). BENCH_400f/BENCH_800f carry the compiled peak
memory of the full sampler at 128^2 (bench.py memory_analysis); this test
pins the linearity claim: doubling the frame count must not much more than
double peak memory. Skips when the artifacts predate the peak_mem_gb field.
"""

import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    path = os.path.join(ROOT, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not committed")
    with open(path) as f:
        return json.load(f)


def test_long_video_memory_linearity():
    b4 = _load("BENCH_400f.json")
    b8 = _load("BENCH_800f.json")
    if "peak_mem_gb" not in b4 or "peak_mem_gb" not in b8:
        pytest.skip("artifacts predate peak_mem_gb accounting")
    ratio = b8["peak_mem_gb"] / max(b4["peak_mem_gb"], 1e-9)
    assert ratio <= 2.3, (
        f"peak memory 400f->800f grew {ratio:.2f}x — the linear-in-frames "
        f"memory claim is broken ({b4['peak_mem_gb']} -> "
        f"{b8['peak_mem_gb']} GB)")
    # and 800f must still fit the 16 GB v5e chip
    assert b8["peak_mem_gb"] < 16.0, b8["peak_mem_gb"]
