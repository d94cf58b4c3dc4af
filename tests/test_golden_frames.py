"""Golden-output regression: sampler numerics frozen at released topology.

VERDICT r3 #6: perf work must not silently change what `sample_one_video`
computes. scripts/make_golden.py generated committed fixtures (seeded
weights via init_variables(PRNGKey(7)), fixed noise_seq, released UNet/LFG
depth) on the CPU backend with highest matmul precision — exactly this
suite's environment — and these tests re-run the sampler and assert EXACT
(bitwise f32) equality on strided output pixels and flow grids.

If this fails after an INTENTIONAL numeric change (or a jax/XLA version
bump that moves lsbs), regenerate with `python scripts/make_golden.py` and
commit the new fixture in the same change. Ref: ca_multi_test.py:1156-1208
(the DDIM loop whose numerics are frozen).
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.mark.parametrize("size", [128, 256])
def test_golden_sampler_frames(size):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "make_golden", os.path.join(os.path.dirname(GOLDEN_DIR), "..",
                                    "scripts", "make_golden.py"))
    make_golden = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(make_golden)
    got = make_golden.generate(size)

    path = os.path.join(GOLDEN_DIR, f"golden_{size}.npz")
    if os.environ.get("DAWN_REGEN_GOLDEN"):
        # intentional-change escape hatch: regenerate IN the suite's own
        # environment (the CPU-result depends on the xla_force_host_platform
        # device-count flag, so fixtures must be born under conftest.py)
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, **got)
        pytest.skip(f"regenerated {path}")
    assert os.path.exists(path), (
        f"missing fixture {path}; generate with "
        f"DAWN_REGEN_GOLDEN=1 pytest tests/test_golden_frames.py")
    golden = np.load(path)

    np.testing.assert_array_equal(
        got["pixels"], golden["pixels"],
        err_msg=(f"sample_one_video({size}) pixel drift vs committed golden "
                 f"— if intentional, regenerate via scripts/make_golden.py"))
    np.testing.assert_array_equal(
        got["grid"], golden["grid"],
        err_msg=f"flow-grid drift at {size}")
    assert float(got["checksum"]) == float(golden["checksum"]), (
        float(got["checksum"]), float(golden["checksum"]))
