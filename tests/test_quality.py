"""Quality harness tests: FVD proxy behaves like a distance, lip proxy
responds to mouth-region corruption, and the eval script runs end-to-end."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def gen_setup():
    from dawn_tpu.models.lfg import LFGGenerator
    gen = LFGGenerator(block_expansion=8, max_features=32,
                       num_bottleneck_blocks=1)
    variables = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                         method=LFGGenerator.compute_fea)
    return gen, variables


def _videos(seed, n=3, t=6, s=32):
    r = np.random.RandomState(seed)
    return (r.rand(n, t, s, s, 3) * 0.5 + 0.25).astype(np.float32)


class TestFVDProxy:
    def test_identical_is_zero(self, gen_setup):
        from dawn_tpu.evaluate.quality import fvd_proxy
        gen, variables = gen_setup
        v = _videos(0)
        d = fvd_proxy(gen, variables, v, v.copy())
        assert abs(d) < 1e-3, d

    def test_monotone_in_corruption(self, gen_setup):
        from dawn_tpu.evaluate.quality import fvd_proxy
        gen, variables = gen_setup
        v = _videos(0)
        r = np.random.RandomState(1)
        noise = r.randn(*v.shape).astype(np.float32)
        d_small = fvd_proxy(gen, variables, v,
                            np.clip(v + 0.02 * noise, 0, 1))
        d_big = fvd_proxy(gen, variables, v,
                          np.clip(v + 0.2 * noise, 0, 1))
        assert 0 <= d_small < d_big, (d_small, d_big)


class TestLipProxy:
    def test_mouth_region_sensitivity(self):
        from dawn_tpu.evaluate.quality import lip_sync_proxy
        v = _videos(2, n=2)
        lmk = np.zeros((2, 6, 19, 2), np.float32)
        lmk[..., 0] = 16 + np.random.RandomState(0).rand(2, 6, 19) * 6
        lmk[..., 1] = 20 + np.random.RandomState(1).rand(2, 6, 19) * 6

        same = lip_sync_proxy(v.copy(), v, lmk)
        assert same["mouth_l1"] < 1e-6
        assert same["mouth_ssim"] > 0.999

        # corrupt ONLY outside the mouth bbox -> mouth metrics unchanged
        out = v.copy()
        out[:, :, :8, :8] = 0.0
        far = lip_sync_proxy(out, v, lmk)
        assert far["mouth_l1"] < 1e-6

        # corrupt the mouth region -> metrics respond
        bad = v.copy()
        bad[:, :, 18:28, 14:24] = 0.0
        hit = lip_sync_proxy(bad, v, lmk)
        assert hit["mouth_l1"] > 1e-3
        assert hit["mouth_ssim"] < same["mouth_ssim"]


def test_eval_quality_script(tmp_path, gen_setup):
    real_d, fake_d = tmp_path / "real", tmp_path / "fake"
    real_d.mkdir(), fake_d.mkdir()
    v = _videos(3, n=2)
    r = np.random.RandomState(4)
    for i in range(2):
        np.save(real_d / f"vid{i}.npy", v[i])
        np.save(fake_d / f"vid{i}.npy",
                np.clip(v[i] + 0.05 * r.randn(*v[i].shape), 0, 1)
                .astype(np.float32))
    out = tmp_path / "q.json"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, "scripts/eval_quality.py", "--real-dir", str(real_d),
         "--fake-dir", str(fake_d), "--out", str(out), "--platform", "cpu"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=500)
    assert res.returncode == 0, res.stderr[-2000:]
    report = json.loads(out.read_text())
    for k in ("fvd_lfg_frames", "fvd_lfg_videos", "l1", "mouth_l1",
              "mouth_ssim", "per_video_l1"):
        assert k in report, k
    assert report["l1"] > 0
