"""PBnet CVAE parity against the reference torch implementation.

Imports PBnet/src from /root/reference (with dep shims), random-inits the
transformerreemb6 encoder/decoder, converts weights, and compares encoder
posteriors and decoder outputs frame-for-frame.
"""

import os
import sys

import numpy as np
import pytest
import torch
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
for p in (os.path.join(HERE, "ref_shims"), "/root/reference/PBnet"):
    if p not in sys.path:
        sys.path.insert(0, p)

torch.manual_seed(0)


@pytest.fixture(scope="module")
def ref_mod():
    import importlib
    return importlib.import_module("src.models.architectures.transformerreemb6")


@pytest.fixture(scope="module")
def pair(ref_mod):
    from dawn_tpu.models.pbnet import CVAE, PBnetParams
    from dawn_tpu.weights import convert_pbnet

    kw = dict(modeltype="cvae", num_frames=60, audio_dim=1024, pos_dim=6,
              eye_dim=0, pose_latent_dim=64, audio_latent_dim=256,
              ff_size=128, num_layers=2, num_heads=4, dropout=0.0,
              num_buckets=128, max_distance=128)
    tenc = ref_mod.Encoder_TRANSFORMERREEMB6(**kw).eval()
    tdec = ref_mod.Decoder_TRANSFORMERREEMB6(**kw).eval()

    sd = {f"encoder.{k}": v for k, v in tenc.state_dict().items()}
    sd.update({f"decoder.{k}": v for k, v in tdec.state_dict().items()})
    variables = convert_pbnet(sd, num_layers=2)

    hp = PBnetParams(pos_dim=6, eye_dim=0, num_buckets=128, max_distance=128,
                     num_layers=2, num_heads=4, dropout=0.0)
    model = CVAE(hp, deterministic=True)
    return tenc, tdec, model, variables


class TestPBnetParity:
    def test_encoder(self, pair):
        tenc, _, model, variables = pair
        rng = np.random.RandomState(0)
        B, T = 2, 12
        x = rng.randn(B, T, 6).astype(np.float32)
        y = rng.randn(B, T, 1024).astype(np.float32)
        mask = np.ones((B, T), bool)
        with torch.no_grad():
            ref = tenc({"x": torch.from_numpy(x), "y": torch.from_numpy(y),
                        "mask": torch.from_numpy(mask)})
        got = model.encode(variables, jnp.asarray(x), jnp.asarray(y),
                           jnp.asarray(mask))
        # torch returns (nf, bs, 256); ours (bs, nf, 256)
        ref_mu = ref["mu"].numpy().transpose(1, 0, 2)
        ref_lv = ref["logvar"].numpy().transpose(1, 0, 2)
        assert np.abs(np.asarray(got["mu"]) - ref_mu).max() < 2e-4
        assert np.abs(np.asarray(got["logvar"]) - ref_lv).max() < 2e-4

    def test_decoder_eval_window(self, pair):
        _, tdec, model, variables = pair
        rng = np.random.RandomState(1)
        B, T = 1, 16
        x = rng.randn(B, T, 6).astype(np.float32)
        z = rng.randn(T, B, 256).astype(np.float32)       # torch layout (nf, bs, c)
        y = rng.randn(B, T, 1024).astype(np.float32)
        mask = np.ones((B, T), bool)
        with torch.no_grad():
            ref = tdec({"x": torch.from_numpy(x), "z": torch.from_numpy(z),
                        "y": torch.from_numpy(y), "mask": torch.from_numpy(mask),
                        "lengths": torch.tensor([T])})["output"]
        got = model.decode(variables, jnp.asarray(x),
                           jnp.asarray(z.transpose(1, 0, 2)), jnp.asarray(y),
                           jnp.asarray(mask))
        err = np.abs(np.asarray(got) - ref.numpy()).max()
        assert err < 2e-4, f"PBnet decoder parity err {err}"


class TestLossParity:
    """dawn_tpu.models.pbnet.losses vs PBnet/src/models/tools/losses.py."""

    def _batch(self, d=6, b=2, t=12, seed=0):
        rng = np.random.RandomState(seed)
        x_delta = rng.randn(b, t, d).astype(np.float32)
        out = rng.randn(b, t, d).astype(np.float32)
        mask = np.ones((b, t), bool)
        return x_delta, out, mask

    def test_rc(self):
        from src.models.tools import losses as tl
        from dawn_tpu.models.pbnet import losses as jl
        x_delta, out, mask = self._batch()
        batch = {"x_delta": torch.from_numpy(x_delta),
                 "output": torch.from_numpy(out),
                 "mask": torch.from_numpy(mask)}
        ref = tl.compute_rc_loss(None, batch).item()
        got = float(jl.rc_loss(jnp.asarray(out), jnp.asarray(x_delta),
                               jnp.asarray(mask, jnp.float32)))
        assert abs(ref - got) < 1e-5

    @pytest.mark.parametrize("d", [6, 7, 8, 5])
    def test_rcw(self, d, monkeypatch):
        from src.models.tools import losses as tl
        from dawn_tpu.models.pbnet import losses as jl
        # the reference hardcodes .cuda(); run on CPU
        monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
        x_delta, out, mask = self._batch(d=d)
        batch = {"x": torch.from_numpy(x_delta),
                 "x_delta": torch.from_numpy(x_delta),
                 "output": torch.from_numpy(out),
                 "mask": torch.from_numpy(mask)}
        ref = tl.compute_rc_weight_loss(None, batch).item()
        got = float(jl.rcw_loss(jnp.asarray(out), jnp.asarray(x_delta),
                                jnp.asarray(mask, jnp.float32)))
        assert abs(ref - got) < 1e-4 * max(1.0, abs(ref))

    def test_kl(self):
        from src.models.tools import losses as tl
        from dawn_tpu.models.pbnet import losses as jl
        rng = np.random.RandomState(1)
        mu = rng.randn(2, 12, 16).astype(np.float32)
        logvar = rng.randn(2, 12, 16).astype(np.float32) * 0.3
        batch = {"mu": torch.from_numpy(mu), "logvar": torch.from_numpy(logvar)}
        ref = tl.compute_kl_loss(None, batch).item()
        got = float(jl.kl_loss(jnp.asarray(mu), jnp.asarray(logvar),
                               jnp.ones((2, 12), jnp.float32)))
        assert abs(ref - got) < 1e-5

    def test_ssim(self):
        from src.models.tools import losses as tl
        from dawn_tpu.models.pbnet import losses as jl
        x_delta, out, mask = self._batch(t=20)
        batch = {"x": torch.from_numpy(x_delta),
                 "x_delta": torch.from_numpy(x_delta),
                 "output": torch.from_numpy(out),
                 "mask": torch.from_numpy(mask)}
        ref = tl.compute_ssim_loss(None, batch).item()
        got = float(jl.ssim_loss(jnp.asarray(out), jnp.asarray(x_delta),
                                 jnp.asarray(mask, jnp.float32)))
        assert abs(ref - got) < 1e-4

    def test_var(self):
        from src.models.tools import losses as tl
        from dawn_tpu.models.pbnet import losses as jl
        x_delta, out, mask = self._batch(seed=3)
        out = out * 0.5  # keep variance inside the (0, 3) window
        batch = {"output": torch.from_numpy(out),
                 "mask": torch.from_numpy(mask)}
        ref = tl.comput_var_loss(None, batch).item()
        got = float(jl.var_loss(jnp.asarray(out), None,
                                jnp.asarray(mask, jnp.float32)))
        assert abs(ref - got) < 1e-5

    def test_mmd_kernel(self):
        from src.models.tools.mmd import compute_mmd
        from dawn_tpu.models.pbnet.losses import _mmd_kernel
        rng = np.random.RandomState(4)
        x = rng.randn(16, 8).astype(np.float32)
        y = rng.randn(16, 8).astype(np.float32)
        ref = compute_mmd(torch.from_numpy(x), torch.from_numpy(y)).item()
        xj, yj = jnp.asarray(x), jnp.asarray(y)
        got = float(_mmd_kernel(xj, xj).mean() + _mmd_kernel(yj, yj).mean()
                    - 2 * _mmd_kernel(xj, yj).mean())
        assert abs(ref - got) < 1e-5

    def test_hessian_penalty_analytic(self):
        """hp == 0 for any linear map; > 0 for an entangled quadratic."""
        import jax
        from dawn_tpu.models.pbnet.losses import hessian_penalty
        rng = jax.random.PRNGKey(0)
        x = jnp.asarray(np.random.RandomState(5).randn(2, 4, 3), jnp.float32)
        lin = hessian_penalty(rng, lambda z: 3.0 * z + 1.0, x)
        assert abs(float(lin)) < 1e-3
        quad = hessian_penalty(
            rng, lambda z: z[..., :1] * z[..., 1:2], x, k=8)
        assert float(quad) > 1e-3
