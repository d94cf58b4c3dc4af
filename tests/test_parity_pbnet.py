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
