"""PBnet ablation architecture parity vs the reference torch modules.

Covers the round-1 gap (VERDICT item 5): transformer / mlp / autotrans were
registered but silently aliased. Each reference module is imported from
/root/reference, random-initialized, weight-converted, and compared
frame-for-frame. transgru / grutrans have no runnable upstream counterpart
(the paired halves are mutually interface-incompatible, see DEVIATIONS.md) —
their factory wiring is exercised in test_pbnet_factory.py.
"""

import os
import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
for p in (os.path.join(HERE, "ref_shims"), "/root/reference/PBnet"):
    if p not in sys.path:
        sys.path.insert(0, p)

torch.manual_seed(0)

KW = dict(modeltype="cvae", num_frames=16, audio_dim=1024, pos_dim=6,
          pose_latent_dim=64, audio_latent_dim=256, ff_size=128,
          num_layers=2, num_heads=4, dropout=0.0)


def _randomize_bn(module):
    """Give BatchNorms nontrivial running stats so eval parity is meaningful."""
    rng = np.random.RandomState(7)
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(m.num_features).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(
                rng.rand(m.num_features).astype(np.float32) + 0.5))


class TestTransformerParity:
    @pytest.fixture(scope="class")
    def ref_mod(self):
        import importlib
        return importlib.import_module("src.models.architectures.transformer")

    def test_encoder(self, ref_mod):
        from dawn_tpu.models.pbnet.architectures import EncoderTransformerReemb6
        from dawn_tpu.weights.torch_convert import (
            convert_pbnet_encoder_transformer, sd_numpy)

        tenc = ref_mod.Encoder_TRANSFORMER(**KW).eval()
        params = convert_pbnet_encoder_transformer(
            sd_numpy(tenc.state_dict()), num_layers=2)
        enc = EncoderTransformerReemb6(pos_dim=6, num_layers=2, num_heads=4,
                                       dropout=0.0)
        rng = np.random.RandomState(0)
        B, T = 2, 12
        x = rng.randn(B, T, 6).astype(np.float32)
        y = rng.randn(B, T, 1024).astype(np.float32)
        mask = np.ones((B, T), bool)
        with torch.no_grad():
            ref = tenc({"x": torch.from_numpy(x), "y": torch.from_numpy(y),
                        "mask": torch.from_numpy(mask)})
        got = enc.apply({"params": params}, jnp.asarray(x), jnp.asarray(y),
                        jnp.asarray(mask))
        assert np.abs(np.asarray(got["mu"]) -
                      ref["mu"].numpy().transpose(1, 0, 2)).max() < 2e-4
        assert np.abs(np.asarray(got["logvar"]) -
                      ref["logvar"].numpy().transpose(1, 0, 2)).max() < 2e-4

    def test_decoder(self, ref_mod):
        from dawn_tpu.models.pbnet.architectures_vanilla import DecoderTransformer
        from dawn_tpu.weights.torch_convert import (
            convert_pbnet_decoder_transformer, sd_numpy)

        tdec = ref_mod.Decoder_TRANSFORMER(**KW).eval()
        params = convert_pbnet_decoder_transformer(
            sd_numpy(tdec.state_dict()), num_layers=2)
        dec = DecoderTransformer(pos_dim=6, num_layers=2, num_heads=4,
                                 dropout=0.0)
        rng = np.random.RandomState(1)
        B, T = 2, 12
        x = rng.randn(B, T, 6).astype(np.float32)
        z = rng.randn(T, B, 256).astype(np.float32)      # torch layout
        y = rng.randn(B, T, 1024).astype(np.float32)
        mask = np.ones((B, T), bool)
        mask[1, 9:] = False                               # ragged batch
        with torch.no_grad():
            ref = tdec({"x": torch.from_numpy(x), "z": torch.from_numpy(z),
                        "y": torch.from_numpy(y),
                        "mask": torch.from_numpy(mask),
                        "lengths": torch.from_numpy(mask.sum(1))})
        got = dec.apply({"params": params}, jnp.asarray(x),
                        jnp.asarray(z.transpose(1, 0, 2)), jnp.asarray(y),
                        jnp.asarray(mask))
        assert np.abs(np.asarray(got) - ref["output"].numpy()).max() < 2e-4


class TestMLPParity:
    @pytest.fixture(scope="class")
    def ref_mod(self):
        import importlib
        return importlib.import_module("src.models.architectures.mlp")

    def test_encoder(self, ref_mod):
        from dawn_tpu.models.pbnet.architectures_vanilla import EncoderMLP
        from dawn_tpu.weights.torch_convert import convert_pbnet_mlp, sd_numpy

        tenc = ref_mod.Encoder_MLP(**KW).eval()
        _randomize_bn(tenc)
        variables = convert_pbnet_mlp(sd_numpy(tenc.state_dict()), "encoder")
        enc = EncoderMLP(pos_dim=6, ff_size=128, num_frames=16)
        rng = np.random.RandomState(2)
        B, T = 2, 16
        x = rng.randn(B, T, 6).astype(np.float32)
        y = rng.randn(B, T, 1024).astype(np.float32)
        with torch.no_grad():
            ref = tenc({"x": torch.from_numpy(x), "y": torch.from_numpy(y)})
        got = enc.apply(variables, jnp.asarray(x), jnp.asarray(y))
        assert np.abs(np.asarray(got["mu"]) - ref["mu"].numpy()).max() < 5e-4
        # the reference computes logvar with linear_means too (mlp.py:225)
        assert np.allclose(ref["logvar"].numpy(), ref["mu"].numpy())
        assert np.abs(np.asarray(got["logvar"]) -
                      ref["logvar"].numpy()).max() < 5e-4

    def test_decoder(self, ref_mod):
        from dawn_tpu.models.pbnet.architectures_vanilla import DecoderMLP
        from dawn_tpu.weights.torch_convert import convert_pbnet_mlp, sd_numpy

        tdec = ref_mod.Decoder_MLP(**KW).eval()
        _randomize_bn(tdec)
        variables = convert_pbnet_mlp(sd_numpy(tdec.state_dict()), "decoder")
        dec = DecoderMLP(pos_dim=6, ff_size=128, num_frames=16)
        rng = np.random.RandomState(3)
        B, T = 2, 16
        x = rng.randn(B, T, 6).astype(np.float32)
        z = rng.randn(B, 128).astype(np.float32)
        y = rng.randn(B, T, 1024).astype(np.float32)
        with torch.no_grad():
            ref = tdec({"x": torch.from_numpy(x), "z": torch.from_numpy(z),
                        "y": torch.from_numpy(y)})
        got = dec.apply(variables, jnp.asarray(x), jnp.asarray(z),
                        jnp.asarray(y))
        assert np.abs(np.asarray(got) - ref["output"].numpy()).max() < 5e-4


class TestAutotransParity:
    @pytest.fixture(scope="class")
    def pair(self):
        import importlib
        ref_mod = importlib.import_module("src.models.architectures.autotrans")
        from dawn_tpu.models.pbnet.architectures_vanilla import DecoderAutotrans
        from dawn_tpu.weights.torch_convert import (
            convert_pbnet_autotrans, sd_numpy)

        tdec = ref_mod.Decoder_AUTOTRANS(
            modeltype="cvae", njoints=1, nfeats=6, num_frames=10,
            num_classes=4, translation=None, pose_rep=None, glob=None,
            glob_rot=None, latent_dim=64, ff_size=128, num_layers=2,
            num_heads=4, dropout=0.0, emb_dropout=0.0,
            teacher_forcing=True).eval()
        params = convert_pbnet_autotrans(sd_numpy(tdec.state_dict()),
                                         num_layers=2)
        dec = DecoderAutotrans(njoints=1, nfeats=6, num_classes=4,
                               latent_dim=64, ff_size=128, num_layers=2,
                               num_heads=4, dropout=0.0)
        return tdec, dec, {"params": params}

    def test_teacher_forced(self, pair):
        tdec, dec, variables = pair
        rng = np.random.RandomState(4)
        B, T = 2, 10
        z = rng.randn(B, 64).astype(np.float32)
        ycls = np.array([1, 3])
        mask = np.ones((B, T), bool)
        mask[1, 7:] = False
        x = rng.randn(B, 1, 6, T).astype(np.float32)     # torch (bs, nj, nf, T)
        with torch.no_grad():
            ref = tdec({"z": torch.from_numpy(z), "y": torch.from_numpy(ycls),
                        "mask": torch.from_numpy(mask),
                        "x": torch.from_numpy(x), "teacher_force": True})
        got = dec.apply(
            variables, jnp.asarray(z),
            jax.nn.one_hot(jnp.asarray(ycls), 4), jnp.asarray(mask),
            jnp.asarray(mask.sum(1)),
            teacher_x=jnp.asarray(x.transpose(0, 3, 1, 2)))
        ref_out = ref["output"].numpy().transpose(0, 3, 1, 2)  # (B, T, nj, nf)
        assert np.abs(np.asarray(got) - ref_out).max() < 2e-4

    def test_autoregressive(self, pair):
        tdec, dec, variables = pair
        rng = np.random.RandomState(5)
        B, T = 1, 10
        z = rng.randn(B, 64).astype(np.float32)
        ycls = np.array([2])
        mask = np.ones((B, T), bool)
        with torch.no_grad():
            ref = tdec({"z": torch.from_numpy(z), "y": torch.from_numpy(ycls),
                        "mask": torch.from_numpy(mask)})
        got = dec.generate(variables, jnp.asarray(z),
                           jax.nn.one_hot(jnp.asarray(ycls), 4),
                           jnp.asarray(mask), jnp.asarray(mask.sum(1)))
        ref_out = ref["output"].numpy().transpose(0, 3, 1, 2)
        assert np.abs(np.asarray(got) - ref_out).max() < 5e-4
