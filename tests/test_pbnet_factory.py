"""PBnet factory + architecture-family smoke tests.

Covers the reference's get_model mechanism (get_model.py:19-35,
parser/model.py:30-44): modelname parsing, every registered archiname
instantiating and running forward/generate, joint 8-d reemb5 models, and
the loss registry wiring through compute_loss.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dawn_tpu.models.pbnet import (
    ARCHINAMES, CVAE, PBnetParams, get_model, parse_modelname,
)

B, T = 2, 10


def test_parse_modelname():
    assert parse_modelname("cvae_transformerreemb6_rc_kl_reg") == (
        "cvae", "transformerreemb6", ["rc", "kl", "reg"])
    with pytest.raises(NotImplementedError):
        parse_modelname("gan_transformerreemb6_rc")
    with pytest.raises(NotImplementedError):
        parse_modelname("cvae_resnet_rc")
    with pytest.raises(NotImplementedError):
        parse_modelname("cvae_transformerreemb6")


def test_get_model_lambdas():
    m = get_model({"modelname": "cvae_transformerreemb6_rc_kl_ssim",
                   "lambda_ssim": 0.5, "pos_dim": 6, "eye_dim": 0})
    assert m.hp.lambdas == {"rc": 1.0, "kl": 1.0, "ssim": 0.5}


@pytest.mark.parametrize("arch", ARCHINAMES)
def test_arch_forward_and_generate(arch):
    # reemb5 drives the joint 8-d (pose+eye) checkpoints
    dims = (6, 2) if arch == "transformerreemb5" else (6, 0)
    # the mlp arch is fixed-length with a /8-strided ResUnet over frames
    t = 16 if arch == "mlp" else T
    hp = PBnetParams(pos_dim=dims[0], eye_dim=dims[1], archiname=arch,
                     num_layers=1, dropout=0.0, num_frames=t)
    model = CVAE(hp, deterministic=True)
    rng = jax.random.PRNGKey(0)
    variables = model.init_variables(rng, num_frames=t)

    d = hp.feature_dim
    x = jnp.asarray(np.random.RandomState(0).randn(B, t, d), jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).randn(B, t, 1024), jnp.float32)

    out = model.forward(variables, rng, x, y)
    assert out["output"].shape == (B, t, d)
    if model.latent_kind == "seq":
        assert out["mu"].shape == (B, model.latent_width)
    else:
        assert out["mu"].shape == (B, t, hp.latent_dim)

    gen = model.generate(variables, rng, x[:, 0], y)
    assert gen.shape == (B, t, d)
    assert np.isfinite(np.asarray(gen)).all()

    mixed, losses = model.compute_loss(out, out["x_delta"], None, epoch=20000,
                                       rng=rng)
    assert np.isfinite(float(mixed))
    assert set(losses) == set(hp.lambdas) | {"mixed"}


def test_unknown_archiname_raises():
    with pytest.raises(NotImplementedError):
        CVAE(PBnetParams(archiname="resnet34"))


def test_full_loss_registry_through_compute_loss():
    hp = PBnetParams(pos_dim=6, eye_dim=0, num_layers=1, dropout=0.0,
                     lambdas={"rc": 1.0, "rcw": 1.0, "kl": 1.0, "reg": 0.1,
                              "ssim": 1.0, "var": 0.1, "mmd": 1.0})
    model = CVAE(hp, deterministic=True)
    rng = jax.random.PRNGKey(0)
    variables = model.init_variables(rng, num_frames=T)
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, 6), jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).randn(B, T, 1024), jnp.float32)
    out = model.forward(variables, rng, x, y)
    mixed, losses = model.compute_loss(out, out["x_delta"], None, epoch=30000,
                                       rng=rng)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
