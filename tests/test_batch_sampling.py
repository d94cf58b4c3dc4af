"""Multi-identity batched sampling: correctness vs b=1 path + mesh pjit."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dawn_tpu.models.dm.flow_diffusion import FlowDiffusion, FlowDiffusionConfig
from dawn_tpu.models.dm.unet3d import Unet3D
from dawn_tpu.parallel.mesh import make_mesh

B, T, S = 2, 4, 32


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = FlowDiffusionConfig(img_size=S, sampling_timesteps=2, win_width=2,
                              dim_mults=(1, 2))
    model = FlowDiffusion(cfg)
    # shrink the UNet (same structure) for CPU test speed
    model.unet = Unet3D(dim=16, dim_mults=(1, 2), channels=275, cond_pose=6,
                        win_width=2)
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=T)
    return model, variables


def _batch_inputs(b):
    r = np.random.RandomState(0)
    return dict(
        img=jnp.asarray(r.rand(b, S, S, 3), jnp.float32),
        aud=jnp.asarray(r.randn(b, T, 1024), jnp.float32),
        pose=jnp.asarray(r.randn(b, T, 6), jnp.float32),
        eye=jnp.asarray(r.rand(b, T, 2), jnp.float32),
        bbox=jnp.asarray(np.tile([S * .25, S * .75, S * .25, S * .75, S, S],
                                 (b, 1)), jnp.float32),
    )


def test_batched_shapes(model_and_vars):
    model, variables = model_and_vars
    x = _batch_inputs(B)
    out = model.sample_one_video(variables, jax.random.PRNGKey(1), x["img"],
                                 x["aud"], x["pose"], x["eye"], x["bbox"])
    assert out["sample_out_vid"].shape == (B, T, S, S, 3)
    assert out["sample_vid_grid"].shape == (B, T, S // 4, S // 4, 2)
    assert np.isfinite(np.asarray(out["sample_out_vid"])).all()


def test_batch_decode_matches_single(model_and_vars):
    """The batched LFG decode must equal the per-identity decode."""
    from dawn_tpu.models.lfg.generator import LFGGenerator
    model, variables = model_and_vars
    r = np.random.RandomState(1)
    imgs = jnp.asarray(r.rand(B, S, S, 3), jnp.float32)
    grid = jnp.asarray(r.rand(B, T, S // 4, S // 4, 2) * 2 - 1, jnp.float32)
    conf = jnp.asarray(r.rand(B, T, S // 4, S // 4, 1), jnp.float32)
    dec = model.generator.apply(variables["generator"], imgs, grid, conf,
                                method=LFGGenerator.decode_with_flow_batched)
    for i in range(B):
        ref = model.generator.apply(variables["generator"], imgs[i: i + 1],
                                    grid[i], conf[i],
                                    method=LFGGenerator.decode_with_flow)
        np.testing.assert_allclose(np.asarray(dec["prediction"][i]),
                                   np.asarray(ref["prediction"]),
                                   rtol=1e-5, atol=1e-5)


def test_mesh_batch_sampler(model_and_vars):
    """pjit over an 8-device CPU mesh, batch sharded over 'data'."""
    model, variables = model_and_vars
    mesh = make_mesh(8, seq_parallel=1)
    x = _batch_inputs(8)
    with mesh:
        sampler = model.make_batch_sampler(mesh)
        out = sampler(variables, jax.random.PRNGKey(2), x["img"], x["aud"],
                      x["pose"], x["eye"], x["bbox"],
                      x["pose"][:, 0], x["eye"][:, 0])
    assert out["sample_out_vid"].shape == (8, T, S, S, 3)
    assert np.isfinite(np.asarray(out["sample_out_vid"])).all()


def test_lfg_decode_bf16_close_to_f32(model_and_vars):
    """bf16 LFG decode path: same params, output f32, close to f32 decode."""
    import jax.numpy as jnp
    from dawn_tpu.models.lfg.generator import LFGGenerator
    model, variables = model_and_vars
    gen16 = LFGGenerator(dtype=jnp.bfloat16)
    r = np.random.RandomState(2)
    imgs = jnp.asarray(r.rand(1, S, S, 3), jnp.float32)
    grid = jnp.asarray(r.rand(1, T, S // 4, S // 4, 2) * 2 - 1, jnp.float32)
    conf = jnp.asarray(r.rand(1, T, S // 4, S // 4, 1), jnp.float32)
    ref = model.generator.apply(variables["generator"], imgs, grid, conf,
                                method=LFGGenerator.decode_with_flow_batched)
    out = gen16.apply(variables["generator"], imgs, grid, conf,
                      method=LFGGenerator.decode_with_flow_batched)
    assert out["prediction"].dtype == jnp.float32
    err = np.abs(np.asarray(out["prediction"] - ref["prediction"])).mean()
    assert err < 0.02, err


def test_chunked_lfg_decode_matches(model_and_vars):
    """lfg_decode_chunk (the 256^2 HBM-bounding path) is numerically exact."""
    from dawn_tpu.models.dm.flow_diffusion import FlowDiffusion, FlowDiffusionConfig
    from dawn_tpu.models.dm.unet3d import Unet3D
    model, variables = model_and_vars
    cfg2 = FlowDiffusionConfig(img_size=S, sampling_timesteps=2, win_width=2,
                               dim_mults=(1, 2), lfg_decode_chunk=3)
    m2 = FlowDiffusion(cfg2)
    m2.unet = Unet3D(dim=16, dim_mults=(1, 2), channels=275, cond_pose=6,
                     win_width=2)
    x = _batch_inputs(1)
    o0 = model.sample_one_video(variables, jax.random.PRNGKey(3), x["img"],
                                x["aud"], x["pose"], x["eye"], x["bbox"])
    o2 = m2.sample_one_video(variables, jax.random.PRNGKey(3), x["img"],
                             x["aud"], x["pose"], x["eye"], x["bbox"])
    np.testing.assert_allclose(np.asarray(o2["sample_out_vid"]),
                               np.asarray(o0["sample_out_vid"]), atol=1e-5)
