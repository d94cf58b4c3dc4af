"""Generate the committed golden-output regression fixtures.

VERDICT r3 #6: perf rounds must not silently change sampler numerics. This
freezes `sample_one_video` at the RELEASED topology (UNet dim 64, mults
(1,2,4,8), channels 275; LFG block_expansion 64 / max_features 512 / 6
bottleneck blocks) with seeded weights and a fixed noise_seq, on the CPU
backend with highest matmul precision (the same environment the test suite
runs in), and commits strided output pixels. tests/test_golden_frames.py
asserts EXACT equality — any lsb-level numeric drift in ops/model/sampler
code fails the suite.

Intentional-change escape hatch: regenerate and commit the new fixture
together with the change that explains it. Fixtures MUST be born inside
the test environment (the CPU result depends on conftest's
xla_force_host_platform_device_count flag):

    DAWN_REGEN_GOLDEN=1 python -m pytest tests/test_golden_frames.py

Running this script directly also works for eyeballing values, but its
output drifts ~2e-5 from the in-suite result and must not be committed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# must match tests/conftest.py: CPU backend, f32, highest matmul precision
os.environ["JAX_PLATFORMS"] = "cpu"

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")

# (img_size, frames, ddim steps, spatial stride of the committed pixels)
CASES = {128: (128, 8, 4, 16), 256: (256, 8, 2, 32)}


def generate(img_size: int):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np
    from dawn_tpu.models.dm.flow_diffusion import (FlowDiffusion,
                                                   FlowDiffusionConfig)

    s, t, steps, stride = CASES[img_size]
    cfg = FlowDiffusionConfig(img_size=s, sampling_timesteps=steps,
                              win_width=40, attn_mode="local",
                              lfg_decode_chunk=0)
    model = FlowDiffusion(cfg)
    variables = model.init_variables(jax.random.PRNGKey(7), num_frames=2)

    b, ls = 1, cfg.latent_size
    rng = np.random.RandomState(42)
    img = jnp.asarray(rng.rand(b, s, s, 3), jnp.float32)
    aud = jnp.asarray(rng.randn(b, t, 1024) * 0.5, jnp.float32)
    pose = jnp.asarray(rng.randn(b, t, 6) * 0.1, jnp.float32)
    eye = jnp.asarray(rng.rand(b, t, 2), jnp.float32)
    bbox = jnp.asarray([[s * .25, s * .75, s * .25, s * .75, s, s]],
                       jnp.float32)
    noise_seq = jax.random.normal(jax.random.PRNGKey(8),
                                  (steps + 1, b, t, ls, ls, 3))

    out = jax.jit(lambda v, *a: model.sample_one_video(v, jax.random.PRNGKey(9), *a,
                                                       noise_seq=noise_seq))(
        variables, img, aud, pose, eye, bbox)
    vid = np.asarray(out["sample_out_vid"])          # (1, t, s, s, 3)
    grid = np.asarray(out["sample_vid_grid"])        # (1, t, ls, ls, 2)
    return {
        "pixels": vid[:, :, ::stride, ::stride, :].astype(np.float32),
        "grid": grid[:, :, :: max(1, stride // 4), :: max(1, stride // 4), :]
        .astype(np.float32),
        "checksum": np.float64(vid.astype(np.float64).sum()),
    }


def main():
    import numpy as np
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for size in CASES:
        data = generate(size)
        path = os.path.join(GOLDEN_DIR, f"golden_{size}.npz")
        np.savez_compressed(path, **data)
        print(f"{path}: pixels {data['pixels'].shape} "
              f"checksum {float(data['checksum']):.6f}")


if __name__ == "__main__":
    main()
