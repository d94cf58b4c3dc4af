"""End-to-end smoke drive: one image + conditions -> video frames.

Runs the full FlowDiffusion pipeline (DDIM scan + batched LFG decode) with
random weights on small shapes. Prints per-stage timings and writes the
frames to PNG so a human can look at them. Usage:

    python scripts/smoke_e2e.py [--img-size 64] [--frames 8] [--steps 2]
                                [--platform cpu|axon] [--out /tmp/dawn_smoke]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img-size", type=int, default=64)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--attn", default="full", choices=["full", "local"])
    ap.add_argument("--out", default="/tmp/dawn_smoke")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from dawn_tpu.models.dm.flow_diffusion import FlowDiffusion, FlowDiffusionConfig

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    cfg = FlowDiffusionConfig(img_size=args.img_size,
                              sampling_timesteps=args.steps,
                              attn_mode=args.attn)
    model = FlowDiffusion(cfg)

    t0 = time.time()
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=2)
    print(f"init_variables: {time.time()-t0:.1f}s")

    b, t = 1, args.frames
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(b, args.img_size, args.img_size, 3), jnp.float32)
    aud = jnp.asarray(rng.randn(b, t, 1024), jnp.float32)
    pose = jnp.asarray(rng.randn(b, t, 6), jnp.float32)
    eye = jnp.asarray(rng.rand(b, t, 2), jnp.float32)
    s = args.img_size
    bbox = jnp.asarray([[s * 0.25, s * 0.75, s * 0.25, s * 0.75, s, s]], jnp.float32)

    sampler = jax.jit(lambda v, r, *a: model.sample_one_video(v, r, *a))
    t0 = time.time()
    out = sampler(variables, jax.random.PRNGKey(1), img, aud, pose, eye, bbox)
    vid = np.asarray(out["sample_out_vid"])
    print(f"first call (compile+run): {time.time()-t0:.1f}s")

    t0 = time.time()
    out = sampler(variables, jax.random.PRNGKey(2), img, aud, pose, eye, bbox)
    np.asarray(out["sample_out_vid"])
    print(f"second call (cached): {time.time()-t0:.2f}s")

    assert vid.shape == (b, t, s, s, 3), vid.shape
    assert np.isfinite(vid).all(), "non-finite frames!"
    print(f"sample_out_vid shape={vid.shape} range=({vid.min():.3f},{vid.max():.3f})")
    print(f"flow grid range=({np.asarray(out['sample_vid_grid']).min():.3f},"
          f"{np.asarray(out['sample_vid_grid']).max():.3f})")

    os.makedirs(args.out, exist_ok=True)
    try:
        import cv2
        for i in range(min(t, 4)):
            frame = (np.clip(vid[0, i], 0, 1) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(args.out, f"frame_{i:03d}.png"),
                        cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        print(f"wrote frames to {args.out}")
    except Exception as e:  # cv2 optional
        print(f"frame dump skipped: {e}")
    print("E2E SMOKE OK")


if __name__ == "__main__":
    main()
