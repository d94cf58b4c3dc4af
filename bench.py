"""DAWN-TPU benchmark: generated frames/sec/chip, end-to-end.

Measures the north-star metric (BASELINE.json): frames/sec/chip at 128^2 with
20 DDIM steps — the FULL sample_one_video program (20-step UNet DDIM scan +
batched LFG flow decode of every frame) as one jitted computation, steady
state (second call, compile cached).

Weights are random (the released .pth checkpoints are not in this image and
egress is zero) — throughput is weight-independent.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

vs_baseline: the reference repo publishes NO throughput numbers
(BASELINE.md). We compare against a documented estimate of the reference on
A100: 200 frames / ~16 s e2e = 12.5 fps (20 DDIM steps over a T=200 windowed-
attention UNet + 200 sequential per-frame AE decodes + per-step host sync).
"""

import argparse
import json
import os
import sys
import time

EST_REF_A100_FPS = 12.5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--img-size", type=int, default=128)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--attn", default="local", choices=["full", "local", "pallas"],
                    help="local = linear-memory sliding-window attention "
                         "(packed Pallas kernel on TPU; 129.3 vs full's "
                         "105.4 fps at 128^2) — the default; full = the "
                         "reference's O(T^2) windowed full attention")
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1,
                    help="identities generated per call (multi-identity "
                         "batched sampling, BASELINE config #5); reported "
                         "fps counts batch*frames")
    ap.add_argument("--lfg-decode-chunk", type=int, default=None,
                    help="decode frames in chunks (default: 0 at 128^2, "
                         "16 at 256^2 where full-res conv activations for "
                         "all frames would OOM; 16 measured fastest)")
    args = ap.parse_args()

    import jax

    # persistent compile cache (helps on standard PJRT backends; the axon
    # remote-AOT tunnel bypasses it — there, cold compile is bounded by
    # restricting Pallas kernels to the shapes where they win, see
    # TemporalAttention's dispatch)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np
    from dawn_tpu.models.dm.flow_diffusion import FlowDiffusion, FlowDiffusionConfig

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)

    chunk = args.lfg_decode_chunk
    if chunk is None:
        chunk = 0 if args.img_size <= 128 else 16
    cfg = FlowDiffusionConfig(img_size=args.img_size,
                              sampling_timesteps=args.steps,
                              win_width=40,
                              attn_mode=args.attn,
                              lfg_decode_chunk=chunk,
                              dtype=jnp.bfloat16 if args.dtype == "bf16"
                              else jnp.float32)
    model = FlowDiffusion(cfg)

    t0 = time.time()
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=2)
    print(f"init: {time.time()-t0:.1f}s", file=sys.stderr)

    b, t, s = args.batch, args.frames, args.img_size
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(b, s, s, 3), jnp.float32)
    aud = jnp.asarray(rng.randn(b, t, 1024), jnp.float32)
    pose = jnp.asarray(rng.randn(b, t, 6), jnp.float32)
    eye = jnp.asarray(rng.rand(b, t, 2), jnp.float32)
    bbox = jnp.asarray(
        np.tile([s * 0.25, s * 0.75, s * 0.25, s * 0.75, s, s], (b, 1)),
        jnp.float32)

    sampler = jax.jit(lambda v, r, *a: model.sample_one_video(v, r, *a))

    def force(out):
        # jax.block_until_ready is a NO-OP over the axon tunnel; only
        # fetching bytes to host forces execution (verify skill gotcha)
        np.asarray(out["sample_out_vid"][0, 0, 0, 0])

    t0 = time.time()
    out = sampler(variables, jax.random.PRNGKey(1), img, aud, pose, eye, bbox)
    force(out)
    print(f"compile+first run: {time.time()-t0:.1f}s", file=sys.stderr)

    times = []
    for i in range(args.repeats):
        t0 = time.time()
        out = sampler(variables, jax.random.PRNGKey(2 + i), img, aud, pose,
                      eye, bbox)
        force(out)
        times.append(time.time() - t0)
    best = min(times)
    fps = b * t / best
    print(f"e2e per call: {times} -> best {best:.3f}s = {fps:.1f} frames/s "
          f"({args.steps} DDIM steps + decode, {s}x{s}, batch {b})",
          file=sys.stderr)
    # e2e seconds per 10s (250-frame) video at this rate
    print(f"e2e sec per 10s video (250 frames): {250.0 * b / fps:.2f}s",
          file=sys.stderr)

    batch_note = f", batch {b}" if b > 1 else ""
    print(json.dumps({
        "metric": f"generated frames/sec/chip ({s}x{s}, {args.steps} DDIM steps, "
                  f"{t} frames e2e incl. LFG decode, attn={args.attn}"
                  f"{batch_note})",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / EST_REF_A100_FPS, 3),
    }))


if __name__ == "__main__":
    main()
