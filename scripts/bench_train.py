"""DM stage-1 training-step throughput on the current backend.

One jitted train step: frozen LFG teacher (flow/occlusion GT + ref feature)
+ full-size UNet3D forward/backward + fused flat-param Adam + EMA. The
reference recipe is bs 20 / 20 frames / 128^2 / fp16 AMP over multiple GPUs
(DM_3/train_vdm_..._6D.py:32-66); this measures examples/sec on ONE chip so
the data-parallel mesh scaling can be projected.

Usage: python scripts/bench_train.py --batch 4 --frames 20
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--img-size", type=int, default=128)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--json-out", default=None,
                    help="also write the one-line JSON artifact here")
    args = ap.parse_args()

    from dawn_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from dawn_tpu.train.train_dm import DMTrainer, DMTrainConfig

    b, t, s = args.batch, args.frames, args.img_size
    cfg = DMTrainConfig(
        img_size=s,
        compute_dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32)
    trainer = DMTrainer(cfg)
    print(f"backend={jax.default_backend()} bs={b} t={t} img={s} "
          f"dtype={args.dtype}", file=sys.stderr)

    t0 = time.time()
    state = jax.jit(lambda r: trainer.init_state(r, num_frames=t))(
        jax.random.PRNGKey(0))
    jax.tree_util.tree_leaves(state)[0].block_until_ready()
    print(f"init: {time.time()-t0:.1f}s", file=sys.stderr)

    rngnp = np.random.RandomState(0)
    batch = {
        "video": jnp.asarray(rngnp.rand(b, t, s, s, 3) * 255, jnp.float32),
        "hubert": jnp.asarray(rngnp.randn(b, t, 1024), jnp.float32),
        "pose": jnp.asarray(rngnp.randn(b, t, 6), jnp.float32),
        "blink": jnp.asarray(rngnp.rand(b, t, 2), jnp.float32),
        "bbox": jnp.asarray(
            np.tile([s * .25, s * .75, s * .25, s * .75, s, s], (b, 1)),
            jnp.float32),
        "mouth_lmk": jnp.asarray(rngnp.rand(b, t, 19, 2) * s, jnp.float32),
    }

    step = jax.jit(trainer.train_step, donate_argnums=(0,))

    t0 = time.time()
    state, metrics = step(state, jax.random.PRNGKey(1), batch)
    # force (block_until_ready is a no-op over the axon tunnel)
    print(f"compile+first step: {time.time()-t0:.1f}s "
          f"loss={float(metrics['total']):.4f}", file=sys.stderr)

    best = float("inf")
    for i in range(args.repeats):
        t0 = time.perf_counter()
        state, metrics = step(state, jax.random.PRNGKey(2 + i), batch)
        float(metrics["total"])
        best = min(best, time.perf_counter() - t0)
    print(f"train step: {best*1e3:.1f} ms  -> {b/best:.2f} examples/s/chip "
          f"({b*t/best:.1f} frames/s/chip)  finite={float(metrics['grads_finite'])}")
    if args.json_out:
        import json
        line = json.dumps({
            "metric": (f"DM stage-1 train examples/sec/chip (bs {b}, {t} "
                       f"frames, {s}x{s}, {args.dtype}, incl. frozen LFG "
                       f"teacher + Adam + EMA)"),
            "value": round(b / best, 2),
            "unit": "examples/sec/chip",
            "step_ms": round(best * 1e3, 1),
            "frames_per_sec": round(b * t / best, 1),
        })
        with open(args.json_out, "w") as f:
            f.write(line + "\n")
        print(line)


if __name__ == "__main__":
    main()
