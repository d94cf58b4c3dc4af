"""DM training-step throughput on the current backend (stage 1 or 2).

One jitted train step: frozen LFG teacher (flow/occlusion GT + ref feature)
+ full-size UNet3D forward/backward + fused flat-param Adam + EMA. The
reference recipe is bs 20 / 20 frames / 128^2 / fp16 AMP over multiple GPUs
(DM_3/train_vdm_..._6D.py:32-66); stage 2 is bs 40 / random 30-40 frame
clips (train..._6D_s2.py:281-292), benched here over the 30/35/40 length
buckets the trainer uses. Reports MFU / HBM-roofline accounting from XLA's
cost model on the compiled step (VERDICT r3 #5).

Usage: python scripts/bench_train.py --batch 4 --frames 20
       python scripts/bench_train.py --stage2 --batch 4
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_TFLOPS_BF16 = 197.0
V5E_PEAK_HBM_GBPS = 819.0


def _costs(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (float(ca.get("flops", 0.0)),
                float(ca.get("bytes accessed", 0.0)))
    except Exception:
        return 0.0, 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--img-size", type=int, default=128)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--stage2", action="store_true",
                    help="stage-2 recipe: frame-0 init condition + the "
                         "30/35/40 length buckets (one compile per bucket; "
                         "reported step time is the bucket mean)")
    ap.add_argument("--json-out", default=None,
                    help="also write the one-line JSON artifact here")
    args = ap.parse_args()

    from dawn_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from dawn_tpu.train.train_dm import DMTrainer, DMTrainConfig

    b, s = args.batch, args.img_size
    stage = 2 if args.stage2 else 1
    frame_buckets = [30, 35, 40] if args.stage2 else [args.frames]
    cfg = DMTrainConfig(
        img_size=s, stage=stage,
        compute_dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32)
    trainer = DMTrainer(cfg)
    print(f"backend={jax.default_backend()} stage={stage} bs={b} "
          f"t={frame_buckets} img={s} dtype={args.dtype}", file=sys.stderr)

    t0 = time.time()
    state = jax.jit(lambda r: trainer.init_state(r, num_frames=frame_buckets[0]))(
        jax.random.PRNGKey(0))
    jax.tree_util.tree_leaves(state)[0].block_until_ready()
    print(f"init: {time.time()-t0:.1f}s", file=sys.stderr)

    def make_batch(t):
        rngnp = np.random.RandomState(0)
        return {
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

    per_bucket = []
    flops_total = bytes_total = 0.0
    for t in frame_buckets:
        batch = make_batch(t)
        # the step donates its state arg; copy so the pristine state
        # survives for the next bucket's first call
        state_b = jax.tree_util.tree_map(jnp.copy, state)
        t0 = time.time()
        # AOT so the SAME executable serves timing and cost analysis
        compiled = step.lower(state_b, jax.random.PRNGKey(1), batch).compile()
        state2, metrics = compiled(state_b, jax.random.PRNGKey(1), batch)
        loss = float(metrics["total"])   # forces (block_until_ready no-ops
                                         # over the axon tunnel)
        print(f"t={t}: compile+first step {time.time()-t0:.1f}s "
              f"loss={loss:.4f}", file=sys.stderr)

        best = float("inf")
        for i in range(args.repeats):
            t0 = time.perf_counter()
            state2, metrics = compiled(state2, jax.random.PRNGKey(2 + i), batch)
            float(metrics["total"])
            best = min(best, time.perf_counter() - t0)
        fl, by = _costs(compiled)
        flops_total += fl
        bytes_total += by
        per_bucket.append(best)
        print(f"t={t}: step {best*1e3:.1f} ms -> {b/best:.2f} ex/s/chip "
              f"({b*t/best:.1f} frames/s) "
              f"finite={float(metrics['grads_finite'])}", file=sys.stderr)
        # free this bucket's HBM before the next bucket's first step: a
        # bs-4/40-frame fwd+bwd peaks near the 16 GB chip, and keeping the
        # previous bucket's state/batch/executable resident OOM'd the
        # 30->35 transition (measured round 4)
        for leaf in jax.tree_util.tree_leaves((state2, metrics, batch)):
            if hasattr(leaf, "delete"):
                leaf.delete()
        del state2, metrics, batch, compiled
        import gc
        gc.collect()
    mean_step = sum(per_bucket) / len(per_bucket)
    mean_t = sum(frame_buckets) / len(frame_buckets)
    tflops = (flops_total / len(per_bucket)) / mean_step / 1e12
    gbps = (bytes_total / len(per_bucket)) / mean_step / 1e9
    mfu = 100.0 * tflops / V5E_PEAK_TFLOPS_BF16
    hbm = 100.0 * gbps / V5E_PEAK_HBM_GBPS
    print(f"train step (stage {stage}): {mean_step*1e3:.1f} ms mean over "
          f"buckets {frame_buckets} -> {b/mean_step:.2f} examples/s/chip "
          f"({b*mean_t/mean_step:.1f} frames/s/chip)")
    if flops_total:
        print(f"XLA cost model: {tflops:.1f} TFLOP/s = {mfu:.1f}% of v5e "
              f"bf16 peak; {gbps:.0f} GB/s = {hbm:.0f}% of HBM peak",
              file=sys.stderr)
    if args.json_out:
        import json
        tdesc = (f"{frame_buckets} frame buckets" if args.stage2
                 else f"{args.frames} frames")
        line = json.dumps({
            "metric": (f"DM stage-{stage} train examples/sec/chip (bs {b}, "
                       f"{tdesc}, {s}x{s}, {args.dtype}, incl. frozen LFG "
                       f"teacher + Adam + EMA)"),
            "value": round(b / mean_step, 2),
            "unit": "examples/sec/chip",
            "bs": b,
            "step_ms": round(mean_step * 1e3, 1),
            "frames_per_sec": round(b * mean_t / mean_step, 1),
            "mfu_pct": round(mfu, 2),
            "hbm_pct": round(hbm, 1),
            "hbm_note": ("XLA cost-model 'bytes accessed' / wall vs 819 "
                         "GB/s; logical bytes count once per consumer, so "
                         ">100% means fusion-reused operands, not physical "
                         "traffic — an upper bound, like bench.py's"),
        })
        with open(args.json_out, "w") as f:
            f.write(line + "\n")
        print(line)


if __name__ == "__main__":
    main()
