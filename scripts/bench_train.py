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
    ap.add_argument("--remat", default="none", choices=["none", "dots", "full"],
                    help="jax.checkpoint policy around the UNet apply in the "
                         "loss — trades recompute FLOPs for backward-pass "
                         "HBM activation traffic (PERF_TRAIN.md A/B)")
    ap.add_argument("--cached-teacher", action="store_true",
                    help="bench the cached-teacher step (teacher outputs "
                         "precomputed per clip and reused across epochs — "
                         "scripts/train_dm.py --teacher-cache); also reports "
                         "the one-time teacher precompute cost the cache "
                         "amortizes (PERF_TRAIN.md)")
    ap.add_argument("--input-pipeline", action="store_true",
                    help="measure the step fed by the REAL input pipeline "
                         "(synthetic chunked-npy HDTF layout in /tmp -> C++ "
                         "NpyPrefetcher -> batches_prefetched overlapped "
                         "with the device step) vs resident batches "
                         "(VERDICT r4 #7)")
    args = ap.parse_args()
    assert not (args.cached_teacher and args.input_pipeline), \
        "--input-pipeline measures the RAW step fed by real I/O; run the " \
        "two modes separately"

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
        img_size=s, stage=stage, remat=args.remat,
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

    teacher_ms = None
    if args.cached_teacher:
        teacher_fn = jax.jit(trainer.teacher_precompute)

        def to_cached(batch):
            teacher = teacher_fn(state["frozen"], batch["video"])
            out = {k: v for k, v in batch.items() if k != "video"}
            out.update(teacher)
            return out

    per_bucket = []
    flops_total = bytes_total = 0.0
    for t in frame_buckets:
        batch = make_batch(t)
        if args.cached_teacher:
            # one-time cost the cache amortizes (epoch 1 computes + stores,
            # epoch 2+ loads): timed with the same fetch-forced harness
            t0 = time.perf_counter()
            cached = to_cached(batch)
            float(jnp.sum(cached["ref_img_fea"]))
            best_t = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                cached = to_cached(batch)
                float(jnp.sum(cached["ref_img_fea"]))
                best_t = min(best_t, time.perf_counter() - t0)
            teacher_ms = best_t * 1e3
            print(f"t={t}: teacher precompute (amortized by the cache): "
                  f"{teacher_ms:.1f} ms", file=sys.stderr)
            batch = cached
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

    pipeline_stats = None
    if args.input_pipeline:
        # real input path: synthetic chunked-npy HDTF layout -> C++
        # NpyPrefetcher threads -> depth-2 host queue, overlapped with the
        # device step (VERDICT r4 #7). Batch shapes/dtypes match make_batch
        # exactly so the SAME compiled step executable serves both.
        import pickle
        import shutil
        import tempfile
        from dawn_tpu.train.data import BLOCK, HDTFVideoDataset

        t = frame_buckets[0]
        root = tempfile.mkdtemp(prefix="dawn_ipbench_")
        n_videos, total_frames = 8, 100
        rngd = np.random.RandomState(0)
        lengths = {}
        try:
            for vi in range(n_videos):
                name = f"vid_{vi:03d}"
                lengths[name] = total_frames
                kinds = [("frames", (s, s, 3), np.uint8),
                         ("hubert", (1024,), np.float32),
                         ("pose", (7,), np.float32),
                         ("eye", (8,), np.float32),
                         ("lmk", (68, 2), np.float32)]
                for kind, shape, dt in kinds:
                    d = os.path.join(root, kind, name)
                    os.makedirs(d, exist_ok=True)
                    for bi in range(-(-total_frames // BLOCK)):
                        nfr = min(BLOCK, total_frames - bi * BLOCK)
                        arr = rngd.rand(nfr, *shape)
                        arr = ((arr * 255).astype(np.uint8) if dt == np.uint8
                               else (arr * s).astype(dt) if kind == "lmk"
                               else arr.astype(dt))
                        np.save(os.path.join(d, f"chunk_{bi:04d}.npy"), arr)
            ld = os.path.join(root, "length_dict.pkl")
            with open(ld, "wb") as f:
                pickle.dump(lengths, f)
            ds = HDTFVideoDataset(
                os.path.join(root, "frames"), os.path.join(root, "hubert"),
                os.path.join(root, "pose"), os.path.join(root, "eye"), ld,
                lmk_dir=os.path.join(root, "lmk"), num_frames=t)

            def to_device(raw):
                # uint8 video crosses the host->HBM link at 1/4 the f32
                # bytes (the cast runs on device); runs on the PREFETCH
                # WORKER so the transfer overlaps the current step
                raw["pose"] = raw["pose"][..., :6]        # make_batch layout
                return {k: jnp.asarray(v) for k, v in raw.items()}

            batch0 = to_device(next(iter(ds.batches(b, 1))))
            state_c = jax.tree_util.tree_map(jnp.copy, state)
            compiled_ip = step.lower(state_c, jax.random.PRNGKey(1),
                                     batch0).compile()
            # warmup (first step after compile)
            state_c, m = compiled_ip(state_c, jax.random.PRNGKey(1), batch0)
            float(m["total"])
            # same-program resident reference (uint8-video program, batch
            # already on device)
            resident = float("inf")
            for i in range(args.repeats):
                t0 = time.perf_counter()
                state_c, m = compiled_ip(state_c, jax.random.PRNGKey(2 + i),
                                         batch0)
                float(m["total"])
                resident = min(resident, time.perf_counter() - t0)

            n_steps = 30
            t0 = time.perf_counter()
            for i, dev_batch in enumerate(
                    ds.batches_prefetched(b, n_steps, transform=to_device)):
                state_c, m = compiled_ip(state_c,
                                         jax.random.PRNGKey(10 + i),
                                         dev_batch)
                float(m["total"])
            overlapped = (time.perf_counter() - t0) / n_steps

            # non-overlapped reference: same reads + transfer, synchronous
            t0 = time.perf_counter()
            for i, raw in enumerate(ds.batches(b, n_steps)):
                batch_i = to_device(raw)
                state_c, m = compiled_ip(state_c,
                                         jax.random.PRNGKey(50 + i), batch_i)
                float(m["total"])
            sync = (time.perf_counter() - t0) / n_steps
        finally:
            shutil.rmtree(root, ignore_errors=True)
        busy = resident / overlapped
        pipeline_stats = {
            "overlapped_step_ms": round(overlapped * 1e3, 1),
            "sync_step_ms": round(sync * 1e3, 1),
            "resident_step_ms": round(resident * 1e3, 1),
            "device_busy_frac": round(busy, 3),
        }
        print(f"input pipeline: overlapped {overlapped*1e3:.1f} ms/step vs "
              f"sync {sync*1e3:.1f} vs resident {resident*1e3:.1f} -> "
              f"device busy {100*busy:.0f}% of the overlapped wall")
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
        teacher_desc = ("cached teacher (precompute amortized across "
                        "epochs) + Adam + EMA" if args.cached_teacher
                        else "frozen LFG teacher + Adam + EMA")
        record = {
            "metric": (f"DM stage-{stage} train examples/sec/chip (bs {b}, "
                       f"{tdesc}, {s}x{s}, {args.dtype}, incl. "
                       f"{teacher_desc})"),
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
        }
        if teacher_ms is not None:
            record["teacher_precompute_ms"] = round(teacher_ms, 1)
        if pipeline_stats is not None:
            record["input_pipeline"] = pipeline_stats
        line = json.dumps(record)
        with open(args.json_out, "w") as f:
            f.write(line + "\n")
        print(line)


if __name__ == "__main__":
    main()
