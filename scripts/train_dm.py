"""DM diffusion training entry (stage 1 / stage 2).

Capability parity with DM_3/train_vdm_hdtf_wpose_plus_faceemb_init_cond_
liploss_6D.py and ..._6D_s2.py: config-driven constants, per-interval metric
logging, rolling checkpoints, periodic sample snapshots. Runs on a
('data', 'seq') mesh when more than one device is visible.

Usage:
  python scripts/train_dm.py --config configs/dm_train_stage1.yaml \
      --frames-dir ... --hubert-dir ... --pose-dir ... --eye-dir ... \
      --length-dict ... [--lfg-ckpt LFG_128.pth] [--stage 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/dm_train_stage1.yaml")
    ap.add_argument("--frames-dir", required=True)
    ap.add_argument("--hubert-dir", required=True)
    ap.add_argument("--pose-dir", required=True)
    ap.add_argument("--eye-dir", required=True)
    ap.add_argument("--lmk-dir", default=None)
    ap.add_argument("--length-dict", required=True)
    ap.add_argument("--lfg-ckpt", default=None)
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--workdir", default="runs/dm")
    ap.add_argument("--restore", action="store_true")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--ckpt-every", type=int, default=500)
    ap.add_argument("--sample-every", type=int, default=1000,
                    help="write PNG monitor grids of real/fake flow decodes "
                         "(the reference's GIF snapshots, train...6D.py:354)")
    ap.add_argument("--tensorboard", action="store_true",
                    help="also write TensorBoard event files to "
                         "<workdir>/tb (the reference's SummaryWriter "
                         "channel, train...6D.py:174,319-321)")
    ap.add_argument("--teacher-cache", default=None, metavar="DIR",
                    help="cache frozen-LFG teacher outputs per (video, "
                         "start) clip and reuse them across epochs — skips "
                         "the teacher pass (~29%% of the step, "
                         "PERF_TRAIN.md) after the first epoch. Quantizes "
                         "clip starts to --teacher-cache-stride and "
                         "disables color jitter (which only acts through "
                         "the teacher); ~1.3 MB disk per cached clip")
    ap.add_argument("--teacher-cache-stride", type=int, default=None,
                    help="clip-start grid for the cache key space "
                         "(default: num_frames // 2 — half-overlapping "
                         "clips)")
    ap.add_argument("--teacher-cache-f16", action="store_true",
                    help="store cache entries as float16 (halves disk; "
                         "~5e-4 quantization on [-1,1] teacher tensors)")
    ap.add_argument("--prefetch", action="store_true",
                    help="overlap batch assembly (C++ NpyPrefetcher chunk "
                         "reads) with the device step via a depth-2 host "
                         "queue (the reference CudaDataLoader's design)")
    args = ap.parse_args()

    import yaml
    import numpy as np
    from dawn_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from dawn_tpu.train.train_dm import DMTrainer, DMTrainConfig
    from dawn_tpu.train.data import HDTFVideoDataset
    from dawn_tpu.parallel.mesh import make_mesh
    from dawn_tpu.parallel.distributed import maybe_initialize_distributed
    from dawn_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint, restored_step
    from dawn_tpu.utils.misc import Logger, AverageMeter, setup_seed

    # must run before ANY backend touch — DMTrainer's GaussianDiffusion
    # materializes schedule buffers with jnp.asarray at construction
    if maybe_initialize_distributed():
        print(f"distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, "
              f"{len(jax.devices())} global devices")

    with open(args.config) as f:
        cfg_yaml = yaml.safe_load(f)
    setup_seed(cfg_yaml.get("random_seed", 1234))
    sys.stdout = Logger(os.path.join(args.workdir, "train.log"))

    cfg = DMTrainConfig(
        img_size=cfg_yaml["img_size"],
        win_width=cfg_yaml.get("win_width", 20),
        stage=args.stage,
        lr=cfg_yaml["lr"], total_steps=cfg_yaml["total_steps"],
        grad_clip=cfg_yaml["grad_clip"],
        floss_weight=cfg_yaml["floss_weight"],
        mouth_weight=cfg_yaml["mouth_weight"],
        null_cond_prob=cfg_yaml["null_cond_prob"],
        fea_channels=cfg_yaml.get("fea_channels", 256),
        remat=cfg_yaml.get("remat", "none"))
    # optional topology overrides (tiny test configs / ablations): yaml
    # `unet: {dim, dim_mults, attn_heads, ...}` and `lfg: {generator: {...},
    # region: {...}, bg: {...}, flow: {...}}`
    unet_kw = dict(cfg_yaml.get("unet") or {})
    if "dim_mults" in unet_kw:
        unet_kw["dim_mults"] = tuple(unet_kw["dim_mults"])
    flow_ae = None
    if cfg_yaml.get("lfg"):
        from dawn_tpu.models.lfg.flow_ae import FlowAE
        lf = cfg_yaml["lfg"]
        flow_ae = FlowAE(generator_kw=lf.get("generator"),
                         region_kw=lf.get("region"),
                         bg_kw=lf.get("bg"), flow_kw=lf.get("flow"))
    trainer = DMTrainer(cfg, flow_ae=flow_ae, unet_kw=unet_kw or None)

    # stage 2: per-step random clip length 30-40 diffused frames
    # (train..._s2.py:281-292 samples randint(30, 40) + 1 total frames) —
    # quantized to a small set of length BUCKETS so XLA compiles one program
    # per bucket instead of one per length (same trick as the inference
    # frame bucketing, pipeline/generator.py:81-86).
    if args.stage == 2:
        s2_min = cfg_yaml.get("num_frames_min", 30)
        s2_max = cfg_yaml.get("num_frames_max", 40)
        s2_buckets = sorted(set(
            cfg_yaml.get("frame_buckets", [s2_min, (s2_min + s2_max) // 2,
                                           s2_max])))
        num_frames = s2_max + 1           # dataset clips carry frame 0 too
    else:
        num_frames = cfg_yaml.get("num_frames", 20)
    stride = None
    if args.teacher_cache:
        stride = args.teacher_cache_stride or max(1, num_frames // 2)
    dataset = HDTFVideoDataset(args.frames_dir, args.hubert_dir, args.pose_dir,
                               args.eye_dir, args.length_dict,
                               lmk_dir=args.lmk_dir, num_frames=num_frames,
                               start_stride=stride)
    print(f"dataset: {len(dataset)} videos, {num_frames} frames/clip"
          + (f", stage-2 buckets {s2_buckets}" if args.stage == 2 else ""))

    n_dev = len(jax.devices())
    mesh = make_mesh(seq_parallel=2 if n_dev % 2 == 0 and n_dev > 1 else 1)
    print(f"mesh: {mesh.shape}")

    state = trainer.init_state(jax.random.PRNGKey(0), num_frames=num_frames)
    if args.lfg_ckpt:
        from dawn_tpu.weights import convert_lfg_checkpoint
        lfg = convert_lfg_checkpoint(args.lfg_ckpt)
        state["frozen"]["lfg"] = lfg
        print(f"loaded frozen LFG from {args.lfg_ckpt}")
    start = 0
    ckpt_dir = os.path.join(args.workdir, "ckpt")
    if args.restore:
        restored = restore_checkpoint(ckpt_dir, state)
        if restored is not None:
            state = restored
            start = restored_step(state)
            print(f"restored from step {start}")

    step_fn = trainer.make_sharded_step(mesh)
    total = args.steps or cfg_yaml["total_steps"]
    bs = cfg_yaml["batch_size"]
    meters = {k: AverageMeter(k) for k in ("total", "loss", "floss", "mouth_loss")}
    metrics_log = open(os.path.join(args.workdir, "metrics.jsonl"), "a")
    tb = None
    if args.tensorboard:
        from dawn_tpu.utils.tensorboard import EventWriter
        tb = EventWriter(os.path.join(args.workdir, "tb"))

    rng_len = np.random.RandomState(cfg_yaml.get("random_seed", 1234))
    _TIME_KEYS = ("video", "hubert", "pose", "blink", "mouth_lmk")
    # cached teacher tensors are already frame-0-split (stage 2): the grid /
    # conf rows correspond to diffused frames, so a stage-2 L-bucket slices
    # them to :L while the raw modality rows slice to :L+1
    _TEACHER_TIME_KEYS = ("real_vid_grid", "real_vid_conf")

    cache = None
    if args.teacher_cache:
        from dawn_tpu.train.data import TeacherCache
        cache = TeacherCache(args.teacher_cache,
                             dtype=np.float16 if args.teacher_cache_f16
                             else np.float32)
        teacher_fn = jax.jit(trainer.teacher_precompute)
        print(f"teacher cache: {args.teacher_cache} (start stride {stride}, "
              f"{'f16' if args.teacher_cache_f16 else 'f32'} entries; "
              f"color jitter inactive — it only acts through the teacher)")

    t0 = time.time()
    batch_iter = (dataset.batches_prefetched(bs, total - start,
                                             with_meta=cache is not None)
                  if args.prefetch else
                  dataset.batches(bs, total - start,
                                  with_meta=cache is not None))
    with mesh:
        for step, item in enumerate(batch_iter, start):
            if cache is not None:
                raw, meta = item
                batch = cache.convert_batch(
                    raw, meta,
                    lambda v: teacher_fn(state["frozen"], jnp.asarray(v)))
            else:
                batch = item
            if args.stage == 2:
                # diffused length ~ U[min, max], snapped to a bucket; +1 for
                # the split-off init frame
                want = rng_len.randint(s2_min, s2_max + 1)
                L = min(s2_buckets, key=lambda q: abs(q - want))
                batch = {k: (v[:, : L + 1] if k in _TIME_KEYS else
                             v[:, :L] if k in _TEACHER_TIME_KEYS else v)
                         for k, v in batch.items()}
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            load_t = time.time() - t0
            if load_t > 1.0:
                print(f"unnormal load {load_t:.2f}s at step {step}")
            state, metrics = step_fn(state, jax.random.PRNGKey(step), batch)
            if step % args.log_every == 0:
                metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
                for k, m in meters.items():
                    m.update(metrics[k])
                metrics["step"] = step
                metrics["wall"] = time.time() - t0
                if cache is not None and (cache.hits or cache.misses):
                    metrics["teacher_cache_hit_rate"] = round(
                        cache.hits / (cache.hits + cache.misses), 4)
                metrics_log.write(json.dumps(metrics) + "\n")
                metrics_log.flush()
                if tb is not None:
                    tb.add_scalars(metrics, step, prefix="train/")
                    tb.flush()
                print(f"step {step}: " + " ".join(str(m) for m in meters.values()))
            if step > start and step % args.ckpt_every == 0:
                save_checkpoint(ckpt_dir, state, step)
            if args.sample_every and step > start and step % args.sample_every == 0:
                from dawn_tpu.utils.misc import save_snapshot_grid
                snap_dir = os.path.join(args.workdir, "imgshots")
                os.makedirs(snap_dir, exist_ok=True)
                if cache is not None:
                    # snapshots decode real/fake flow from raw frames; the
                    # cached batch carries none, but the raw pre-conversion
                    # batch does (sliced to the monitor's few frames)
                    snap_batch = {k: jnp.asarray(v) for k, v in raw.items()}
                else:
                    snap_batch = batch
                snaps = trainer.snapshot(state, jax.random.PRNGKey(step + 1),
                                         snap_batch)
                save_snapshot_grid(
                    os.path.join(snap_dir, f"step_{step:07d}.png"), snaps)
            t0 = time.time()
    save_checkpoint(ckpt_dir, state, total)


if __name__ == "__main__":
    main()
