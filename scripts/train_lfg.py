"""LFG flow-autoencoder training entry.

Capability parity with LFG/run_hdtf.py + LFG/train.py: YAML-driven model
params, seeded start, frame-pair sampling, rolling checkpoints.

Usage:
  python scripts/train_lfg.py --config configs/lfg_hdtf128.yaml \
      --frames-dir <video frame dirs> [--vgg19 vgg19.pth]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def frame_pair_batches(frames_dir, batch_size, img_size, steps, rng):
    """Random (source, driving) frame pairs from per-video chunk dirs
    (frames_dataset.py:135-167 semantics over the chunked-npy layout)."""
    import numpy as np
    from dawn_tpu.train.data import (read_block_range, BLOCK,
                                     HDTF_TEST_SPLIT, HDTF_BAD_VIDEOS)
    videos = [v for v in sorted(os.listdir(frames_dir))
              if v not in HDTF_TEST_SPLIT and v not in HDTF_BAD_VIDEOS]
    lengths = {}
    for _ in range(steps):
        srcs, drvs = [], []
        while len(srcs) < batch_size:
            name = videos[rng.randint(len(videos))]
            vd = os.path.join(frames_dir, name)
            if name not in lengths:
                import glob
                chunks = sorted(glob.glob(os.path.join(vd, "chunk_*.npy")))
                if not chunks:
                    continue
                lengths[name] = ((len(chunks) - 1) * BLOCK
                                 + len(np.load(chunks[-1])))
            n = lengths[name]
            i, j = rng.randint(n), rng.randint(n)
            srcs.append(read_block_range(vd, i, i + 1)[0])
            drvs.append(read_block_range(vd, j, j + 1)[0])
        # augmentation_params from config/hdtf128.yaml:28-37 (flip + jitter)
        from dawn_tpu.train.augment import augment_frame_pair
        pairs = [augment_frame_pair(rng, s.astype(np.float32) / 255.0,
                                    d.astype(np.float32) / 255.0)
                 for s, d in zip(srcs, drvs)]
        yield {"source": np.stack([p[0] for p in pairs]),
               "driving": np.stack([p[1] for p in pairs])}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/lfg_hdtf128.yaml")
    ap.add_argument("--frames-dir", required=True)
    ap.add_argument("--vgg19", default=None, help="torchvision vgg19 .pth")
    ap.add_argument("--workdir", default="runs/lfg")
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--log-every", type=int, default=20)
    ap.add_argument("--ckpt-every", type=int, default=1000)
    ap.add_argument("--tensorboard", action="store_true",
                    help="also write TensorBoard event files to <workdir>/tb")
    args = ap.parse_args()

    import yaml
    import numpy as np
    from dawn_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from dawn_tpu.train.train_lfg import LFGTrainer, LFGTrainConfig
    from dawn_tpu.parallel.mesh import make_mesh
    from dawn_tpu.parallel.distributed import maybe_initialize_distributed
    from dawn_tpu.utils.checkpoint import save_checkpoint
    from dawn_tpu.utils.misc import Logger, setup_seed

    # must run before anything touches jax.devices() (backend init)
    if maybe_initialize_distributed():
        print(f"distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {len(jax.devices())} global devices")

    with open(args.config) as f:
        y = yaml.safe_load(f)
    setup_seed(1234)
    os.makedirs(args.workdir, exist_ok=True)
    sys.stdout = Logger(os.path.join(args.workdir, "train.log"))

    tp = y["train_params"]
    bs = args.batch_size or int(tp.get("batch_size", 16))
    cfg = LFGTrainConfig(
        img_size=y["model_params"].get("frame_shape", 128)
        if isinstance(y["model_params"].get("frame_shape"), int) else 128,
        lr=float(tp["lr"]),
        scales=tuple(tp["scales"]),
        perceptual_weights=tuple(tp["loss_weights"]["perceptual"]),
        equivariance_shift=tp["loss_weights"]["equivariance_shift"],
        equivariance_affine=tp["loss_weights"]["equivariance_affine"],
        # under jit/GSPMD the batch is a single logical array, so plain BN
        # statistics are already GLOBAL across 'data' shards — XLA inserts
        # the collective. sync_bn_axis (the explicit psum) is only for
        # pmap/shard_map contexts; naming an axis under plain jit would
        # raise "unbound axis name".
        sync_bn_axis=None,
        epoch_milestones=tuple(tp.get("epoch_milestones", (60, 90))),
        steps_per_epoch=max(1, (len(os.listdir(args.frames_dir))
                                * int(tp.get("num_repeats", 100))) // bs))
    trainer = LFGTrainer(cfg)

    state = trainer.init_state(jax.random.PRNGKey(0))
    if args.vgg19:
        import torch
        from dawn_tpu.models.lfg.vgg import convert_vgg19_features
        sd = torch.load(args.vgg19, map_location="cpu")
        state["vgg"] = convert_vgg19_features(sd)
        print(f"loaded VGG19 weights from {args.vgg19}")

    mesh = make_mesh(seq_parallel=1, axis_names=("data", "seq"))
    step_fn = trainer.make_sharded_step(mesh)
    rng = np.random.RandomState(0)
    log = open(os.path.join(args.workdir, "metrics.jsonl"), "a")
    tb = None
    if args.tensorboard:
        from dawn_tpu.utils.tensorboard import EventWriter
        tb = EventWriter(os.path.join(args.workdir, "tb"))
    t0 = time.time()
    with mesh:
        for step, batch in enumerate(
                frame_pair_batches(args.frames_dir, bs, cfg.img_size,
                                   args.steps, rng)):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step_fn(state, jax.random.PRNGKey(step), batch)
            if step % args.log_every == 0:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                m["step"], m["wall"] = step, time.time() - t0
                log.write(json.dumps(m) + "\n")
                log.flush()
                if tb is not None:
                    tb.add_scalars(m, step, prefix="train/")
                    tb.flush()
                print(f"step {step}: total={m['total']:.4f} "
                      f"perc={m['perceptual']:.4f}")
            if step > 0 and step % args.ckpt_every == 0:
                save_checkpoint(os.path.join(args.workdir, "ckpt"), state, step)
    save_checkpoint(os.path.join(args.workdir, "ckpt"), state, args.steps)


if __name__ == "__main__":
    main()
