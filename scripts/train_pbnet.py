"""PBnet CVAE + PatchGAN training entry (pose or blink model).

Capability parity with PBnet/src/train/train_cvae_ganloss_ann_eye.py
(dataset switch, eye/pose dims, AdamW + cosine for G and D, per-epoch
snapshots + opt.yaml persistence so inference can reconstruct the model).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", choices=["pose", "blink"], default="pose")
    ap.add_argument("--hubert-dir", required=True)
    ap.add_argument("--pose-dir", required=True)
    ap.add_argument("--eye-dir", required=True)
    ap.add_argument("--length-dict", required=True)
    ap.add_argument("--workdir", default="runs/pbnet")
    ap.add_argument("--steps", type=int, default=100000)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--num-frames", type=int, default=100)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--ckpt-every", type=int, default=5000)
    ap.add_argument("--tensorboard", action="store_true",
                    help="also write TensorBoard event files to <workdir>/tb")
    args = ap.parse_args()

    import yaml
    import numpy as np
    from dawn_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from dawn_tpu.train.train_pbnet import PBnetTrainer, PBnetTrainConfig
    from dawn_tpu.train.data import PBnetPoseDataset
    from dawn_tpu.parallel.mesh import make_mesh
    from dawn_tpu.parallel.distributed import maybe_initialize_distributed
    from dawn_tpu.utils.checkpoint import save_checkpoint
    from dawn_tpu.utils.misc import Logger, setup_seed

    # must run before anything touches jax.devices() (backend init)
    if maybe_initialize_distributed():
        print(f"distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {len(jax.devices())} global devices")

    setup_seed(1234)
    workdir = os.path.join(args.workdir, args.kind)
    os.makedirs(workdir, exist_ok=True)
    sys.stdout = Logger(os.path.join(workdir, "train.log"))

    trainer = PBnetTrainer(PBnetTrainConfig(kind=args.kind,
                                            total_steps=args.steps))
    # persist opt.yaml so inference can rebuild the arch (parser/tools.py)
    hp = trainer.model.hp
    with open(os.path.join(workdir, "opt.yaml"), "w") as f:
        yaml.safe_dump({
            "modeltype": "cvae", "archiname": hp.archiname,
            "latent_dim": hp.latent_dim, "ff_size": hp.ff_size,
            "num_layers": hp.num_layers, "num_heads": hp.num_heads,
            "num_buckets": hp.num_buckets, "max_distance": hp.max_distance,
            "audio_dim": hp.audio_dim, "pos_dim": hp.pos_dim,
            "eye_dim": hp.eye_dim, "lambdas": dict(hp.lambdas),
        }, f)

    dataset = PBnetPoseDataset(args.hubert_dir, args.pose_dir, args.eye_dir,
                               args.length_dict, num_frames=args.num_frames)
    print(f"dataset: {len(dataset.names)} videos")

    state = trainer.init_state(jax.random.PRNGKey(0), args.num_frames)
    mesh = make_mesh(seq_parallel=1)
    step_fn = trainer.make_sharded_step(mesh)
    log = open(os.path.join(workdir, "metrics.jsonl"), "a")
    tb = None
    if args.tensorboard:
        from dawn_tpu.utils.tensorboard import EventWriter
        tb = EventWriter(os.path.join(workdir, "tb"))
    t0 = time.time()
    # KL annealing is EPOCH-based in the reference (cae.py:72-76); one epoch
    # = one pass over the video list at this batch size
    steps_per_epoch = max(1, len(dataset.names) // max(1, args.batch_size))
    with mesh:
        for step, raw in enumerate(dataset.batches(args.batch_size, args.steps)):
            x = raw["pose"] if args.kind == "pose" else raw["eye"]
            batch = {"x": jnp.asarray(x), "hubert": jnp.asarray(raw["hubert"])}
            state, metrics = step_fn(state, jax.random.PRNGKey(step), batch,
                                     jnp.float32(step // steps_per_epoch))
            if step % args.log_every == 0:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                m["step"], m["wall"] = step, time.time() - t0
                log.write(json.dumps(m) + "\n")
                log.flush()
                if tb is not None:
                    tb.add_scalars(m, step, prefix="train/")
                    tb.flush()
                print(f"step {step}: g={m['g_total']:.4f} d={m['d_loss']:.4f} "
                      f"rc={m.get('rc', 0):.4f}")
            if step > 0 and step % args.ckpt_every == 0:
                save_checkpoint(os.path.join(workdir, "ckpt"), state, step)
    save_checkpoint(os.path.join(workdir, "ckpt"), state, args.steps)


if __name__ == "__main__":
    main()
