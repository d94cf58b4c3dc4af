"""PBnet evaluation driver — the evaluate_cvae_norm_eye_pose pipeline.

Capability parity with PBnet/src/evaluate/evaluate_cvae_norm_eye_pose.py +
tvae_eval_norm_eye_pose.py: for each seed in range(niter), generate drives for
every held-out HDTF video, dump generated and ground-truth sequences under
<workdir>/eval_pred/<seed>/ and <workdir>/eval_gt/<seed>/ (the layout the
reference's tables/ post-processing consumes), then compute the ACTOR metric
set on raw motion features — Frechet distance (action2motion/fid.py),
diversity (diversity.py), temporal smoothness and L1 — and write metrics.json.

The reference's STGCN branch (stgcn/evaluate.py) is available two ways:
``--stgcn-ckpt`` loads a reference recognizer .tar (for SMPL-joint motion
dumps; the graph comes from the checkpoint's A buffer), and ``--stgcn``
scores DAWN's own 6/8-d head sequences in the feature space of a seeded
random-init recognizer over the 'dawn_head' graph (random-feature FID — a
deterministic relative signal; labels are per-video identities).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="PBnet .pth.tar (opt.yaml sibling)")
    ap.add_argument("--kind", default="pose", choices=["pose", "blink", "both"])
    ap.add_argument("--hubert-dir", required=True)
    ap.add_argument("--pose-dir", required=True)
    ap.add_argument("--eye-dir", required=True)
    ap.add_argument("--length-dict", required=True)
    ap.add_argument("--workdir", default="runs/pbnet_eval")
    ap.add_argument("--niter", type=int, default=3)
    ap.add_argument("--num-frames", type=int, default=100)
    ap.add_argument("--stgcn", action="store_true",
                    help="also score in a seeded dawn_head STGCN feature "
                         "space (stgcn/evaluate.py capability)")
    ap.add_argument("--stgcn-ckpt", default=None,
                    help="reference recognizer .tar (uestc_rot6d_stgcn "
                         "style); overrides --stgcn's random-init model")
    ap.add_argument("--stgcn-classes", type=int, default=None,
                    help="recognizer classes (ckpt) / label count "
                         "(default: number of test videos)")
    args = ap.parse_args()

    import numpy as np
    from dawn_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from dawn_tpu.train.data import PBnetPoseDataset
    from dawn_tpu.pipeline.pose_blink import load_pbnet_with_opt, MAX_VALS_8, MIN_VALS_8
    from dawn_tpu.evaluate.metrics import (
        frechet_distance, diversity, mean_acceleration, temporal_smoothness,
        l1_reconstruction)

    dims = {"pose": (6, 0), "blink": (2, 0), "both": (6, 2)}[args.kind]
    model, variables = load_pbnet_with_opt(args.ckpt, *dims)

    dataset = PBnetPoseDataset(args.hubert_dir, args.pose_dir, args.eye_dir,
                               args.length_dict, mode="test",
                               num_frames=args.num_frames)
    print(f"test videos: {len(dataset.names)}")

    stgcn_pack = None
    if args.stgcn or args.stgcn_ckpt:
        num_classes = args.stgcn_classes or len(dataset.names)
        if args.stgcn_ckpt:
            from dawn_tpu.evaluate.stgcn_eval import load_stgcn
            # in_channels/num_class come from the checkpoint itself; the
            # head-sequence feature dim must equal its V*C to reshape into
            # the recognizer's joint layout (ADVICE r4)
            smodel, svars = load_stgcn(args.stgcn_ckpt)
            feat_dim = sum(dims)
            v_ck = int(np.asarray(smodel.graph).shape[1])
            if feat_dim != v_ck * smodel.in_channels:
                raise SystemExit(
                    f"--stgcn-ckpt recognizer expects (V={v_ck}, "
                    f"C={smodel.in_channels}) motions = {v_ck * smodel.in_channels} "
                    f"values/frame, but --kind {args.kind} dumps {feat_dim}; "
                    f"use motion dumps matching the checkpoint layout or the "
                    f"built-in --stgcn dawn_head recognizer")
            num_classes = smodel.num_class
        else:
            from dawn_tpu.evaluate.stgcn_eval import make_dawn_head_stgcn
            smodel, svars = make_dawn_head_stgcn(num_classes,
                                                 jax.random.PRNGKey(1234))
        from dawn_tpu.evaluate.stgcn_eval import STGCNEvaluation
        stgcn_pack = (STGCNEvaluation(smodel, svars, num_classes),
                      np.asarray(smodel.graph).shape[1])

    metrics_all = {}
    for seed in range(args.niter):
        pred_dir = os.path.join(args.workdir, "eval_pred", str(seed))
        gt_dir = os.path.join(args.workdir, "eval_gt", str(seed))
        os.makedirs(pred_dir, exist_ok=True)
        os.makedirs(gt_dir, exist_ok=True)

        preds, gts = [], []
        rng = jax.random.PRNGKey(seed)
        # every seed pass evaluates the SAME clip windows — only the
        # generation noise varies; otherwise seed-to-seed variance conflates
        # clip selection with sampling stochasticity
        dataset.rng = np.random.RandomState(0)
        for idx in range(len(dataset.names)):
            s = dataset.sample(idx)
            if args.kind == "pose":
                gt = s["pose"]
            elif args.kind == "blink":
                gt = s["eye"]
            else:
                gt = np.concatenate([s["pose"], s["eye"]], -1)
            rng, r = jax.random.split(rng)
            out = np.asarray(model.generate(
                variables, r, jnp.asarray(gt[None, 0]),
                jnp.asarray(s["hubert"][None])))[0]
            pred = out + gt[0]
            np.save(os.path.join(pred_dir, s["name"]), pred)
            np.save(os.path.join(gt_dir, s["name"]), gt)
            preds.append(pred)
            gts.append(gt)

        # raw-motion-feature statistics: mean over frames per sequence
        fp = np.stack([p.mean(0) for p in preds])
        fg = np.stack([g.mean(0) for g in gts])
        m = {
            "fid": float(frechet_distance(fp, fg)),
            "diversity_pred": float(diversity(fp)),
            "diversity_gt": float(diversity(fg)),
            "smoothness_pred": float(np.mean(
                [temporal_smoothness(p) for p in preds])),
            "smoothness_gt": float(np.mean(
                [temporal_smoothness(g) for g in gts])),
            "l1": float(np.mean([l1_reconstruction(p, g)
                                 for p, g in zip(preds, gts)])),
            # othermetrics/acceleration.py: mean ||second difference||
            "acceleration_pred": mean_acceleration(preds),
            "acceleration_gt": mean_acceleration(gts),
        }
        if stgcn_pack is not None:
            ev, v_nodes = stgcn_pack
            # (T, D) head sequences -> (N, T, V, C) recognizer motions:
            # dawn_head scores D scalars as V=D/C=1 nodes (zero-padded to
            # the 8-node graph for pose-only/blink-only runs); a ckpt
            # recognizer expects its own (V, C) joint layout
            def as_motion(seqs):
                x = np.stack(seqs).astype(np.float32)
                if args.stgcn_ckpt:
                    return x.reshape(x.shape[0], x.shape[1], v_nodes, -1)
                if x.shape[-1] < v_nodes:
                    x = np.pad(x, ((0, 0), (0, 0),
                                   (0, v_nodes - x.shape[-1])))
                return x[..., None]
            labels = np.arange(len(preds)) % ev.num_classes
            loaders = {"gt": {"train": (as_motion(gts), labels),
                              "test": (as_motion(gts), labels)},
                       "gen": {"train": (as_motion(preds), labels),
                               "test": (as_motion(preds), labels)}}
            sm = ev.evaluate(loaders)
            m.update({f"stgcn_{k}": float(v) for k, v in sm.items()
                      if k.endswith("_test")})
        metrics_all[seed] = m
        print(f"seed {seed}: " + " ".join(f"{k}={v:.4f}" for k, v in m.items()))

    path = os.path.join(args.workdir, "metrics.json")
    with open(path, "w") as f:
        json.dump(metrics_all, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
