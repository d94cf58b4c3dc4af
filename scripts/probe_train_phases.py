"""Lossless phase attribution of one DM stage-1 train step (VERDICT r4 #1).

Applies the PERF_256.md method to training: the step is decomposed into
independently jitted phases whose inputs are precomputed residents, so each
phase is timed with the same executable boundaries the full step fuses
across. Phases:

  A  frozen LFG teacher        (video -> GT flow/conf + ref feature)
  B  UNet forward (loss only)  (teacher outputs resident)
  C  UNet forward+backward     (value_and_grad of the same loss)
  D  optimizer + EMA           (grads resident)

Full-step time is measured with the SAME harness; sum(A, C, D) vs full tells
whether the composition is lossless (PERF_256.md found it was for inference).
Teacher sub-attribution: each LFG module timed standalone at the step's
(b*t) frame batch.

Usage: python scripts/probe_train_phases.py --batch 4 --frames 20
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(out):
    """AXON GOTCHA: block_until_ready is a NO-OP on this platform — only
    fetching bytes forces execution, so each timed call is forced by pulling
    one scalar of one output leaf to host (tiny fetch, ~tunnel RTT)."""
    import jax
    import numpy as np
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, repeats=8, warmup=1):
    """Pipelined timing: issue ``repeats`` dispatches back-to-back, force
    ONCE at the end. Single-device execution is in-order, so the total is
    repeats*true_time + one tunnel RTT — dividing amortizes the ~25-30 ms
    RTT that dominated per-call timings at these sizes (same lesson as
    probe_unet_phases/scan-amortization)."""
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    best = float("inf")
    for _ in range(2):                      # two rounds, keep the better
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = fn(*args)
        _force(out)
        best = min(best, (time.perf_counter() - t0) / repeats)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--img-size", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--modules", action="store_true",
                    help="also time each LFG teacher module standalone")
    args = ap.parse_args()

    from dawn_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from dawn_tpu.train.train_dm import DMTrainer, DMTrainConfig

    b, t, s = args.batch, args.frames, args.img_size
    cfg = DMTrainConfig(img_size=s, compute_dtype=jnp.bfloat16)
    trainer = DMTrainer(cfg)
    print(f"backend={jax.default_backend()} bs={b} t={t} img={s}",
          file=sys.stderr)

    state = jax.jit(lambda r: trainer.init_state(r, num_frames=t))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(state)

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

    rng = jax.random.PRNGKey(1)

    # ---- full step (same harness, non-donated so it can repeat) ----
    full_step = jax.jit(lambda st, r, bt: trainer.train_step(st, r, bt)[1])
    t_full, _ = timeit(full_step, state, rng, batch, repeats=args.repeats)
    print(f"FULL step:            {t_full*1e3:8.1f} ms")

    # ---- phase A: frozen LFG teacher ----
    video = batch["video"].astype(jnp.float32) / 255.0
    ref_img = video[:, 0]

    teacher_fn = jax.jit(lambda fz, ri, vid:
                         trainer.flow_ae.reconstruct_video(fz["lfg"], ri, vid))
    t_teach, teacher = timeit(teacher_fn, state["frozen"], ref_img, video,
                              repeats=args.repeats)
    print(f"A teacher (full):     {t_teach*1e3:8.1f} ms")
    teacher = {k: v for k, v in teacher.items()
               if k in ("real_vid_grid", "real_vid_conf", "ref_img_fea")}

    # what the LOSS actually consumes (grid/conf/fea only): jit + DCE
    teacher_used = jax.jit(
        lambda fz, ri, vid: {
            k: v for k, v in trainer.flow_ae.reconstruct_video(
                fz["lfg"], ri, vid).items()
            if k in ("real_vid_grid", "real_vid_conf", "ref_img_fea")})
    t_teach_u, _ = timeit(teacher_used, state["frozen"], ref_img, video,
                          repeats=args.repeats)
    print(f"A teacher (loss-DCE): {t_teach_u*1e3:8.1f} ms")

    # deduped variant (what loss_fn actually calls): per-video ref work once
    teacher_dedup = jax.jit(lambda fz, ri, vid:
                            trainer.flow_ae.teacher_outputs(fz["lfg"], ri, vid))
    t_teach_d, teach_d = timeit(teacher_dedup, state["frozen"], ref_img,
                                video, repeats=args.repeats)
    print(f"A teacher (dedup):    {t_teach_d*1e3:8.1f} ms")
    for kk in ("real_vid_grid", "real_vid_conf", "ref_img_fea"):
        err = float(jnp.abs(teach_d[kk] -
                            {k: v for k, v in teacher.items()}[kk]).max())
        print(f"    dedup parity {kk}: max|d| = {err:.2e}")

    # ---- phases B/C: UNet loss with teacher outputs resident ----
    from dawn_tpu.models.dm.flow_diffusion import generate_bbox_mask
    from dawn_tpu.train.train_dm import generate_mouth_mask

    def unet_loss(params, frozen, r, teach, bt):
        c = trainer.config
        pose = bt["pose"][..., : c.pose_dim]
        cond = jnp.concatenate(
            [bt["hubert"], pose - pose[:, :1],
             bt["blink"] - bt["blink"][:, :1]], axis=-1)
        x_start = jnp.concatenate(
            [teach["real_vid_grid"], teach["real_vid_conf"] * 2 - 1], -1)
        bbox_mask = generate_bbox_mask(bt["bbox"], c.img_size)
        mask_emb = trainer.face_loc.apply(frozen["face_loc"], bbox_mask)
        fea = teach["ref_img_fea"]
        fea_t = jnp.broadcast_to(fea[:, None], (b, t) + fea.shape[1:])
        mask_t = jnp.broadcast_to(mask_emb[:, None],
                                  (b, t) + mask_emb.shape[1:])

        def denoise(x, tvec, cc, drop):
            return trainer.unet.apply(
                {"params": trainer._unravel(params)}, x, tvec, cc, drop)

        rng_t, rng_p = jax.random.split(r)
        tvec = jax.random.randint(rng_t, (b,), 0,
                                  trainer.diffusion.timesteps)
        loss_elem, pred_x0, _ = trainer.diffusion.p_losses(
            denoise, rng_p, x_start, tvec, fea_t, mask_t, cond)
        eps_loss = loss_elem.mean()
        floss = jnp.square(pred_x0 - x_start).mean()
        mmask = generate_mouth_mask(bt["mouth_lmk"], c.latent_size,
                                    c.img_size)
        mouth = (loss_elem * mmask).sum() / jnp.maximum(mmask.sum(), 1.0)
        return eps_loss + c.floss_weight * floss + c.mouth_weight * mouth

    fwd = jax.jit(unet_loss)
    t_fwd, _ = timeit(fwd, state["params"], state["frozen"], rng, teacher,
                      batch, repeats=args.repeats)
    print(f"B UNet fwd:           {t_fwd*1e3:8.1f} ms")

    fwdbwd = jax.jit(jax.value_and_grad(unet_loss))
    t_fb, (_, grads) = timeit(fwdbwd, state["params"], state["frozen"], rng,
                              teacher, batch, repeats=args.repeats)
    print(f"C UNet fwd+bwd:       {t_fb*1e3:8.1f} ms")

    # ---- phase D: optimizer + EMA ----
    def opt_step(st, g):
        finite = jnp.isfinite(g).all()
        g = jnp.where(finite, g, jnp.zeros_like(g))
        updates, opt_state = trainer.tx.update(g, st["opt_state"],
                                               st["params"])
        params = st["params"] + updates
        ema = st["ema_params"] * cfg.ema_decay + params * (1 - cfg.ema_decay)
        return params, opt_state, ema

    opt = jax.jit(opt_step)
    t_opt, _ = timeit(opt, state, grads, repeats=args.repeats)
    print(f"D optimizer+EMA:      {t_opt*1e3:8.1f} ms")

    # color jitter (part of the full step, not in A-D above)
    from dawn_tpu.train.augment import color_jitter_video
    cj = jax.jit(color_jitter_video)
    t_cj, _ = timeit(cj, rng, video, repeats=args.repeats)
    print(f"  (color jitter):     {t_cj*1e3:8.1f} ms")

    total = t_teach_u + t_fb + t_opt + t_cj
    print(f"SUM A(DCE)+C+D+cj:    {total*1e3:8.1f} ms   "
          f"vs FULL {t_full*1e3:.1f} ms ({100*total/t_full:.0f}%)")

    if args.modules:
        fa = trainer.flow_ae
        fz = state["frozen"]["lfg"]
        drv = video.reshape(b * t, s, s, 3)
        src = jnp.broadcast_to(ref_img[:, None],
                               (b, t, s, s, 3)).reshape(b * t, s, s, 3)

        rp = jax.jit(lambda v, x: fa.region_predictor.apply(v, x))
        t_rp_drv, drv_params = timeit(rp, fz["region_predictor"], drv,
                                      repeats=args.repeats)
        t_rp_src, src_params = timeit(rp, fz["region_predictor"], src,
                                      repeats=args.repeats)
        t_rp_b, src_params_b = timeit(rp, fz["region_predictor"], ref_img,
                                      repeats=args.repeats)
        bg = jax.jit(lambda v, a, c: fa.bg_predictor.apply(v, a, c))
        t_bg, bg_params = timeit(bg, fz["bg_predictor"], src, drv,
                                 repeats=args.repeats)
        fp = jax.jit(lambda v, x, dp, sp, bgp: fa.flow_predictor.apply(
            v, x, dp, sp, bgp))
        t_fp, motion = timeit(fp, fz["pixelwise_flow_predictor"], src,
                              drv_params, src_params, bg_params,
                              repeats=args.repeats)
        enc = jax.jit(lambda v, x: fa.generator.apply(
            v, x, method=type(fa.generator).compute_fea))
        t_enc, _ = timeit(enc, fz["generator"], src, repeats=args.repeats)
        t_enc_b, _ = timeit(enc, fz["generator"], ref_img,
                            repeats=args.repeats)
        print(f"  teacher modules at (b*t={b*t}) frames:")
        print(f"    region_pred(drv):       {t_rp_drv*1e3:8.1f} ms")
        print(f"    region_pred(src rep):   {t_rp_src*1e3:8.1f} ms   "
              f"(dedup to b={b}: {t_rp_b*1e3:.1f} ms)")
        print(f"    bg_pred:                {t_bg*1e3:8.1f} ms")
        print(f"    flow_pred:              {t_fp*1e3:8.1f} ms")
        print(f"    gen encode(src rep):    {t_enc*1e3:8.1f} ms   "
              f"(dedup to b={b}: {t_enc_b*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
