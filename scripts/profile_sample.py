"""Phase profile of sample_one_video: UNet-DDIM vs LFG-decode wall time.

Verdict r1 weak #3: 256^2 throughput (19.4 fps) lacked any attribution. This
script times the two phases of the one-jit sampler separately (each as its
own jitted program) so optimization effort lands where the time is.

Usage: python scripts/profile_sample.py --img-size 256 --frames 200
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(out):
    """block_until_ready is a no-op over the axon tunnel — force by fetching
    one element of the first leaf."""
    import jax
    import numpy as np
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


V5E_PEAK_TFLOPS_BF16 = 197.0


def bench(fn, args, repeats=3, name=""):
    """AOT-compile, time best-of-N, and report achieved TFLOP/s + %-of-peak
    from XLA's own cost model (VERDICT r2 weak #3: MFU accounting)."""
    t0 = time.time()
    compiled = fn.lower(*args).compile()
    out = compiled(*args)
    _force(out)
    print(f"{name}: compile+run {time.time()-t0:.1f}s", file=sys.stderr)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = compiled(*args)
        _force(out)
        best = min(best, time.perf_counter() - t0)
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception:
        flops = 0.0
    if flops:
        tf = flops / best / 1e12
        print(f"{name}: {flops/1e12:.2f} TFLOP/call -> {tf:.1f} TFLOP/s "
              f"achieved = {100*tf/V5E_PEAK_TFLOPS_BF16:.1f}% of v5e bf16 "
              f"peak", file=sys.stderr)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img-size", type=int, default=256)
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--attn", default="local",
                    choices=["full", "local", "pallas"])
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--lfg-dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--lfg-decode-chunk", type=int, default=None)
    ap.add_argument("--decode-only", action="store_true",
                    help="skip the DDIM phase; decode random flow fields")
    args = ap.parse_args()

    from dawn_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from dawn_tpu.models.dm.flow_diffusion import (
        FlowDiffusion, FlowDiffusionConfig)
    from dawn_tpu.models.lfg.generator import LFGGenerator

    chunk = args.lfg_decode_chunk
    if chunk is None:
        chunk = 0 if args.img_size <= 128 else 16
    dt = {"f32": jnp.float32, "bf16": jnp.bfloat16}
    cfg = FlowDiffusionConfig(img_size=args.img_size,
                              sampling_timesteps=args.steps,
                              win_width=40, attn_mode=args.attn,
                              lfg_decode_chunk=chunk,
                              dtype=dt[args.dtype],
                              lfg_dtype=dt[args.lfg_dtype])
    model = FlowDiffusion(cfg)
    print(f"backend={jax.default_backend()} img={args.img_size} "
          f"t={args.frames} attn={args.attn} chunk={chunk} "
          f"dtype={args.dtype}/{args.lfg_dtype}", file=sys.stderr)

    t0 = time.time()
    variables = model.init_variables(jax.random.PRNGKey(0), num_frames=2)
    print(f"init: {time.time()-t0:.1f}s", file=sys.stderr)

    b, t, s, ls = 1, args.frames, args.img_size, cfg.latent_size
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(b, s, s, 3), jnp.float32)
    aud = jnp.asarray(rng.randn(b, t, 1024), jnp.float32)
    pose = jnp.asarray(rng.randn(b, t, 6), jnp.float32)
    eye = jnp.asarray(rng.rand(b, t, 2), jnp.float32)
    bbox = jnp.asarray([[s * .25, s * .75, s * .25, s * .75, s, s]], jnp.float32)

    if args.decode_only:
        pred = jnp.asarray(rng.randn(b, t, ls, ls, 3) * 0.3, jnp.float32)
        tb = 0.0
    else:
        tb, pred = _run_ddim(args, cfg, model, variables, b, t, s, ls, img,
                             aud, pose, eye, bbox)

    # ---- phase 2: LFG decode of all frames ---------------------------------
    grid = pred[..., :2]
    conf = (pred[..., 2:3] + 1.0) * 0.5

    def decode(variables, grid, conf):
        ck = cfg.lfg_decode_chunk
        if ck and ck < t:
            nc = -(-t // ck)
            t_pad = nc * ck
            pad = ((0, 0), (0, t_pad - t)) + ((0, 0),) * 3
            grid_c = jnp.pad(grid, pad).reshape((b, nc, ck) + grid.shape[2:])
            conf_c = jnp.pad(conf, pad).reshape((b, nc, ck) + conf.shape[2:])

            def dec_chunk(gc):
                g, c = gc
                return model.generator.apply(
                    variables["generator"], img, g, c,
                    method=LFGGenerator.decode_with_flow_batched)

            dec = jax.lax.map(dec_chunk,
                              (grid_c.transpose(1, 0, 2, 3, 4, 5),
                               conf_c.transpose(1, 0, 2, 3, 4, 5)))
            out = dec["prediction"].transpose(1, 0, 2, 3, 4, 5)
            # same output contract as the unchunked branch and the
            # production path (flow_diffusion.py chunk decode): (B, T, ...)
            out = out.reshape((out.shape[0], nc * ck) + out.shape[3:])
            return out[:, :grid.shape[1]]
        dec = model.generator.apply(variables["generator"], img, grid, conf,
                                    method=LFGGenerator.decode_with_flow_batched)
        return dec["prediction"]

    dec = jax.jit(decode)
    td, _ = bench(dec, (variables, grid, conf), name="decode")
    print(f"LFG decode ({t} frames @ {s}^2, chunk={chunk}, "
          f"lfg_dtype={args.lfg_dtype}): {td:.3f}s -> {t/td:.1f} fps-equivalent")

    total = tb + td
    if tb:
        print(f"total {total:.3f}s = {t/total:.1f} fps "
              f"(DDIM {100*tb/total:.0f}% / decode {100*td/total:.0f}%)")


def _run_ddim(args, cfg, model, variables, b, t, s, ls, img, aud, pose, eye,
              bbox):
    import jax
    import jax.numpy as jnp

    # ---- phase 1: conditioning + 20-step DDIM scan (no decode) -------------
    def ddim_only(variables, rng, img, aud, pose, eye, bbox):
        from dawn_tpu.models.dm.flow_diffusion import generate_bbox_mask
        from dawn_tpu.models.lfg.generator import LFGGenerator as G
        cond = model.build_condition(aud, pose, eye, pose[:, 0], eye[:, 0])
        fea = model.generator.apply(variables["generator"], img,
                                    method=G.compute_fea)
        mask = generate_bbox_mask(bbox, cfg.img_size)
        memb = model.face_loc.apply(variables["face_loc"], mask)
        fea_t = jnp.broadcast_to(fea[:, None], (b, t) + fea.shape[1:])
        mask_t = jnp.broadcast_to(memb[:, None], (b, t) + memb.shape[1:])

        static = model.unet.apply(
            variables["unet"], jnp.concatenate([fea_t, mask_t], axis=-1),
            jnp.zeros((b,), jnp.int32), precompute_static=True)

        def denoise(x, tvec, c, drop):
            return model.unet.apply(variables["unet"], x, tvec, c, drop,
                                    static_feat=static)

        return model.diffusion.sample(denoise, rng, (b, t, ls, ls, 3),
                                      None, None, cond, 1.0, None)

    ddim = jax.jit(ddim_only)
    tb, pred = bench(ddim, (variables, jax.random.PRNGKey(1), img, aud,
                            pose, eye, bbox), name="ddim")
    print(f"DDIM ({args.steps} steps, attn={args.attn}):"
          f" {tb:.3f}s  -> {t/tb:.1f} fps-equivalent")
    return tb, pred


if __name__ == "__main__":
    main()
