"""Component probes for the 256^2 DDIM bottleneck.

Times, standalone on the current backend:
  1. one UNet3D forward at 256^2 latent shapes (the per-DDIM-step cost)
  2. the dynamic-thresholding quantile (jnp.quantile -> TPU sort) per step
  3. the non-UNet DDIM math (q/sigma updates) per step

Usage: python scripts/probe_unet_phases.py --img-size 256 --frames 200
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, variants, repeats=4):
    """AXON GOTCHA: block_until_ready is a NO-OP on this platform (a 1.1
    TFLOP matmul 'completes' in 0.1 ms; only fetching bytes forces it). fn
    must therefore return a SCALAR, and each timed call is forced with
    float() — a tiny fetch whose tunnel RTT is subtracted via rtt_baseline.
    """
    t0 = time.time()
    float(fn(*variants[0]))
    compile_s = time.time() - t0
    best = float("inf")
    for i in range(repeats):
        args = variants[1 + i % (len(variants) - 1)]
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, compile_s


def rtt_baseline():
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: jnp.sum(x))
    xs = [jnp.full((8,), float(i)) for i in range(5)]
    float(f(xs[0]))
    best = float("inf")
    for i in range(1, 5):
        t0 = time.perf_counter()
        float(f(xs[i]))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img-size", type=int, default=256)
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--attn", default="local")
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--modules", action="store_true",
                    help="also decompose per-module at each level shape")
    ap.add_argument("--extras", action="store_true",
                    help="with --modules: also probe the up-path/head/"
                         "init/resample pieces the level loop misses")
    args = ap.parse_args()

    from dawn_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from dawn_tpu.models.dm.unet3d import Unet3D

    b, t = 1, args.frames
    ls = args.img_size // 4
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    print(f"backend={jax.default_backend()} latent={ls} t={t} "
          f"attn={args.attn}", file=sys.stderr)

    model = Unet3D(dim=64, channels=275, cond_pose=6, win_width=40,
                   attn_mode=args.attn, dtype=dt)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, t, ls, ls, 275), jnp.float32)
    tv = jnp.zeros((b,), jnp.int32)
    cond = jnp.asarray(rng.randn(b, t, 1032), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, tv, cond)

    rtt = rtt_baseline()
    print(f"tunnel RTT baseline: {rtt*1e3:.1f} ms", file=sys.stderr)

    fwd = jax.jit(lambda v, x, tv, c: jnp.sum(model.apply(v, x, tv, c)))
    variants = [(variables, x + i * 1e-4, tv, cond) for i in range(5)]
    best, comp = timeit(fwd, variants)
    best = max(best - rtt, 0.0)
    print(f"UNet forward: {best*1e3:.1f} ms/step (compile {comp:.0f}s) "
          f"-> x20 = {best*20:.2f}s per video")

    # dynamic thresholding: quantile of |x0| over everything but batch
    x0 = jnp.asarray(rng.randn(b, t, ls, ls, 3), jnp.float32)

    def dyn_thres(x0):
        flat = jnp.abs(x0).reshape(b, -1)
        s = jnp.quantile(flat, 0.9, axis=-1)
        s = jnp.maximum(s, 1.0)[:, None, None, None, None]
        return jnp.sum(jnp.clip(x0, -s, s) / s)

    qv = [(x0 + i * 1e-4,) for i in range(5)]
    best, comp = timeit(jax.jit(dyn_thres), qv)
    best = max(best - rtt, 0.0)
    print(f"dyn-thres quantile: {best*1e3:.1f} ms/step (compile {comp:.0f}s) "
          f"-> x20 = {best*20:.2f}s per video")

    if not args.modules:
        return

    # ---- per-module decomposition at each UNet level shape -----------------
    from dawn_tpu.models.dm.unet3d import (
        TemporalAttention, SpatialLinearAttention, ResnetBlockCaMul)
    from dawn_tpu.ops.t5bias import t5_bias_windowed_vector

    emb = jnp.asarray(rng.randn(32, 8), jnp.float32)
    bias_vec = t5_bias_windowed_vector(emb, 40, 32, 32)
    cond_f = jnp.asarray(rng.randn(b, t, 1032), jnp.float32)

    levels = [(ls, 64), (ls // 2, 128), (ls // 4, 256), (ls // 8, 512)]
    for s_sz, ch in levels:
        xl = jnp.asarray(rng.randn(b, t, s_sz, s_sz, ch), dt)
        xv = [(xl + i * 1e-3,) for i in range(5)]

        ta = TemporalAttention(mode=args.attn, window=40, dtype=dt)
        y = xl.transpose(0, 2, 3, 1, 4).reshape(b, s_sz * s_sz, t, ch)
        tav = jax.jit(ta.init)(jax.random.PRNGKey(1), y, None, bias_vec)
        f = jax.jit(lambda v, x: jnp.sum(ta.apply(
            v, x.transpose(0, 2, 3, 1, 4).reshape(b, s_sz * s_sz, t, ch),
            None, bias_vec)))
        best, comp = timeit(lambda x: f(tav, x), xv)
        print(f"  temporal-attn {s_sz:3d}^2 c{ch:3d}: "
              f"{max(best-rtt,0)*1e3:7.1f} ms (compile {comp:.0f}s)")

        sl = SpatialLinearAttention(dtype=dt)
        slv = jax.jit(sl.init)(jax.random.PRNGKey(2), xl)
        f = jax.jit(lambda v, x: jnp.sum(sl.apply(v, x)))
        best, comp = timeit(lambda x: f(slv, x), xv)
        print(f"  spatial-linear {s_sz:3d}^2 c{ch:3d}: "
              f"{max(best-rtt,0)*1e3:7.1f} ms (compile {comp:.0f}s)")

        rb = ResnetBlockCaMul(features=ch, time_emb_dim=256, cond_aud=1024,
                              cond_pose=6, cond_eye=2, dtype=dt)
        temb = jnp.asarray(rng.randn(b, 256), jnp.float32)
        rbv = jax.jit(rb.init)(jax.random.PRNGKey(3), xl, temb, cond_f)
        f = jax.jit(lambda v, x: jnp.sum(rb.apply(v, x, temb, cond_f)))
        best, comp = timeit(lambda x: f(rbv, x), xv)
        print(f"  resnet-ca-mul  {s_sz:3d}^2 c{ch:3d}: "
              f"{max(best-rtt,0)*1e3:7.1f} ms (compile {comp:.0f}s)")

    if not getattr(args, "extras", False):
        return

    # ---- everything the level loop above misses ---------------------------
    # (up-path resnets see concat channels; the top level also runs
    # init_conv.noisy+static-add, an extra temporal attn, and the two
    # output-head resnets on cat(x, r) — all at the most expensive spatial
    # size. Plus the down/upsample convs and the REAL dynamic-thresholding
    # quantile the sampler uses, ops/quantile.py.)
    from dawn_tpu.models.dm.unet3d import (Downsample, ResnetBlockCaMul,
                                           SplitInitConv, Upsample)
    from dawn_tpu.ops.quantile import quantile_nonneg

    temb = jnp.asarray(rng.randn(b, 256), jnp.float32)
    x_top = jnp.asarray(rng.randn(b, t, ls, ls, 64), dt)
    x_cat = jnp.asarray(rng.randn(b, t, ls, ls, 128), dt)
    catv = [(x_cat + i * 1e-3,) for i in range(5)]
    topv = [(x_top + i * 1e-3,) for i in range(5)]

    rb_up = ResnetBlockCaMul(features=64, time_emb_dim=256, cond_aud=1024,
                             cond_pose=6, cond_eye=2, dtype=dt)
    rbv = jax.jit(rb_up.init)(jax.random.PRNGKey(4), x_cat, temb, cond_f)
    f = jax.jit(lambda v, x: jnp.sum(rb_up.apply(v, x, temb, cond_f)))
    best, comp = timeit(lambda x: f(rbv, x), catv)
    print(f"  up-resnet   {ls:3d}^2 c128->64: {max(best-rtt,0)*1e3:7.1f} ms "
          f"(compile {comp:.0f}s)")

    rb_head = ResnetBlockCaMul(features=64, dtype=dt)
    hv = jax.jit(rb_head.init)(jax.random.PRNGKey(5), x_cat)
    f = jax.jit(lambda v, x: jnp.sum(rb_head.apply(v, x)))
    best, comp = timeit(lambda x: f(hv, x), catv)
    print(f"  head-resnet {ls:3d}^2 c128->64 (x2 heads): "
          f"{max(best-rtt,0)*1e3:7.1f} ms (compile {comp:.0f}s)")

    ic = SplitInitConv(64, 275, 7, dt)
    x_noisy = jnp.asarray(rng.randn(b * t, ls, ls, 3), dt)
    static = jnp.asarray(rng.randn(b * t, ls, ls, 64), dt)
    icv = jax.jit(lambda k: ic.init(k, jnp.zeros((1, ls, ls, 275), dt),
                                    method="full"))(jax.random.PRNGKey(6))
    f = jax.jit(lambda v, x: jnp.sum(
        ic.apply(v, x, method="noisy") + static))
    best, comp = timeit(lambda x: f(icv, x),
                        [(x_noisy + i * 1e-3,) for i in range(5)])
    print(f"  init-conv(noisy)+static add: {max(best-rtt,0)*1e3:7.1f} ms "
          f"(compile {comp:.0f}s)")

    dsm = Downsample(64, dtype=dt)
    dv = jax.jit(dsm.init)(jax.random.PRNGKey(7), x_top)
    f = jax.jit(lambda v, x: jnp.sum(dsm.apply(v, x)))
    best, comp = timeit(lambda x: f(dv, x), topv)
    print(f"  downsample  {ls:3d}^2 c64: {max(best-rtt,0)*1e3:7.1f} ms "
          f"(compile {comp:.0f}s)")

    x_half = jnp.asarray(rng.randn(b, t, ls // 2, ls // 2, 64), dt)
    usm = Upsample(64, dtype=dt)
    uv = jax.jit(usm.init)(jax.random.PRNGKey(8), x_half)
    f = jax.jit(lambda v, x: jnp.sum(usm.apply(v, x)))
    best, comp = timeit(lambda x: f(uv, x),
                        [(x_half + i * 1e-3,) for i in range(5)])
    print(f"  upsample    {ls//2:3d}^2->{ls}^2 c64: "
          f"{max(best-rtt,0)*1e3:7.1f} ms (compile {comp:.0f}s)")

    x0f = jnp.asarray(rng.randn(b, t * ls * ls * 3).astype(np.float32))
    f = jax.jit(lambda x: jnp.sum(quantile_nonneg(jnp.abs(x), 0.9)))
    best, comp = timeit(f, [(x0f + i * 1e-4,) for i in range(5)])
    print(f"  quantile_nonneg (sampler's): {max(best-rtt,0)*1e3:7.1f} ms "
          f"(compile {comp:.0f}s)")


if __name__ == "__main__":
    main()
