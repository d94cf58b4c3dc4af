"""Micro-probes of the 256^2 / 128^2 UNet hot modules and their sub-pieces.

The level probe (probe_unet_phases.py --modules) attributes the 198 ms
256^2 UNet step to: temporal attention 3 x 19.8, cond-cross-attn-bearing
resnets (8.5-11 ms vs 3.1 for the cond-free head resnet), spatial-linear
2 x 12.2. This script decomposes those modules further — and A/Bs
candidate reformulations — so optimization lands on the real serializer
instead of a guess.

Usage: python scripts/probe_micro.py --img-size 256 --frames 200
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, variants, repeats=4, rtt=0.0):
    t0 = time.time()
    float(fn(*variants[0]))
    compile_s = time.time() - t0
    best = float("inf")
    for i in range(repeats):
        args = variants[1 + i % (len(variants) - 1)]
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 0.0), compile_s


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
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    args = ap.parse_args()

    from dawn_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from dawn_tpu.models.dm import unet3d as U

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    b, t = 1, args.frames
    ls = args.img_size // 4
    c = 64
    n, s = b * t, ls * ls
    rng = np.random.RandomState(0)
    rtt = rtt_baseline()
    print(f"backend={jax.default_backend()} latent={ls} t={t} "
          f"RTT={rtt*1e3:.1f}ms", file=sys.stderr)

    def run(name, f, variants):
        best, comp = timeit(f, variants, rtt=rtt)
        print(f"  {name:44s}: {best*1e3:7.2f} ms (compile {comp:.0f}s)")

    x_tok = jnp.asarray(rng.randn(n, s, c), dt)        # cross-attn tokens
    tokv = [(x_tok + i * 1e-3,) for i in range(5)]

    # ---- CondCrossAttention: full module and sub-pieces --------------------
    ca = U.CondCrossAttention(out_dim=c, dtype=dt)
    ctx = jnp.asarray(rng.randn(n, 2064), dt)
    cav = jax.jit(ca.init)(jax.random.PRNGKey(0), x_tok, ctx)
    f = jax.jit(lambda v, x: jnp.sum(ca.apply(v, x, ctx)))
    run("cond-cross-attn module (x3 per resnet)", lambda x: f(cav, x), tokv)

    gamma = jnp.asarray(rng.rand(c), jnp.float32)
    from dawn_tpu.ops.norms import channel_layer_norm
    f = jax.jit(lambda x: jnp.sum(
        channel_layer_norm(x.astype(jnp.float32), gamma).astype(x.dtype)))
    run("chan-layer-norm (f32 stats)", f, tokv)

    wq = jnp.asarray(rng.randn(c, c) * 0.1, dt)
    f = jax.jit(lambda x: jnp.sum(x @ wq))
    run("dense 64->64 on tokens", f, tokv)

    q64 = jnp.asarray(rng.randn(n, s, c), dt)
    kv = jnp.asarray(rng.randn(n, 2 * c), dt)
    null_kv = jnp.asarray(rng.randn(2, 8), jnp.float32)
    qs = jnp.ones((8,), jnp.float32)
    f = jax.jit(lambda q: jnp.sum(U.cond_cross_packed(
        q, kv[:, :c], kv[:, c:], null_kv, qs, qs, 8, 8, 8.0, dt)))
    run("cond_cross_packed math only", f,
        [(q64 + i * 1e-3,) for i in range(5)])

    # ---- SpatialLinearAttention: packed vs natural at this shape -----------
    sl = U.SpatialLinearAttention(dtype=dt)
    x5 = jnp.asarray(rng.randn(b, t, ls, ls, c), dt)
    x5v = [(x5 + i * 1e-3,) for i in range(5)]
    slv = jax.jit(sl.init)(jax.random.PRNGKey(1), x5)
    f = jax.jit(lambda v, x: jnp.sum(sl.apply(v, x)))
    run("spatial-linear module (packed)", lambda x: f(slv, x), x5v)

    hid = 256
    q = jnp.asarray(rng.randn(n, s, hid), dt)
    k = jnp.asarray(rng.randn(n, s, hid), dt)
    v = jnp.asarray(rng.randn(n, s, hid), dt)
    qv = [(q + i * 1e-3,) for i in range(5)]
    f = jax.jit(lambda q: jnp.sum(U.spatial_linear_packed(q, k, v, 8, 32, dt)))
    run("spatial_linear_packed math", f, qv)
    f = jax.jit(lambda q: jnp.sum(U.spatial_linear_natural(q, k, v, 8, 32, dt)))
    run("spatial_linear_natural math", f, qv)

    # qkv projection conv (1x1) + out conv
    wqkv = jnp.asarray(rng.randn(c, 3 * hid) * 0.1, dt)
    f = jax.jit(lambda x: jnp.sum(x @ wqkv))
    run("qkv 1x1 conv 64->768", f, tokv)

    # ---- VideoGroupNorm / Block pieces at top level ------------------------
    gn = U.VideoGroupNorm(8)
    gnv = jax.jit(gn.init)(jax.random.PRNGKey(2), x5)
    f = jax.jit(lambda v, x: jnp.sum(gn.apply(v, x)))
    run("video-group-norm (f32 stats)", lambda x: f(gnv, x), x5v)

    blk = U.Block(features=c, dtype=dt)
    bv = jax.jit(blk.init)(jax.random.PRNGKey(3), x5)
    f = jax.jit(lambda v, x: jnp.sum(blk.apply(v, x)))
    run("Block (conv3x3+GN+SiLU)", lambda x: f(bv, x), x5v)

    dsm = U.Downsample(c, dtype=dt)
    dv = jax.jit(dsm.init)(jax.random.PRNGKey(4), x5)
    f = jax.jit(lambda v, x: jnp.sum(dsm.apply(v, x)))
    run("downsample conv4x4s2", lambda x: f(dv, x), x5v)

    # scan-amortized version of the same downsample (RTT-free attribution)
    def scan8(v, x):
        def body(carry, _):
            return carry + 1e-6, jnp.sum(dsm.apply(v, x + carry))
        _, ys = jax.lax.scan(body, jnp.float32(0), None, length=8)
        return jnp.sum(ys)
    f = jax.jit(scan8)
    best, comp = timeit(lambda x: f(dv, x), x5v, rtt=rtt)
    print(f"  {'downsample scan-amortized (/8)':44s}: {best/8*1e3:7.2f} ms "
          f"(compile {comp:.0f}s)")


if __name__ == "__main__":
    main()
