"""Micro-probes of the 256^2 / 128^2 UNet hot modules and their sub-pieces.

The level probe (probe_unet_phases.py --modules) attributes the 198 ms
256^2 UNet step to: temporal attention 3 x 19.8, cond-cross-attn-bearing
resnets (8.5-11 ms vs 3.1 for the cond-free head resnet), spatial-linear
2 x 12.2. This script decomposes those modules further — and A/Bs candidate
reformulations — so optimization lands on the real serializer.

EVERY measurement is scan-amortized (lax.scan over SCAN_LEN iterations with
a varying carry folded into the input, one scalar fetched): the axon tunnel
RTT is ~25-35 ms and block_until_ready is a no-op, so single-op timings at
this scale are pure noise.

Usage: python scripts/probe_micro.py --img-size 256 --frames 200
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCAN_LEN = 16


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
    print(f"backend={jax.default_backend()} latent={ls} t={t} "
          f"scan={SCAN_LEN}", file=sys.stderr)

    def scan_bench(op, x, name, repeats=3):
        """op: x -> array; time = (scan of SCAN_LEN dependent calls) / LEN."""
        def body(carry, _):
            y = op(x + carry.astype(x.dtype))
            return jnp.sum(y).astype(jnp.float32) * 1e-12, None

        f = jax.jit(lambda x: jax.lax.scan(body, jnp.float32(0), None,
                                           length=SCAN_LEN)[0])
        t0 = time.time()
        float(f(x))
        comp = time.time() - t0
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(f(x))
            best = min(best, time.perf_counter() - t0)
        print(f"  {name:46s}: {best/SCAN_LEN*1e3:7.2f} ms "
              f"(compile {comp:.0f}s)")
        return best / SCAN_LEN

    x_tok = jnp.asarray(rng.randn(n, s, c), dt)        # cross-attn tokens
    x5 = jnp.asarray(rng.randn(b, t, ls, ls, c), dt)

    # ---- CondCrossAttention: full module and sub-pieces --------------------
    ca = U.CondCrossAttention(out_dim=c, dtype=dt)
    ctx = jnp.asarray(rng.randn(n, 2064), dt)
    cav = jax.jit(ca.init)(jax.random.PRNGKey(0), x_tok, ctx)
    scan_bench(lambda x: ca.apply(cav, x, ctx),
               x_tok, "cond-cross-attn module (x3 per resnet)")

    gamma = jnp.asarray(rng.rand(c), jnp.float32)
    from dawn_tpu.ops.norms import channel_layer_norm
    scan_bench(lambda x: channel_layer_norm(
        x.astype(jnp.float32), gamma).astype(x.dtype),
        x_tok, "chan-layer-norm (f32 stats)")

    wq = jnp.asarray(rng.randn(c, c) * 0.1, dt)
    scan_bench(lambda x: x @ wq, x_tok, "dense 64->64 on tokens")

    kv = jnp.asarray(rng.randn(n, 2 * c), dt)
    null_kv = jnp.asarray(rng.randn(2, 8), jnp.float32)
    qs = jnp.ones((8,), jnp.float32)
    scan_bench(lambda q: U.cond_cross_packed(
        q, kv[:, :c], kv[:, c:], null_kv, qs, qs, 8, 8, 8.0, dt),
        x_tok, "cond_cross_packed math only")

    # ---- SpatialLinearAttention: packed vs natural at this shape -----------
    sl = U.SpatialLinearAttention(dtype=dt)
    slv = jax.jit(sl.init)(jax.random.PRNGKey(1), x5)
    scan_bench(lambda x: sl.apply(slv, x), x5, "spatial-linear module (packed)")

    # NOTE: the bare-math packed AND natural rows are intentionally absent —
    # their 16x-scan compiles hung XLA for >20 min at this shape
    # (2026-08-19); the module rows carry the packed-vs-natural A/B.
    sln = U.SpatialLinearAttention(dtype=dt, force_natural=True)
    slnv = jax.jit(sln.init)(jax.random.PRNGKey(11), x5)
    scan_bench(lambda x: sln.apply(slnv, x), x5,
               "spatial-linear module (natural)")

    hid = 256
    wqkv = jnp.asarray(rng.randn(c, 3 * hid) * 0.1, dt)
    scan_bench(lambda x: x @ wqkv, x_tok, "qkv 1x1 conv 64->768")

    scan_bench(lambda x: x * 1.0001, x_tok,
               "harness baseline (identity on tokens)")
    scan_bench(lambda x: x * 1.0001, x5,
               "harness baseline (identity on video)")

    # ---- VideoGroupNorm / Block / resample at top level --------------------
    gn = U.VideoGroupNorm(8)
    gnv = jax.jit(gn.init)(jax.random.PRNGKey(2), x5)
    scan_bench(lambda x: gn.apply(gnv, x), x5, "video-group-norm (f32 stats)")

    blk = U.Block(features=c, dtype=dt)
    bv = jax.jit(blk.init)(jax.random.PRNGKey(3), x5)
    scan_bench(lambda x: blk.apply(bv, x), x5, "Block (conv3x3+GN+SiLU)")

    dsm = U.Downsample(c, dtype=dt)
    dv = jax.jit(dsm.init)(jax.random.PRNGKey(4), x5)
    scan_bench(lambda x: dsm.apply(dv, x), x5, "downsample conv4x4s2")

    x_half = jnp.asarray(rng.randn(b, t, ls // 2, ls // 2, c), dt)
    usm = U.Upsample(c, dtype=dt)
    uv = jax.jit(usm.init)(jax.random.PRNGKey(5), x_half)
    scan_bench(lambda x: usm.apply(uv, x), x_half, "upsample deconv4x4s2")

    # the temporal-attn module incl. pre-norm/transposes (for overhead vs
    # the bare kernel number in ops/local_attention.py)
    from dawn_tpu.ops.t5bias import t5_bias_windowed_vector
    emb = jnp.asarray(rng.randn(32, 8), jnp.float32)
    bias_vec = t5_bias_windowed_vector(emb, 40, 32, 32)
    pnt = U.PreNormResidualTemporal(8, 32, "local", 40, dtype=dt)
    pv = jax.jit(pnt.init)(jax.random.PRNGKey(6), x5, None, bias_vec)
    scan_bench(lambda x: pnt.apply(pv, x, None, bias_vec), x5,
               "pre-norm temporal attn (module, incl. T)")

    # full resnet-ca-mul for reference
    cond_f = jnp.asarray(rng.randn(b, t, 1032), jnp.float32)
    temb = jnp.asarray(rng.randn(b, 256), jnp.float32)
    rb = U.ResnetBlockCaMul(features=c, time_emb_dim=256, cond_aud=1024,
                            cond_pose=6, cond_eye=2, dtype=dt,
                            fuse_cond=True)
    rbv = jax.jit(rb.init)(jax.random.PRNGKey(7), x5, temb, cond_f)
    scan_bench(lambda x: rb.apply(rbv, x, temb, cond_f), x5,
               "resnet-ca-mul module (fused cond)")
    rbs = U.ResnetBlockCaMul(features=c, time_emb_dim=256, cond_aud=1024,
                             cond_pose=6, cond_eye=2, dtype=dt,
                             fuse_cond=False)
    scan_bench(lambda x: rbs.apply(rbv, x, temb, cond_f), x5,
               "resnet-ca-mul module (separate cond)")


if __name__ == "__main__":
    main()
