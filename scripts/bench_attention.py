"""Microbenchmark: banded-XLA vs Pallas sliding-window temporal attention.

Reproduces the round-1 comparison (README perf table) at the DAWN UNet's
temporal-attention shapes: the top level at 128^2 folds the 32x32 latent into
the batch, so n = 1024 sequences, h = 8 heads, d = 32, T = frames, window 40
(DAWN_128.yaml:5). Reference correspondence: the in-repo benchmark at
DM_3/modules/local_attention.py:532-559 (opt-vs-full wall time + MSE).

Usage:  python scripts/bench_attention.py [--t 200] [--n 1024] [--dtype bf16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


SCAN_ITERS = 10


def scanned(op):
    """Run op SCAN_ITERS times inside one jit (q changes per step so the op
    cannot be CSE'd) — amortizes the per-dispatch tunnel overhead the way the
    20-step DDIM scan does in production."""
    import jax
    import jax.numpy as jnp

    def fn(q, k, v):
        def body(carry, _):
            out = op(carry, k, v)
            return out.astype(carry.dtype), None
        out, _ = jax.lax.scan(body, q, None, length=SCAN_ITERS)
        return out

    return jax.jit(fn)


def timeit(fn, *args, repeats=5):
    """AXON GOTCHA: block_until_ready is a no-op on this platform; only
    fetching bytes forces execution, so each timed call is forced by pulling
    one scalar of the output to host."""
    import numpy as np
    out = fn(*args)
    np.asarray(out[(0,) * out.ndim])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[(0,) * out.ndim])
        best = min(best, time.perf_counter() - t0)
    return best / SCAN_ITERS, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--h", type=int, default=8)
    ap.add_argument("--t", type=int, default=200)
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--window", type=int, default=40)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--block-q", type=int, default=64)
    ap.add_argument("--g-rows", type=int, default=None,
                    help="rows per pallas grid step (default: auto)")
    ap.add_argument("--prob-dtype", default=None, choices=["bf16"],
                    help="also bench the packed kernel with the exp/AV "
                         "probability tiles in this dtype (max-subtraction "
                         "and row-sum stay f32) — the PERF_256 live-score-"
                         "tile experiment (VERDICT r4 #4), with MSE vs the "
                         "f32-tile kernel recorded")
    ap.add_argument("--stripe", type=int, default=0, metavar="SHARDS",
                    help="also bench local_attention_packed_stripe at the "
                         "per-shard shape of a SHARDS-way seq-parallel mesh "
                         "(t_q = t/SHARDS, t_k = t_q + 2w): the kernel each "
                         "device runs inside seq_sharded_local_attention, "
                         "executed standalone on the one real chip "
                         "(VERDICT r4 #3) — fwd, fused bwd, and the einsum "
                         "stripe reference, with MSE")
    ap.add_argument("--seq-composed", action="store_true",
                    help="execute the COMPOSED seq-parallel program "
                         "(shard_map + ppermute halos + Pallas stripe fwd "
                         "AND fused bwd) on a forced one-shard mesh — the "
                         "single-real-chip verification of the multi-chip "
                         "path, with MSE vs the whole-T packed kernel")
    ap.add_argument("--skip-full", action="store_true")
    ap.add_argument("--skip-banded", action="store_true")
    ap.add_argument("--skip-pallas", action="store_true",
                    help="skip the tiled Pallas kernel (its Mosaic compile "
                         "is ~2+ min at 32k rows; use when only comparing "
                         "packed vs full)")
    args = ap.parse_args()

    from dawn_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from dawn_tpu.ops.local_attention import (
        local_attention_banded, local_attention_pallas)
    from dawn_tpu.ops.t5bias import (
        t5_bias_matrix, t5_bias_windowed_vector, window_mask)

    n, h, t, d, w = args.n, args.h, args.t, args.d, args.window
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    print(f"backend={jax.default_backend()} n={n} h={h} t={t} d={d} w={w} "
          f"dtype={args.dtype} block_q={args.block_q}", file=sys.stderr)

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(n, h, t, d), dt) * (d ** -0.5)
    k = jnp.asarray(rng.randn(n, h, t, d), dt)
    v = jnp.asarray(rng.randn(n, h, t, d), dt)
    emb = jnp.asarray(rng.randn(32, h), jnp.float32)
    vec = t5_bias_windowed_vector(emb, w, 32, 32)

    banded = scanned(lambda q, k, v: local_attention_banded(q, k, v, vec, w))
    pallas = scanned(lambda q, k, v: local_attention_pallas(
        q, k, v, vec, w, block_q=args.block_q, g_rows=args.g_rows))

    tb = None
    if not args.skip_banded:
        tb, ob = timeit(banded, q, k, v)
        print(f"banded : {tb*1e3:8.2f} ms/op (scan-amortized)")
    op = None
    if not args.skip_pallas:
        tp, op = timeit(pallas, q, k, v)
        vs = f"   speedup vs banded: {tb/tp:.2f}x" if tb else ""
        print(f"pallas : {tp*1e3:8.2f} ms/op{vs}")
        if tb is not None:
            mse = float(jnp.mean((ob.astype(jnp.float32)
                                  - op.astype(jnp.float32)) ** 2))
            print(f"pallas-vs-banded MSE: {mse:.3e}")

    if t <= 256:
        from dawn_tpu.ops.local_attention import local_attention_packed

        def pack(x):
            return x.transpose(0, 2, 1, 3).reshape(n, t, h * d)

        qp, kp, vp = pack(q), pack(k), pack(v)
        packed = scanned(lambda q, k, v: local_attention_packed(
            q, k, v, vec, w, heads=h,
            **({"g_rows": args.g_rows} if args.g_rows else {})))
        tpk, opk = timeit(packed, qp, kp, vp)
        vs = f"   speedup vs banded: {tb/tpk:.2f}x" if tb else ""
        print(f"packed : {tpk*1e3:8.2f} ms/op{vs}")
        if args.prob_dtype == "bf16":
            packed_b = scanned(lambda q, k, v: local_attention_packed(
                q, k, v, vec, w, heads=h, prob_dtype=jnp.bfloat16,
                **({"g_rows": args.g_rows} if args.g_rows else {})))
            tpb, opb = timeit(packed_b, qp, kp, vp)
            mse_b = float(jnp.mean((opb.astype(jnp.float32)
                                    - opk.astype(jnp.float32)) ** 2))
            print(f"packed bf16-prob-tiles: {tpb*1e3:8.2f} ms/op   "
                  f"MSE vs f32 tiles: {mse_b:.3e}")
        if op is None:
            # no tiled-pallas output to compare against: use packed,
            # unpacked to the (n, h, t, d) layout
            op = opk.reshape(n, t, h, d).transpose(0, 2, 1, 3)

    if args.stripe:
        from dawn_tpu.ops.local_attention import (
            PACKED_TQ_MULTIPLE, _stripe_attn_einsum, _stripe_bias,
            local_attention_packed_stripe, local_attention_packed_stripe_tpu)

        sh = args.stripe
        t_loc = t // sh
        assert t_loc >= w, (t_loc, w)
        t_k = t_loc + 2 * w
        tqp = PACKED_TQ_MULTIPLE * -(-t_loc // PACKED_TQ_MULTIPLE)
        tkp = 128 * -(-t_k // 128)
        bias = _stripe_bias(h, t_loc, w, vec, tqp, tkp)

        def pack2(x, tt):
            return x.transpose(0, 2, 1, 3).reshape(n, t, h * d)[:, :tt]

        qs, ks, vs2 = pack2(q, t_loc), pack2(k, t_k), pack2(v, t_k)
        stripe_p = scanned(lambda q, k, v: local_attention_packed_stripe(
            q, k, v, bias, h))
        stripe_e = scanned(lambda q, k, v: _stripe_attn_einsum(
            q, k, v, bias, h))
        tsp, osp = timeit(stripe_p, qs, ks, vs2)
        tse, ose = timeit(stripe_e, qs, ks, vs2)
        mse = float(jnp.mean((osp.astype(jnp.float32)
                              - ose.astype(jnp.float32)) ** 2))
        print(f"stripe pallas ({sh}-shard, t_q={t_loc}, t_k={t_k}): "
              f"{tsp*1e3:8.2f} ms/op")
        print(f"stripe einsum:                        {tse*1e3:8.2f} ms/op")
        print(f"stripe pallas-vs-einsum MSE: {mse:.3e}")

        # fused backward (the training path): grad wrt q through the
        # custom-vjp entry. The scan carry is a SCALAR (dq reduced in-body):
        # carrying the full (n, t_q, hd) dq made XLA pin a 112 MB carry in
        # VMEM at the 256² shape and VMEM-OOM the compile — a harness
        # artifact, not a kernel one (the kernel's own working set is ~4 MB)
        loss = lambda q, k, v: jnp.sum(  # noqa: E731
            local_attention_packed_stripe_tpu(q, k, v, bias, h)
            .astype(jnp.float32) ** 2)
        gfn = jax.grad(loss)

        def bwd_scanned(q, k, v):
            def body(c, _):
                dq = gfn(q + c.astype(q.dtype), k, v)
                return jnp.mean(dq).astype(jnp.float32) * 1e-9, None
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=SCAN_ITERS)
            return c[None]

        tsb, _ = timeit(jax.jit(bwd_scanned), qs, ks, vs2)
        print(f"stripe fused fwd+bwd (grad q):        {tsb*1e3:8.2f} ms/op")

    if args.seq_composed:
        # the COMPOSED seq-parallel program on THIS backend's real devices:
        # shard_map + ppermute halo exchange + the Pallas stripe kernel
        # (fwd and fused bwd), forced onto a ONE-shard axis (zero-filled
        # halos = the global-edge shard) so a single chip executes the
        # exact multi-chip composition (seq_sharded_local_attention
        # force_stripe; unit-parity in tests/test_local_attention.py::
        # TestSeqShardedComposition)
        from dawn_tpu.ops.local_attention import (
            local_attention_packed, seq_sharded_local_attention)
        from dawn_tpu.parallel.mesh import make_mesh

        mesh1 = make_mesh(1, seq_parallel=1)

        def pack(x):
            return x.transpose(0, 2, 1, 3).reshape(n, t, h * d)

        qp, kp, vp = pack(q), pack(k), pack(v)
        composed = scanned(lambda q, k, v: seq_sharded_local_attention(
            q, k, v, vec, w, h, mesh1, force_stripe=True))
        tc, oc = timeit(composed, qp, kp, vp)
        packed_ref = scanned(lambda q, k, v: local_attention_packed(
            q, k, v, vec, w, heads=h))
        tpk2, opk2 = timeit(packed_ref, qp, kp, vp)
        mse = float(jnp.mean((oc.astype(jnp.float32)
                              - opk2.astype(jnp.float32)) ** 2))
        print(f"seq-composed fwd (shard_map+halo+stripe, 1 shard): "
              f"{tc*1e3:8.2f} ms/op")
        print(f"packed whole-T reference:             {tpk2*1e3:8.2f} ms/op")
        print(f"composed-vs-packed MSE: {mse:.3e}")

        loss_c = lambda q, k, v: jnp.sum(  # noqa: E731
            seq_sharded_local_attention(q, k, v, vec, w, h, mesh1,
                                        force_stripe=True)
            .astype(jnp.float32) ** 2)
        gfn_c = jax.grad(loss_c)

        def bwd_c(q, k, v):
            def body(c, _):
                dq = gfn_c(q + c.astype(q.dtype), k, v)
                return jnp.mean(dq).astype(jnp.float32) * 1e-9, None
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=SCAN_ITERS)
            return c[None]

        tcb, _ = timeit(jax.jit(bwd_c), qp, kp, vp)
        print(f"seq-composed fused fwd+bwd (grad q):  {tcb*1e3:8.2f} ms/op")

    if not args.skip_full and t <= 512:
        bias_full = (t5_bias_matrix(emb, t, 32, 32)
                     + jnp.asarray(window_mask(t, w)))

        def full(q, k, v):
            sim = jnp.einsum("nhid,nhjd->nhij", q, k).astype(jnp.float32)
            sim = sim + bias_full[None]
            attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
            return jnp.einsum("nhij,nhjd->nhid", attn, v)

        tf_, of = timeit(scanned(full), q, k, v)
        print(f"full   : {tf_*1e3:8.2f} ms/op (scan-amortized)")
        if op is not None:
            mse = float(jnp.mean((of.astype(jnp.float32)
                                  - op.astype(jnp.float32)) ** 2))
            print(f"pallas-vs-full MSE: {mse:.3e}")
        else:
            print("pallas-vs-full MSE: skipped (no pallas/packed output "
                  "at this shape)")


if __name__ == "__main__":
    main()
