"""Probe: does one canonical packed-kernel shape cut cold compile?

The 128^2 sampler instantiates the packed Pallas kernel at every UNet level
with >= 256 sequences (n = 1024 and n = 256 at 128^2; 4096/1024/256 at
256^2). Each DISTINCT shape pays its own Mosaic compile (~45-130 s measured
in round 2). This probe measures, on the real TPU:

  A. two-shape program: packed(n=1024) + packed(n=256)      [today's sampler]
  B. canonical program: packed(n=1024) as 4 x lax.map chunks of n=256,
     + packed(n=256)                                        [one Mosaic shape]
  C. each shape alone                                       [per-shape cost]

plus steady-state timings of A and B, so the compile saving can be weighed
against the chunking overhead. If B's compile ~= C(n=256)'s, the XLA/Mosaic
pipeline caches identical kernel payloads and the sampler should chunk.

Usage: python scripts/probe_packed_compile.py [--t 200] [--chunk 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=200)
    ap.add_argument("--big", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--h", type=int, default=8)
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--window", type=int, default=40)
    ap.add_argument("--case", default="all",
                    choices=["all", "C1", "C2", "A", "B"],
                    help="run ONE case (use separate processes so an "
                         "in-process Mosaic kernel cache can't contaminate "
                         "the comparison; 'all' runs everything in-process)")
    ap.add_argument("--tq128", action="store_true",
                    help="pad the packed kernel's query axis to 128 (square "
                         "lane-aligned tiles) instead of 8 — A/B for Mosaic "
                         "compile time vs the sublane-trimmed default")
    ap.add_argument("--steady", action="store_true",
                    help="scan-amortized steady-state comparison of "
                         "chunked vs unchunked packed attention at --big "
                         "(per-op cost of the canonical-shape rewrite; "
                         "single-dispatch timings only measure tunnel RTT)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from dawn_tpu.ops import local_attention as la
    from dawn_tpu.ops.local_attention import local_attention_packed
    if args.tq128:
        la.PACKED_TQ_MULTIPLE = 128
    from dawn_tpu.ops.t5bias import t5_bias_windowed_vector

    t, h, d, w = args.t, args.h, args.d, args.window
    hd = h * d
    rng = np.random.RandomState(0)
    vec = t5_bias_windowed_vector(
        jnp.asarray(rng.randn(32, h), jnp.float32), w, 32, 32)

    def mk(n):
        return jnp.asarray(rng.randn(n, t, hd), jnp.bfloat16)

    xb, xs = mk(args.big), mk(args.chunk)

    def attn(x):
        return local_attention_packed(x, x, x, vec, w, heads=h)

    def attn_chunked(x):
        n = x.shape[0]
        xc = x.reshape(n // args.chunk, args.chunk, t, hd)
        return jax.lax.map(attn, xc).reshape(n, t, hd)

    def measure(label, fn, *xs_):
        f = jax.jit(fn)
        t0 = time.time()
        out = f(*xs_)
        np.asarray(out[(0,) * out.ndim])   # axon: fetch forces execution
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = f(*xs_)
            np.asarray(out[(0,) * out.ndim])
            best = min(best, time.time() - t0)
        print(f"{label:34s} compile+first {compile_s:7.1f}s   "
              f"steady {best*1e3:8.2f} ms")
        return compile_s, best

    if args.steady:
        import functools
        def scanned(op):
            def fn(x):
                def body(c, _):
                    return op(c).astype(c.dtype), None
                out, _ = jax.lax.scan(body, x, None, length=10)
                return out
            return jax.jit(fn)

        def tmeas(fn, x):
            out = fn(x)
            np.asarray(out[0, 0, 0])
            best = float("inf")
            for _ in range(5):
                t0 = time.time()
                out = fn(x)
                np.asarray(out[0, 0, 0])
                best = min(best, time.time() - t0)
            return best / 10

        tu = tmeas(scanned(attn), xb)
        tc = tmeas(scanned(attn_chunked), xb)
        print(f"n={args.big} t={t} unchunked {tu*1e3:8.2f} ms/op   "
              f"chunked({args.chunk}) {tc*1e3:8.2f} ms/op   "
              f"overhead {100*(tc/tu-1):+.1f}%")
        return

    cases = {
        "C1": ("C1: packed(chunk) alone", lambda x: attn(x) * 1.0, (xs,)),
        "C2": ("C2: packed(big) alone", lambda x: attn(x) * 1.0, (xb,)),
        "A": ("A : packed(big)+packed(chunk)",
              lambda a, b: attn(a).sum(axis=(1, 2)) + attn(b).sum(),
              (xb, xs)),
        "B": ("B : chunked(big)+packed(chunk)",
              lambda a, b: attn_chunked(a).sum(axis=(1, 2)) + attn(b).sum(),
              (xb, xs)),
    }
    names = list(cases) if args.case == "all" else [args.case]
    for nm in names:
        label, fn, xs_ = cases[nm]
        measure(label, fn, *xs_)


if __name__ == "__main__":
    main()
