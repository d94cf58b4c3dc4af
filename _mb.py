import time, sys
import numpy as np
import jax, jax.numpy as jnp
from dawn_tpu.ops.local_attention import local_attention_banded, local_attention_pallas

print("devices:", jax.devices(), file=sys.stderr)
n, h, t, d, w = 1024, 8, 200, 32, 40
rng = np.random.RandomState(0)
for dtype in (jnp.float32, jnp.bfloat16):
    q = jnp.asarray(rng.randn(n, h, t, d), dtype)
    k = jnp.asarray(rng.randn(n, h, t, d), dtype)
    v = jnp.asarray(rng.randn(n, h, t, d), dtype)
    bias = jnp.asarray(rng.randn(h, 2*w+1), jnp.float32)
    fb = jax.jit(lambda q,k,v: local_attention_banded(q,k,v,bias,w))
    fp = jax.jit(lambda q,k,v: local_attention_pallas(q,k,v,bias,w))
    for name, f in [("banded", fb), ("pallas", fp)]:
        try:
            o = jax.block_until_ready(f(q,k,v))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter(); jax.block_until_ready(f(q,k,v)); ts.append(time.perf_counter()-t0)
            print(f"{dtype.__name__} {name}: best {min(ts)*1e3:.2f} ms")
        except Exception as e:
            print(f"{dtype.__name__} {name}: FAILED {type(e).__name__}: {e}")
    # agreement
    ob = fb(q,k,v).astype(jnp.float32)
    try:
        op = fp(q,k,v).astype(jnp.float32)
        print(f"{dtype.__name__} mse banded-vs-pallas: {float(jnp.mean((ob-op)**2)):.3e}")
    except Exception:
        pass
