import time
import numpy as np
import jax, jax.numpy as jnp
from dawn_tpu.models.dm.unet3d import Unet3D

r = np.random.RandomState(0)
b, ls = 1, 32
def bench(mode, t, dtype, label):
    m = Unet3D(dim=64, channels=275, cond_pose=6, win_width=40, attn_mode=mode, dtype=dtype)
    x = jnp.asarray(r.randn(b, t, ls, ls, 275), jnp.float32)
    cond = jnp.asarray(r.randn(b, t, 1032), jnp.float32)
    tv = jnp.zeros((b,), jnp.int32)
    var = jax.jit(m.init)(jax.random.PRNGKey(0), x[:, :2], tv, cond[:, :2])
    f = jax.jit(lambda v, x, tv, c: m.apply(v, x, tv, c).sum())
    float(f(var, x, tv, cond))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter(); float(f(var, x, tv, cond)); ts.append(time.perf_counter()-t0)
    print(f"{label}: best {min(ts)*1e3:.1f} ms")

bench("local", 200, jnp.bfloat16, "local t=200 bf16")
bench("full", 200, jnp.bfloat16, "full  t=200 bf16")
bench("local", 100, jnp.bfloat16, "local t=100 bf16")
bench("local", 200, jnp.float32, "local t=200 f32")
