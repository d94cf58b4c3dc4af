import time, sys
import numpy as np
import jax, jax.numpy as jnp
from dawn_tpu.models.dm.flow_diffusion import FlowDiffusion, FlowDiffusionConfig
from dawn_tpu.models.lfg.generator import LFGGenerator

cfg = FlowDiffusionConfig(img_size=128, sampling_timesteps=20, win_width=40,
                          attn_mode="local", dtype=jnp.bfloat16)
model = FlowDiffusion(cfg)
variables = model.init_variables(jax.random.PRNGKey(0), num_frames=2)
b, t, s, ls = 1, 200, 128, 32
r = np.random.RandomState(0)
x = jnp.asarray(r.randn(b, t, ls, ls, 275), jnp.float32)
cond = jnp.asarray(r.randn(b, t, 1032), jnp.float32)
tv = jnp.zeros((b,), jnp.int32)
unet = jax.jit(lambda v, x, tv, c: model.unet.apply(v, x, tv, c).sum())
print("sum:", float(unet(variables["unet"], x, tv, cond)))
ts = []
for _ in range(4):
    t0 = time.perf_counter(); float(unet(variables["unet"], x, tv, cond)); ts.append(time.perf_counter()-t0)
print(f"UNet fwd T=200: best {min(ts)*1e3:.1f} ms -> x20 = {min(ts)*20:.2f} s")

img = jnp.asarray(r.rand(b, s, s, 3), jnp.float32)
grid = jnp.asarray(r.rand(t, ls, ls, 2)*2-1, jnp.float32)
conf = jnp.asarray(r.rand(t, ls, ls, 1), jnp.float32)
dec = jax.jit(lambda v, i, g, c: model.generator.apply(v, i, g, c, method=LFGGenerator.decode_with_flow)["prediction"].sum())
print("dsum:", float(dec(variables["generator"], img, grid, conf)))
ts = []
for _ in range(4):
    t0 = time.perf_counter(); float(dec(variables["generator"], img, grid, conf)); ts.append(time.perf_counter()-t0)
print(f"LFG decode 200 frames: best {min(ts)*1e3:.1f} ms")
