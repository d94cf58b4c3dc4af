import time, functools
import numpy as np
import jax, jax.numpy as jnp
from dawn_tpu.ops.local_attention import local_attention_banded, _band_bias, NEG_INF

n, h, t, d, w = 1024, 8, 200, 32, 40
r = np.random.RandomState(0)
dt = jnp.bfloat16
q = jnp.asarray(r.randn(n, h, t, d), dt)
k = jnp.asarray(r.randn(n, h, t, d), dt)
v = jnp.asarray(r.randn(n, h, t, d), dt)
bias = jnp.asarray(r.randn(h, 2*w+1), jnp.float32)

def timeit(name, f, *a):
    out = f(*a)
    s = float(jnp.sum(out.astype(jnp.float32)))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(jnp.sum(f(*a).astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: best {min(ts)*1e3:.2f} ms (sum {s:.1f})")

# current banded
timeit("banded bq=128", jax.jit(lambda q,k,v: local_attention_banded(q,k,v,bias,w,block_q=128)), q,k,v)
timeit("banded bq=64", jax.jit(lambda q,k,v: local_attention_banded(q,k,v,bias,w,block_q=64)), q,k,v)
timeit("banded bq=200", jax.jit(lambda q,k,v: local_attention_banded(q,k,v,bias,w,block_q=200)), q,k,v)

# full attention with windowed mask
import numpy as onp
def full_attn(q, k, v):
    rel = onp.arange(t)[None,:] - onp.arange(t)[:,None]
    m = onp.where(onp.abs(rel) <= w, 0.0, NEG_INF).astype(onp.float32)
    bv = bias[:, onp.clip(rel + w, 0, 2*w)] + m  # (h, t, t)
    sim = jnp.einsum("nhid,nhjd->nhij", q, k).astype(jnp.float32) + bv
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    return jnp.einsum("nhij,nhjd->nhid", attn, v)
timeit("full windowed", jax.jit(full_attn), q, k, v)

# merged batch: fold heads into batch, single 3d bmm
def banded_flat(q, k, v, bq=128):
    nb = -(-t // bq); t_pad = nb*bq; kw = bq + 2*w
    qp = jnp.pad(q, ((0,0),(0,0),(0,t_pad-t),(0,0))).reshape(n*h, nb, bq, d)
    kp = jnp.pad(k, ((0,0),(0,0),(w,t_pad-t+w),(0,0))).reshape(n*h, t_pad+2*w, d)
    vp = jnp.pad(v, ((0,0),(0,0),(w,t_pad-t+w),(0,0))).reshape(n*h, t_pad+2*w, d)
    sk = jnp.stack([jax.lax.dynamic_slice_in_dim(kp, b*bq, kw, axis=1) for b in range(nb)], 1)
    sv = jnp.stack([jax.lax.dynamic_slice_in_dim(vp, b*bq, kw, axis=1) for b in range(nb)], 1)
    qf = qp.reshape(n*h*nb, bq, d); skf = sk.reshape(n*h*nb, kw, d); svf = sv.reshape(n*h*nb, kw, d)
    scores = jax.lax.dot_general(qf, skf, (((2,),(2,)),((0,),(0,))), preferred_element_type=jnp.float32)
    bb = _band_bias(h, bq, kw, -w, w, bias)  # (h, bq, kw)
    bb = jnp.broadcast_to(bb[None,:,None], (n,h,nb,bq,kw)).reshape(n*h*nb,bq,kw)
    jg = (onp.arange(nb)[:,None]*bq - w) + onp.arange(kw)[None,:]
    kvalid = jnp.asarray(onp.where((jg>=0)&(jg<t),0.,NEG_INF), jnp.float32)
    kvalid = jnp.broadcast_to(kvalid[None,None,:,None,:],(n,h,nb,bq,kw)).reshape(n*h*nb,1,kw)*jnp.ones((1,bq,1))
    scores = scores + bb + kvalid
    p = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o = jax.lax.dot_general(p, svf, (((2,),(1,)),((0,),(0,))))
    return o.reshape(n,h,t_pad,d)[:,:,:t]
timeit("banded flat bmm", jax.jit(banded_flat), q, k, v)
