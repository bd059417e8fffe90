"""Slim encoder-layer breakdown on the real TPU: full block vs no-attention
block vs attention-op marginal, chained in-graph (marginal cost of layer N+1).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import flax.linen as nn
from dust3r_tpu.models.blocks import Block, LayerNormF32
from dust3r_tpu.ops.attention import attention

def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))

def timeit(f, *a, iters=10, rounds=3):
    out = f(*a); sync(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        sync(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best

def chain_time(fn, x0, n=6, **kw):
    def chained(m):
        @jax.jit
        def f(x):
            out = x
            for _ in range(m):
                out = fn(out)
            return out
        return f
    t1 = timeit(chained(1), x0, **kw)
    tn = timeit(chained(n), x0, **kw)
    return (tn - t1) / (n - 1)

B, N, D, H = 16, 768, 1024, 16
dh = D // H
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
ys, xs = np.meshgrid(np.arange(24), np.arange(32), indexing="ij")
pos = jnp.asarray(np.stack([ys.ravel(), xs.ravel()], -1)[None].repeat(B, 0),
                  jnp.int32)
print("devices:", jax.devices(), flush=True)

blk = Block(D, H, 4.0, 100.0, jnp.bfloat16, None)
params = jax.tree.map(lambda t: t.astype(jnp.bfloat16)
                      if t.dtype == jnp.float32 else t,
                      blk.init(jax.random.PRNGKey(0), x, pos))
t_full = chain_time(lambda y: blk.apply(params, y, pos), x)
print(f"full block marginal : {t_full:7.3f} ms", flush=True)

# attention op marginal (proj to qkv layout + kernel + back), chained
wq = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.bfloat16)
def attn_op(y):
    qkv = jnp.dot(y, wq).reshape(B, N, 3, H, dh)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    o = attention(q, k, v, pos, pos, 100.0, impl="pallas")
    return o.transpose(0, 2, 1, 3).reshape(B, N, D)
t_attn = chain_time(attn_op, x)
print(f"qkv+attn+merge      : {t_attn:7.3f} ms", flush=True)

# same but attention replaced by identity on q (isolates transposes+proj)
def attn_noop(y):
    qkv = jnp.dot(y, wq).reshape(B, N, 3, H, dh)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    o = (q + k + v)
    return o.transpose(0, 2, 1, 3).reshape(B, N, D)
t_noattn = chain_time(attn_noop, x)
print(f"qkv+layout only     : {t_noattn:7.3f} ms  (kernel marginal "
      f"{t_attn - t_noattn:.3f})", flush=True)

# MLP (fc1+gelu+fc2) marginal
w1 = jnp.asarray(rng.standard_normal((D, 4 * D)) * 0.02, jnp.bfloat16)
w2 = jnp.asarray(rng.standard_normal((4 * D, D)) * 0.02, jnp.bfloat16)
def mlp(y):
    h = jnp.dot(y, w1)
    h = nn.gelu(h, approximate=True)
    return jnp.dot(h, w2)
t_mlp = chain_time(mlp, x)
print(f"mlp gemms+gelu      : {t_mlp:7.3f} ms", flush=True)

# 2x fp32 LN marginal
ln = LayerNormF32()
lp = ln.init(jax.random.PRNGKey(0), x)
def lnf(y):
    return (ln.apply(lp, y) + y).astype(jnp.bfloat16)
t_ln = chain_time(lnf, x)
print(f"layernorm fp32 + add: {t_ln:7.3f} ms (x2 per block)", flush=True)
print(f"accounted: attn {t_attn:.3f} + mlp {t_mlp:.3f} + 2ln {2*t_ln:.3f} "
      f"= {t_attn + t_mlp + 2 * t_ln:.3f} vs full {t_full:.3f}", flush=True)
print("DONE", flush=True)
