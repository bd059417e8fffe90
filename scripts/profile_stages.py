import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
print("jax up:", jax.devices(), flush=True)
from dust3r_tpu.models.model import dust3r_512_dpt

def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))

def timeit(f, *a, iters=5):
    out = f(*a); sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    sync(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3

B, H, W = 8, 384, 512
model = dust3r_512_dpt(dtype=jnp.bfloat16)
img = jax.random.normal(jax.random.PRNGKey(0), (2 * B, H, W, 3), jnp.float32)

@jax.jit
def init_bf16(key, i):
    p = model.init(key, i[:1], i[1:2])
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, p)

t0 = time.perf_counter()
params = init_bf16(jax.random.PRNGKey(1), img)
sync(params["params"]["enc_norm"]["ln"]["scale"])
print(f"init {time.perf_counter()-t0:.0f}s", flush=True)

enc = jax.jit(lambda p, im: model.apply(p, im, method="encode"))
t0 = time.perf_counter()
f, pos = enc(params, img); sync(f)
print(f"encode compile {time.perf_counter()-t0:.0f}s", flush=True)
print(f"encode(16 imgs): {timeit(enc, params, img):.1f} ms", flush=True)

dec = jax.jit(lambda p, f1, p1, f2, p2: model.apply(p, f1, p1, f2, p2, method="decode"))
t0 = time.perf_counter()
d1, d2 = dec(params, f[:B], pos[:B], f[B:], pos[B:]); sync(d1[-1])
print(f"decode compile {time.perf_counter()-t0:.0f}s", flush=True)
print(f"decode(8 pairs): {timeit(dec, params, f[:B], pos[:B], f[B:], pos[B:]):.1f} ms", flush=True)

head = jax.jit(lambda p, d: model.apply(p, 1, d, (H, W), method="head"))
t0 = time.perf_counter()
r = head(params, d1); sync(r["pts3d"])
print(f"head compile {time.perf_counter()-t0:.0f}s", flush=True)
print(f"dpt head1(8): {timeit(head, params, d1):.1f} ms  (x2 heads per pair)", flush=True)
print("DONE", flush=True)
