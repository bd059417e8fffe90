import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
print("start", flush=True)
from dust3r_tpu.models.model import dust3r_512_dpt
model = dust3r_512_dpt(dtype=jnp.bfloat16)
B,H,W = 8,384,512
img1 = jax.random.normal(jax.random.PRNGKey(0), (B,H,W,3), jnp.float32)
img2 = jax.random.normal(jax.random.PRNGKey(1), (B,H,W,3), jnp.float32)

@jax.jit
def init_bf16(key, i1, i2):
    p = model.init(key, i1, i2)
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype==jnp.float32 else x, p)

t0=time.perf_counter()
params = init_bf16(jax.random.PRNGKey(2), img1[:1], img2[:1])
jax.block_until_ready(params)
print("init+cast done", time.perf_counter()-t0, flush=True)

@jax.jit
def fwd(params, img1, img2):
    r1, r2 = model.apply(params, img1, img2)
    return r1["pts3d"].sum() + r2["pts3d_in_other_view"].sum()

t0=time.perf_counter()
out = fwd(params, img1, img2); print("first:", float(out), time.perf_counter()-t0, flush=True)
t0=time.perf_counter()
for i in range(10):
    out = fwd(params, img1, img2)
v = float(out)
dt = time.perf_counter()-t0
print(f"scalar-forced same-input: {dt/10*1e3:.1f} ms/iter, {B*10/dt:.2f} pairs/s", flush=True)

imgs = [jax.random.normal(jax.random.PRNGKey(i), (B,H,W,3), jnp.float32) for i in range(4)]
for im in imgs: im.block_until_ready()
t0=time.perf_counter()
for i in range(8):
    out = fwd(params, imgs[i%4], imgs[(i+1)%4])
v=float(out)
dt = time.perf_counter()-t0
print(f"varied inputs: {dt/8*1e3:.1f} ms/iter, {B*8/dt:.2f} pairs/s", flush=True)
print("DONE", flush=True)
