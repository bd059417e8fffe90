import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
print("jax up", flush=True)
from dust3r_tpu.models.model import dust3r_512_dpt
model = dust3r_512_dpt(dtype=jnp.bfloat16)
img = jax.random.normal(jax.random.PRNGKey(0), (4,384,512,3), jnp.float32)
@jax.jit
def init_bf16(key, i):
    p = model.init(key, i[:1], i[1:2])
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype==jnp.float32 else x, p)
t0=time.perf_counter()
params = init_bf16(jax.random.PRNGKey(1), img)
v = float(jnp.sum(params["params"]["enc_norm"]["ln"]["scale"]))
print("init done", time.perf_counter()-t0, flush=True)
enc = jax.jit(lambda p, im: model.apply(p, im, method="encode"))
t0=time.perf_counter()
f, pos = enc(params, img)
v=float(jnp.sum(f[0,0,:4]))
print("encode compile+run", time.perf_counter()-t0, flush=True)
print("DONE", flush=True)
