import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from dust3r_tpu.models.model import dust3r_512_dpt

def sync(x): return float(jnp.sum(jnp.ravel(x)[:1]))

for scan in (True, False):
    model = dust3r_512_dpt(dtype=jnp.bfloat16, scan_layers=scan)
    img = jax.random.normal(jax.random.PRNGKey(0), (8,384,512,3), jnp.float32)
    @jax.jit
    def init_bf16(key, i):
        p = model.init(key, i[:1], i[1:2])
        return jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype==jnp.float32 else x, p)
    t0=time.perf_counter()
    params = init_bf16(jax.random.PRNGKey(1), img)
    sync(params["params"]["enc_norm"]["ln"]["scale"])
    t_init = time.perf_counter()-t0
    @jax.jit
    def fwd(p, a, b):
        r1, r2 = model.apply(p, a, b)
        return r1["pts3d"]
    t0=time.perf_counter()
    out = fwd(params, img, img); sync(out)
    t_compile = time.perf_counter()-t0
    # steady state
    for _ in range(2): out = fwd(params, img, img)
    sync(out)
    t0=time.perf_counter()
    for _ in range(10): out = fwd(params, img, img)
    sync(out)
    dt=(time.perf_counter()-t0)/10
    print(f"scan={scan}: init {t_init:.0f}s, compile {t_compile:.0f}s, steady {dt*1e3:.1f} ms/iter", flush=True)
