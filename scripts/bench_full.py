import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from dust3r_tpu.models.model import dust3r_512_dpt

def sync(x): return float(jnp.sum(jnp.ravel(x)[:1]))

def run(B, head_dtype, label, iters=10):
    model = dust3r_512_dpt(dtype=jnp.bfloat16, head_dtype=head_dtype)
    imgs = [jax.random.normal(jax.random.PRNGKey(i), (B,384,512,3), jnp.float32) for i in range(4)]
    @jax.jit
    def init_bf16(key, i1, i2):
        p = model.init(key, i1, i2)
        return jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype==jnp.float32 else x, p)
    params = init_bf16(jax.random.PRNGKey(2), imgs[0][:1], imgs[1][:1])
    sync(params["params"]["enc_norm"]["ln"]["scale"])
    @jax.jit
    def fwd(params, img1, img2):
        r1, r2 = model.apply(params, img1, img2)
        return (r1["pts3d"], r1["conf"], r2["pts3d_in_other_view"], r2["conf"])
    t0=time.perf_counter()
    out = fwd(params, imgs[0], imgs[1]); sync(out[0])
    print(f"{label}: compile {time.perf_counter()-t0:.0f}s", flush=True)
    for i in range(3): out = fwd(params, imgs[i%4], imgs[(i+1)%4])
    sync(out[0])
    t0=time.perf_counter()
    for i in range(iters): out = fwd(params, imgs[i%4], imgs[(i+1)%4])
    sync(out[0])
    dt=time.perf_counter()-t0
    print(f"{label}: {dt/iters*1e3:.1f} ms/iter, {B*iters/dt:.2f} pairs/s", flush=True)
    return params, fwd, imgs, out

# head precision comparison at B=2 (smaller compile) -- run f32 vs bf16 heads on same params
p32, f32fn, imgs32, _ = run(8, jnp.float32, "B=8 head=f32")
pb, fbfn, imgsb, _ = run(8, jnp.bfloat16, "B=8 head=bf16")
out32 = f32fn(p32, imgs32[0], imgs32[1])
outbf = fbfn(p32, imgs32[0], imgs32[1])
d = jnp.abs(out32[0]-outbf[0])
rel = d / (jnp.abs(out32[0]) + 1e-3)
print(f"head bf16 vs f32: max abs {float(d.max()):.4f}, rmse {float(jnp.sqrt(jnp.mean(d**2))):.5f}, median rel {float(jnp.median(rel)):.5f}", flush=True)
run(16, jnp.bfloat16, "B=16 head=bf16")
run(16, jnp.float32, "B=16 head=f32")
print("DONE", flush=True)
