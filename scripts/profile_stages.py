import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from dust3r_tpu.models.model import dust3r_512_dpt, dust3r_512_linear

def sync(x): return float(jnp.sum(jnp.ravel(x)[:1]))

def timeit(f, *a, iters=10):
    out = f(*a); sync(jax.tree.leaves(out)[0])
    t0=time.perf_counter()
    for _ in range(iters): out = f(*a)
    sync(jax.tree.leaves(out)[0])
    return (time.perf_counter()-t0)/iters*1e3

B,H,W = 8,384,512
for name, ctor in [("dpt", dust3r_512_dpt), ("linear", dust3r_512_linear)]:
    model = ctor(dtype=jnp.bfloat16)
    img = jax.random.normal(jax.random.PRNGKey(0), (2*B,H,W,3), jnp.float32)
    @jax.jit
    def init_bf16(key, i):
        p = model.init(key, i[:1], i[1:2])
        return jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype==jnp.float32 else x, p)
    params = init_bf16(jax.random.PRNGKey(1), img)
    sync(params["params"]["enc_norm"]["ln"]["scale"])

    enc = jax.jit(lambda p, im: model.apply(p, im, method="encode"))
    f, pos = enc(params, img); sync(f)
    t_enc = timeit(enc, params, img)

    dec = jax.jit(lambda p, f1, p1, f2, p2: model.apply(p, f1, p1, f2, p2, method="decode"))
    d1, d2 = dec(params, f[:B], pos[:B], f[B:], pos[B:])
    t_dec = timeit(dec, params, f[:B], pos[:B], f[B:], pos[B:])

    head = jax.jit(lambda p, d: model.apply(p, 1, d, (H, W), method="head"))
    r = head(params, d1)
    t_head = timeit(head, params, d1)

    print(f"{name}: encode(2B imgs) {t_enc:.1f} ms, decode {t_dec:.1f} ms, head1 {t_head:.1f} ms (x2 heads)", flush=True)
    print(f"  => full pair batch ~ {t_enc + t_dec + 2*t_head:.1f} ms vs measured 166", flush=True)
