"""DPT head: fp32 vs bf16-trunk speed + accuracy on the real TPU.

The fp32 DPT head costs 2x24.5 ms of the 512x384 pair forward. The trunk
convs are MXU-bound; fp32 matmuls decompose ~6x on the MXU, so a bf16
trunk (postprocess stays fp32, heads.py already casts before expm1)
should be ~3x faster. VERDICT r1 asks for the measured RMSE vs the 1e-2
parity budget.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


def timeit(f, *a, iters=10, rounds=4):
    out = f(*a)
    sync(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        sync(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    from dust3r_tpu.models.model import dust3r_512_dpt

    print("devices:", jax.devices(), flush=True)
    B, H, W = 8, 384, 512

    model32 = dust3r_512_dpt(dtype=jnp.bfloat16, head_dtype=jnp.float32)
    model16 = dust3r_512_dpt(dtype=jnp.bfloat16, head_dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (2, H, W, 3), jnp.float32)

    @jax.jit
    def init(key, i):
        return model32.init(key, i[:1], i[1:2])

    params = init(jax.random.PRNGKey(1), img)
    sync(params["params"]["enc_norm"]["ln"]["scale"])
    print("init done", flush=True)

    # realistic decoder outputs: random tokens at the real scale
    S, D_enc, D_dec = (H // 16) * (W // 16), 1024, 768
    r = np.random.default_rng(0)
    decout = [jnp.asarray(r.standard_normal((B, S, D_enc)), jnp.float32)]
    decout += [jnp.asarray(r.standard_normal((B, S, D_dec)), jnp.float32)
               for _ in range(12)]

    h32 = jax.jit(lambda p, d: model32.apply(p, 1, d, (H, W), method="head"))
    h16 = jax.jit(lambda p, d: model16.apply(p, 1, d, (H, W), method="head"))

    o32 = h32(params, decout)
    o16 = h16(params, decout)
    t32 = timeit(h32, params, decout)
    t16 = timeit(h16, params, decout)
    print(f"dpt head fp32 : {t32:6.1f} ms", flush=True)
    print(f"dpt head bf16 : {t16:6.1f} ms  ({t32 / t16:.2f}x)", flush=True)

    p32, p16 = o32["pts3d"], o16["pts3d"]
    scale = float(jnp.sqrt(jnp.mean(p32 ** 2)))
    rmse = float(jnp.sqrt(jnp.mean((p32 - p16) ** 2)))
    mx = float(jnp.max(jnp.abs(p32 - p16)))
    c32, c16 = o32["conf"], o16["conf"]
    crmse = float(jnp.sqrt(jnp.mean((c32 - c16) ** 2)))
    print(f"pts3d  RMSE {rmse:.2e} (rel {rmse / scale:.2e}, max {mx:.2e}, "
          f"scale {scale:.2e})", flush=True)
    print(f"conf   RMSE {crmse:.2e}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
