"""Secondary benchmark sweep: all BASELINE tracked configs (stderr only).

Not run by the driver (bench.py stays the single headline); use manually:
    python scripts/bench_all_configs.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


def bench_pairs(ctor, name, B, H, W, iters=10):
    model = ctor(dtype=jnp.bfloat16)
    imgs = [jax.random.normal(jax.random.PRNGKey(i), (B, H, W, 3), jnp.float32)
            for i in range(3)]

    @jax.jit
    def init_bf16(key, i1, i2):
        p = model.init(key, i1, i2)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, p)

    params = init_bf16(jax.random.PRNGKey(9), imgs[0][:1], imgs[1][:1])
    sync(params["params"]["enc_norm"]["ln"]["scale"])

    @jax.jit
    def fwd(p, a, b):
        r1, r2 = model.apply(p, a, b)
        return r1["pts3d"], r2["pts3d_in_other_view"]

    out = fwd(params, imgs[0], imgs[1]); sync(out[0])
    t0 = time.perf_counter()
    for i in range(iters):
        out = fwd(params, imgs[i % 3], imgs[(i + 1) % 3])
    sync(out[0])
    dt = time.perf_counter() - t0
    log(f"{name} B={B} {W}x{H}: {dt / iters * 1e3:.1f} ms/iter, "
        f"{B * iters / dt:.2f} pairs/s")


def main():
    from dust3r_tpu.models.model import (dust3r_224_linear,
                                         dust3r_512_linear, dust3r_512_dpt)

    log(f"devices: {jax.devices()}")
    bench_pairs(dust3r_224_linear, "224_linear", 16, 224, 224)
    # multi-AR buckets for 512_linear (BASELINE tracked config)
    for (H, W) in [(384, 512), (336, 512), (288, 512), (256, 512), (160, 512)]:
        bench_pairs(dust3r_512_linear, "512_linear", 8, H, W, iters=5)
    bench_pairs(dust3r_512_dpt, "512_dpt", 8, 384, 512)


if __name__ == "__main__":
    main()
