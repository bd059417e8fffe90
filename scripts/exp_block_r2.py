"""Where do the encoder's 3.85 ms/layer go? In-graph marginal timing of
one ViT-L block and its parts at the 512x384 16-image shape."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dust3r_tpu.models.blocks import Block, LayerNormF32
import flax.linen as nn


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


def timeit(f, *a, iters=10, rounds=4):
    out = f(*a)
    sync(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def chain_time(build_fn, x0, n=8, **kw):
    def chained(m):
        @jax.jit
        def f(x):
            out = x
            for _ in range(m):
                out = build_fn(out)
            return out
        return f

    t1 = timeit(chained(1), x0, **kw)
    tn = timeit(chained(n), x0, **kw)
    return (tn - t1) / (n - 1)


def main():
    print("devices:", jax.devices(), flush=True)
    B, N, D, H = 16, 768, 1024, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    ys, xs = np.meshgrid(np.arange(24), np.arange(32), indexing="ij")
    pos = jnp.asarray(np.stack([ys.ravel(), xs.ravel()], -1)[None]
                      .repeat(B, 0), jnp.int32)

    blk = Block(D, H, 4.0, 100.0, jnp.bfloat16, None)
    params = blk.init(jax.random.PRNGKey(0), x, pos)

    t = chain_time(lambda y: blk.apply(params, y, pos), x)
    print(f"full block          : {t:7.3f} ms", flush=True)

    # attention disabled (identity) - isolates MLP + norms + residuals
    class NoAttnBlock(nn.Module):
        @nn.compact
        def __call__(self, y):
            h = LayerNormF32(name="norm1")(y)
            h = nn.Dense(3 * D, dtype=jnp.bfloat16, name="qkv")(
                h.astype(jnp.bfloat16))
            y = y + h[..., :D].astype(y.dtype)
            h = LayerNormF32(name="norm2")(y)
            h = nn.Dense(4 * D, dtype=jnp.bfloat16, name="fc1")(
                h.astype(jnp.bfloat16))
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(D, dtype=jnp.bfloat16, name="fc2")(h)
            return y + h.astype(y.dtype)

    nab = NoAttnBlock()
    p2 = nab.init(jax.random.PRNGKey(0), x)
    t = chain_time(lambda y: nab.apply(p2, y), x)
    print(f"block minus attn    : {t:7.3f} ms  (qkv+mlp+norms)", flush=True)

    # pure GEMM chain at the MLP shape
    w1 = jnp.asarray(rng.standard_normal((D, 4 * D)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((4 * D, D)) * 0.02, jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)

    def gemms(y):
        h = jnp.dot(y, w1, preferred_element_type=jnp.bfloat16)
        return jnp.dot(h, w2, preferred_element_type=jnp.bfloat16)

    t = chain_time(gemms, xb)
    fl = 2 * B * N * D * 4 * D * 2
    print(f"mlp gemms bf16      : {t:7.3f} ms  {fl / t / 1e9:6.1f} TF/s",
          flush=True)

    def gemms_gelu(y):
        h = jnp.dot(y, w1, preferred_element_type=jnp.bfloat16)
        h = nn.gelu(h, approximate=False)
        return jnp.dot(h, w2, preferred_element_type=jnp.bfloat16)

    t = chain_time(gemms_gelu, xb)
    print(f"mlp gemms + gelu    : {t:7.3f} ms", flush=True)

    # layernorm fp32 cost
    ln = LayerNormF32()
    p3 = ln.init(jax.random.PRNGKey(0), x)

    def lnf(y):
        return ln.apply(p3, y) + y

    t = chain_time(lnf, x)
    print(f"layernorm fp32      : {t:7.3f} ms", flush=True)

    # fp32 params cast cost: weights stored fp32, cast to bf16 per use
    w1f, w2f = w1.astype(jnp.float32), w2.astype(jnp.float32)

    def gemms_cast(y):
        h = jnp.dot(y, w1f.astype(jnp.bfloat16),
                    preferred_element_type=jnp.bfloat16)
        return jnp.dot(h, w2f.astype(jnp.bfloat16),
                       preferred_element_type=jnp.bfloat16)

    t = chain_time(gemms_cast, xb)
    print(f"mlp gemms fp32-cast : {t:7.3f} ms", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
