"""Decoder layer-pair: current 2x DecoderBlock vs stacked-stream prototype.

The two per-layer decoder blocks (dec_blocks[i] on stream 1, dec_blocks2[i]
on stream 2) both consume the PREVIOUS layer's (x1, x2) - they are
independent within a layer (reference dust3r/model.py:180-186). So the
streams can be stacked on a leading axis: every Dense becomes one batched
einsum over stacked weights (2, D, E) and the four attention calls
(self x2, cross x2) become two at doubled batch.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dust3r_tpu.models.blocks import DecoderBlock, gelu
from dust3r_tpu.ops.attention import attention


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


B, N, D, H = 8, 768, 768, 12
dh = D // H
DT = jnp.bfloat16


def make_stacked_params(rng):
    def w(*shape, scale=0.02):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)
    return dict(
        n1_s=w(2, D, scale=1), n1_b=w(2, D),
        qkv_w=w(2, D, 3 * D), qkv_b=w(2, 3 * D),
        o_w=w(2, D, D), o_b=w(2, D),
        n2_s=w(2, D, scale=1), n2_b=w(2, D),
        ny_s=w(2, D, scale=1), ny_b=w(2, D),
        q_w=w(2, D, D), q_b=w(2, D),
        k_w=w(2, D, D), k_b=w(2, D),
        v_w=w(2, D, D), v_b=w(2, D),
        co_w=w(2, D, D), co_b=w(2, D),
        n3_s=w(2, D, scale=1), n3_b=w(2, D),
        fc1_w=w(2, D, 4 * D), fc1_b=w(2, 4 * D),
        fc2_w=w(2, 4 * D, D), fc2_b=w(2, D),
    )


def ln(x, s, b):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + 1e-6)
    return (y * s[:, None, None] + b[:, None, None]).astype(x.dtype)


def pe(x, w, b):  # per-stream einsum: x (2,B,N,*), w (2,*,E)
    y = jnp.einsum("sbnd,sde->sbne", x, w.astype(x.dtype),
                   preferred_element_type=x.dtype)
    return y + b.astype(x.dtype)[:, None, None]


def heads_split(t):  # (2,B,N,D) -> (2B,H,N,dh)
    t = t.reshape(2 * B, N, H, dh)
    return t.transpose(0, 2, 1, 3)


def heads_merge(t):  # (2B,H,N,dh) -> (2,B,N,D)
    return t.transpose(0, 2, 1, 3).reshape(2, B, N, D)


def stacked_layer(p, pos2b):
    def f(x):  # x: (2, B, N, D) bf16
        y = x[::-1]
        h = ln(x, p["n1_s"], p["n1_b"])
        qkv = pe(h, p["qkv_w"], p["qkv_b"]).reshape(2 * B, N, 3, H, dh)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        o = attention(q, k, v, pos2b, pos2b, 100.0, impl="pallas")
        x = x + pe(heads_merge(o), p["o_w"], p["o_b"])

        hq = ln(x, p["n2_s"], p["n2_b"])
        hy = ln(y, p["ny_s"], p["ny_b"])
        q = heads_split(pe(hq, p["q_w"], p["q_b"]))
        k = heads_split(pe(hy, p["k_w"], p["k_b"]))
        v = heads_split(pe(hy, p["v_w"], p["v_b"]))
        o = attention(q, k, v, pos2b, pos2b, 100.0, impl="pallas")
        x = x + pe(heads_merge(o), p["co_w"], p["co_b"])

        h = ln(x, p["n3_s"], p["n3_b"])
        h = pe(h, p["fc1_w"], p["fc1_b"])
        h = gelu(h)
        x = x + pe(h, p["fc2_w"], p["fc2_b"])
        return x
    return f


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal((B, N, D)), DT)
    x2 = jnp.asarray(rng.standard_normal((B, N, D)), DT)
    ys, xs = np.meshgrid(np.arange(24), np.arange(32), indexing="ij")
    pos = jnp.asarray(np.stack([ys.ravel(), xs.ravel()], -1)[None]
                      .repeat(B, 0), jnp.int32)
    pos2b = jnp.concatenate([pos, pos], 0)

    # current: two DecoderBlock applies
    blk = DecoderBlock(D, H, 4.0, 100.0, DT, None)
    p1 = blk.init(jax.random.PRNGKey(0), x1, x2, pos, pos)
    p2 = blk.init(jax.random.PRNGKey(1), x1, x2, pos, pos)

    def cur(xs_):
        a, b = xs_
        na, _ = blk.apply(p1, a, b, pos, pos)
        nb, _ = blk.apply(p2, b, a, pos, pos)
        return (na, nb)

    t = chain_time(cur, (x1, x2))
    print(f"current layer pair : {t:7.3f} ms", flush=True)

    # stacked prototype
    sp = make_stacked_params(rng)
    xst = jnp.stack([x1, x2])
    f = stacked_layer(sp, pos2b)
    t = chain_time(f, xst)
    print(f"stacked layer pair : {t:7.3f} ms", flush=True)

    # FLOP floor: the pure gemm chain at stream-stacked shapes
    wqkv = jnp.asarray(rng.standard_normal((2, D, 3 * D)) * 0.02, DT)
    wo = jnp.asarray(rng.standard_normal((2, D, D)) * 0.02, DT)
    wq = wk = wv = wco = wo
    wf1 = jnp.asarray(rng.standard_normal((2, D, 4 * D)) * 0.02, DT)
    wf2 = jnp.asarray(rng.standard_normal((2, 4 * D, D)) * 0.02, DT)

    def gemms(x):
        h = jnp.einsum("sbnd,sde->sbne", x, wqkv)[..., :D]
        h = h + jnp.einsum("sbnd,sde->sbne", h, wo)
        h = h + jnp.einsum("sbnd,sde->sbne", h, wq)
        h = h + jnp.einsum("sbnd,sde->sbne", h, wk)
        h = h + jnp.einsum("sbnd,sde->sbne", h, wv)
        h = h + jnp.einsum("sbnd,sde->sbne", h, wco)
        g = jnp.einsum("sbnd,sde->sbne", h, wf1)
        return h + jnp.einsum("sbne,sed->sbnd", g, wf2)

    t = chain_time(gemms, xst)
    fl = 2 * 2 * B * N * D * D * (3 + 5 + 8)
    print(f"gemm floor         : {t:7.3f} ms  {fl / t / 1e9:6.1f} TF/s",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
