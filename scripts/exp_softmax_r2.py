"""Unsafe softmax (skip max-subtraction) in the attention kernel: worth it?

The per-head softmax costs a (N,N) max-reduce + broadcast-subtract pass
before exp. LN'd inputs bound |logits| well inside fp32 exp range
(overflow needs |logit| > 88), so a 'fast' mode could skip it. Measure the
kernel delta at the encoder shape before deciding to expose a knob.
"""
import functools, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from dust3r_tpu.ops.pallas_attention import (_rope_tables, _apply_rope_tile,
                                             fused_attention)


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


def timeit(f, *a, iters=10, rounds=4):
    out = f(*a); sync(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def kern(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref, o_ref,
         *, scale, G, safe):
    in_dtype = q_ref.dtype
    d = q_ref.shape[-1]
    Nk = k_ref.shape[-2]
    cq, sq = cq_ref[0], sq_ref[0]
    ck, sk = ck_ref[0], sk_ref[0]
    ps = []
    for h in range(G):
        q = q_ref[0, 0, h].astype(jnp.float32)
        k = k_ref[0, 0, h].astype(jnp.float32)
        q = _apply_rope_tile(q, cq, sq)
        k = _apply_rope_tile(k, ck, sk)
        q = (q * scale).astype(in_dtype)
        k = k.astype(in_dtype)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if safe:
            s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        ps.append(p.astype(in_dtype))
    for h in range(G):
        v_aug = jnp.concatenate(
            [v_ref[0, 0, h].astype(jnp.float32),
             jnp.ones((Nk, 128 - d), jnp.float32)], axis=-1)
        o_aug = jnp.dot(ps[h], v_aug.astype(in_dtype),
                        preferred_element_type=jnp.float32)
        o_ref[0, 0, h] = (o_aug[:, :d] / o_aug[:, d:d + 1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("safe",))
def attn(q, k, v, pos, safe=True):
    B, H, N, d = q.shape
    G = 2
    cs, sn = _rope_tables(pos, d, 100.0)
    f = functools.partial(kern, scale=d ** -0.5, G=G, safe=safe)
    qkvspec = pl.BlockSpec((1, G, N, d), lambda b, j: (b, j, 0, 0))
    rspec = pl.BlockSpec((1, N, d), lambda b, j: (b, 0, 0))
    qr = q.reshape(B, H // G, G, N, d)
    kr = k.reshape(B, H // G, G, N, d)
    vr = v.reshape(B, H // G, G, N, d)
    out = pl.pallas_call(
        f, grid=(B, H // G),
        in_specs=[pl.BlockSpec((1, 1, G, N, d), lambda b, j: (b, j, 0, 0, 0))] * 3
        + [rspec] * 4,
        out_specs=pl.BlockSpec((1, 1, G, N, d), lambda b, j: (b, j, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H // G, G, N, d), q.dtype),
    )(qr, kr, vr, cs, sn, cs, sn)
    return out.reshape(B, H, N, d)


def main():
    print("devices:", jax.devices(), flush=True)
    B, H, N, d = 16, 16, 768, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.bfloat16)
    ys, xs = np.meshgrid(np.arange(24), np.arange(32), indexing="ij")
    pos = jnp.asarray(np.stack([ys.ravel(), xs.ravel()], -1)[None]
                      .repeat(B, 0), jnp.int32)
    o_ref = fused_attention(q, k, v, pos, pos)
    for safe in (True, False):
        o = attn(q, k, v, pos, safe=safe)
        err = float(jnp.max(jnp.abs(o.astype(jnp.float32)
                                    - o_ref.astype(jnp.float32))))
        t = timeit(functools.partial(attn, safe=safe), q, k, v, pos)
        print(f"safe={safe}: {t:7.3f} ms  (maxerr vs prod {err:.2e})",
              flush=True)
    print(f"prod kernel    : {timeit(fused_attention, q, k, v, pos):7.3f} ms",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
