"""Does a qkv-layout attention kernel (no head transposes) beat
transpose + per-head kernel?

Variant A (current model path): qkv (B,N,3C) -> reshape/transpose to
(B,H,N,d) x3 -> g-heads kernel -> transpose back to (B,N,C).
Variant B: kernel consumes qkv (B,N,3,H,d) directly (block keeps the
trailing (H,d) dims whole; heads sliced statically in-kernel) and writes
(B,N,C) directly.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dust3r_tpu.ops.pallas_attention import (_rope_tables, _apply_rope_tile,
                                             fused_attention)


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


def chain_time(fn, x0, n=8, **kw):
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


def packed_attention_kernel(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref,
                            sk_ref, o_ref, *, scale, H):
    """q_ref: (1, Nq_tile, C) row tile; k/v_ref: (1, Nk, C); heads are
    lane slices (d=C/H wide). o_ref: (1, Nq_tile, C)."""
    in_dtype = q_ref.dtype
    C = q_ref.shape[-1]
    d = C // H
    cq, sq = cq_ref[0], sq_ref[0]
    ck, sk = ck_ref[0], sk_ref[0]

    outs = []
    for h in range(H):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0][:, sl].astype(jnp.float32)
        k = k_ref[0][:, sl].astype(jnp.float32)
        v = v_ref[0][:, sl]
        q = _apply_rope_tile(q, cq, sq)
        k = _apply_rope_tile(k, ck, sk)
        q = (q * scale).astype(in_dtype)
        k = k.astype(in_dtype)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(in_dtype), v,
                    preferred_element_type=jnp.float32)
        outs.append((o / l).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def attn_qkv_layout(qkv, pos, H, rope_base=100.0, q_tile=256):
    """qkv: (B, N, 3C). Returns (B, N, C). No head transposes anywhere:
    q/k/v stay head-packed (B, N, C); heads are lane slices in-kernel."""
    B, N, C3 = qkv.shape
    C = C3 // 3
    d = C // H
    cq, sq = _rope_tables(pos, d, rope_base)
    q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]
    NT = N // q_tile if N % q_tile == 0 else 1
    qt = N // NT
    kernel = functools.partial(packed_attention_kernel, scale=d ** -0.5, H=H)

    out = pl.pallas_call(
        kernel,
        grid=(B, NT),
        in_specs=[
            pl.BlockSpec((1, qt, C), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, n: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, n: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qt, d), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qt, d), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, d), lambda b, n: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, d), lambda b, n: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qt, C), lambda b, n: (b, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (N * N * d * 2),
            bytes_accessed=qkv.size * qkv.dtype.itemsize,
            transcendentals=B * H * N * N,
        ),
    )(q, k, v, cq, sq, cq, sq)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    for (B, H, N, d) in [(16, 16, 768, 64), (8, 12, 768, 64)]:
        C = H * d
        rng = np.random.default_rng(0)
        qkv = jnp.asarray(rng.standard_normal((B, N, 3 * C)), jnp.bfloat16)
        Ht, Wt = (24, 32)
        ys, xs = np.meshgrid(np.arange(Ht), np.arange(Wt), indexing="ij")
        pos = jnp.asarray(np.stack([ys.ravel(), xs.ravel()], -1)[None]
                          .repeat(B, 0), jnp.int32)

        flops = 4 * B * H * N * N * d
        # realistic chaining: a proj-like GEMM C -> 3C follows attention so
        # XLA gets the same fusion opportunities the model has
        wp = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.02, jnp.bfloat16)

        def variant_a(x):
            qkv5 = x.reshape(B, N, 3, H, d).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv5[0], qkv5[1], qkv5[2]
            o = fused_attention(q, k, v, pos, pos)
            o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
            return jnp.dot(o, wp, preferred_element_type=jnp.bfloat16)

        def variant_b(x):
            o = attn_qkv_layout(x, pos, H)
            return jnp.dot(o, wp, preferred_element_type=jnp.bfloat16)

        # variant C: GEMM writes the kernel layout directly (einsum folds
        # the transpose into the matmul's output pattern); input is x (B,N,C)
        wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.02,
                           jnp.bfloat16)
        wqkv5 = wqkv.reshape(C, 3, H, d)
        wp2 = jnp.asarray(rng.standard_normal((C, C)) * 0.02, jnp.bfloat16)
        wp5 = wp2.reshape(H, d, C)
        x0 = jnp.asarray(rng.standard_normal((B, N, C)), jnp.bfloat16)

        def variant_c(x):
            qkv5 = jnp.einsum("bnc,cthd->tbhnd", x, wqkv5,
                              preferred_element_type=jnp.bfloat16)
            o = fused_attention(qkv5[0], qkv5[1], qkv5[2], pos, pos)
            return jnp.einsum("bhnd,hdc->bnc", o, wp5,
                              preferred_element_type=jnp.bfloat16)

        def variant_d(x):
            qkv_flat = jnp.dot(x, wqkv, preferred_element_type=jnp.bfloat16)
            qkv5 = qkv_flat.reshape(B, N, 3, H, d).transpose(2, 0, 3, 1, 4)
            o = fused_attention(qkv5[0], qkv5[1], qkv5[2], pos, pos)
            o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
            return jnp.dot(o, wp2, preferred_element_type=jnp.bfloat16)

        tc = chain_time(variant_c, x0)
        td = chain_time(variant_d, x0)
        oc = jax.jit(variant_c)(x0)
        od = jax.jit(variant_d)(x0)
        errcd = float(jnp.max(jnp.abs(oc.astype(jnp.float32)
                                      - od.astype(jnp.float32))))
        print(f"({B},{H},{N},{d}) D gemm+transpose  : {td:7.3f} ms", flush=True)
        print(f"({B},{H},{N},{d}) C einsum-layout   : {tc:7.3f} ms  "
              f"(maxerr {errcd:.2e})", flush=True)

        ta = chain_time(variant_a, qkv)
        print(f"({B},{H},{N},{d}) A transpose+kernel: {ta:7.3f} ms  "
              f"{flops / ta / 1e9:6.1f} TF/s", flush=True)
        t0 = time.perf_counter()
        ob = jax.jit(variant_b)(qkv)
        sync(ob)
        print(f"  B compile: {time.perf_counter() - t0:.1f}s", flush=True)
        tb = chain_time(variant_b, qkv)
        oa = jax.jit(variant_a)(qkv)
        err = float(jnp.max(jnp.abs(oa.astype(jnp.float32)
                                    - ob.astype(jnp.float32))))
        print(f"({B},{H},{N},{d}) B qkv-layout      : {tb:7.3f} ms  "
              f"{flops / tb / 1e9:6.1f} TF/s  (maxerr {err:.2e})", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
