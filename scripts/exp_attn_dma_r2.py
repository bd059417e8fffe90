"""Can the pallas DMA absorb the head transposes?

Current model path (variant A/D, exp_attn_layout_r2): qkv gemm (B,N,3C) ->
XLA transpose to 3x(B,H,N,d) -> kernel -> transpose back. The two XLA
relayouts cost ~0.5 ms/layer at the encoder shape - as much as the kernel.

Variant E here: pallas_call reads the RAW (B, N, 3C) gemm output three
times with different BlockSpec index maps - block (1, N, 2*d) = 128 lanes
(Mosaic-legal), grid (B, H/2) - so the head gather happens inside the
HBM->VMEM DMA (strided reads are native to the DMA engine, no relayout
pass). In-kernel, the two heads of a program are 64-lane half-slices.
Output written head-packed (B, N, C) directly: no merge transpose either.
Weight column order must put q|k|v in head-major order - which the
standard fused qkv weight already does.

Compare end-to-end chains: gemm + attention + out-proj for (current A)
vs (E). Numerics must match A to bf16 tolerance.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
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


def dma_kernel(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref, o_ref,
               *, scale, G, d):
    """q/k/v_ref: (1, N, G*d) - G heads side by side in lanes."""
    in_dtype = q_ref.dtype
    Nk = k_ref.shape[1]
    cq, sq = cq_ref[0], sq_ref[0]
    ck, sk = ck_ref[0], sk_ref[0]

    ps = []
    for h in range(G):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0][:, sl].astype(jnp.float32)
        k = k_ref[0][:, sl].astype(jnp.float32)
        q = _apply_rope_tile(q, cq, sq)
        k = _apply_rope_tile(k, ck, sk)
        q = (q * scale).astype(in_dtype)
        k = k.astype(in_dtype)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        ps.append(p.astype(in_dtype))

    outs = []
    for h in range(G):
        sl = slice(h * d, (h + 1) * d)
        v_aug = jnp.concatenate(
            [v_ref[0][:, sl].astype(jnp.float32),
             jnp.ones((Nk, 128 - d), jnp.float32)], axis=-1)
        o_aug = jnp.dot(ps[h], v_aug.astype(in_dtype),
                        preferred_element_type=jnp.float32)
        outs.append((o_aug[:, :d] / o_aug[:, d:d + 1]))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("H", "rope_base"))
def attn_dma(qkv, pos, H, rope_base=100.0):
    """qkv: (B, N, 3C) raw gemm output, head-major within each third.
    Returns (B, N, C) head-packed. G=2 heads per program."""
    B, N, C3 = qkv.shape
    C = C3 // 3
    d = C // H
    G = 2
    cs_q, sn_q = _rope_tables(pos, d, rope_base)
    kernel = functools.partial(dma_kernel, scale=d ** -0.5, G=G, d=d)
    gd = G * d

    def spec(third):
        # block (1, N, G*d) at lane offset third*C + j*G*d (in block units)
        off = third * (C // gd)
        return pl.BlockSpec((1, N, gd), lambda b, j, o=off: (b, 0, o + j),
                            memory_space=pltpu.VMEM)

    rope_spec = pl.BlockSpec((1, N, d), lambda b, j: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, H // G),
        in_specs=[spec(0), spec(1), spec(2),
                  rope_spec, rope_spec, rope_spec, rope_spec],
        out_specs=pl.BlockSpec((1, N, gd), lambda b, j: (b, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
    )(qkv, qkv, qkv, cs_q, sn_q, cs_q, sn_q)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    for (B, H, N, d) in [(16, 16, 768, 64), (8, 12, 768, 64)]:
        C = H * d
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.standard_normal((B, N, C)), jnp.bfloat16)
        Ht, Wt = (24, 32)
        ys, xs = np.meshgrid(np.arange(Ht), np.arange(Wt), indexing="ij")
        pos = jnp.asarray(np.stack([ys.ravel(), xs.ravel()], -1)[None]
                          .repeat(B, 0), jnp.int32)
        wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.02,
                           jnp.bfloat16)
        wp = jnp.asarray(rng.standard_normal((C, C)) * 0.02, jnp.bfloat16)
        flops = 4 * B * H * N * N * d

        def variant_a(x):
            qkv_flat = jnp.dot(x, wqkv, preferred_element_type=jnp.bfloat16)
            qkv5 = qkv_flat.reshape(B, N, 3, H, d).transpose(2, 0, 3, 1, 4)
            o = fused_attention(qkv5[0], qkv5[1], qkv5[2], pos, pos)
            o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
            return jnp.dot(o, wp, preferred_element_type=jnp.bfloat16)

        def variant_e(x):
            qkv_flat = jnp.dot(x, wqkv, preferred_element_type=jnp.bfloat16)
            o = attn_dma(qkv_flat, pos, H)
            return jnp.dot(o, wp, preferred_element_type=jnp.bfloat16)

        t0 = time.perf_counter()
        oe = jax.jit(variant_e)(x0)
        sync(oe)
        print(f"  E compile: {time.perf_counter() - t0:.1f}s", flush=True)
        oa = jax.jit(variant_a)(x0)
        err = float(jnp.max(jnp.abs(oe.astype(jnp.float32)
                                    - oa.astype(jnp.float32))))
        ta = chain_time(variant_a, x0)
        te = chain_time(variant_e, x0)
        print(f"({B},{H},{N},{d}) A transpose+kernel: {ta:7.3f} ms "
              f"  {flops / ta / 1e9:5.1f} TF/s(attn)", flush=True)
        print(f"({B},{H},{N},{d}) E dma-gather      : {te:7.3f} ms "
              f"  (maxerr {err:.2e})", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
