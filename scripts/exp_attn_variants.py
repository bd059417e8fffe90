"""Microbench: softmax-precision variants of the fused attention kernel.

The kernel is VPU-bound (softmax over the (N, N) tile); these variants cut
VPU bytes/ops on that tile. Run on the real chip:
    python scripts/exp_attn_variants.py
Accuracy is checked against the fp32 XLA reference before timing.
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dust3r_tpu.ops.pallas_attention import _rope_tables, _apply_rope_tile
from dust3r_tpu.ops.attention import attention_ref

B, H, N, d = 16, 16, 768, 64


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


def kern_base(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref, o_ref,
              *, scale):
    in_dtype = q_ref.dtype
    q = _apply_rope_tile(q_ref[0].astype(jnp.float32), cq_ref[0], sq_ref[0])
    k = _apply_rope_tile(k_ref[0].astype(jnp.float32), ck_ref[0], sk_ref[0])
    q = (q * scale).astype(in_dtype)
    k = k.astype(in_dtype)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v_ref.dtype), v_ref[0],
                preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def kern_bf16exp(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref, o_ref,
                 *, scale):
    """exp on bf16 (the P matrix is consumed in bf16 by the MXU anyway);
    denominator accumulated fp32."""
    in_dtype = q_ref.dtype
    q = _apply_rope_tile(q_ref[0].astype(jnp.float32), cq_ref[0], sq_ref[0])
    k = _apply_rope_tile(k_ref[0].astype(jnp.float32), ck_ref[0], sk_ref[0])
    q = (q * scale).astype(in_dtype)
    k = k.astype(in_dtype)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp((s - m).astype(jnp.bfloat16))
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    o = jnp.dot(p, v_ref[0], preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def kern_bf16s(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref, o_ref,
               *, scale):
    """logits kept bf16 straight out of the MXU: every softmax pass touches
    half the bytes. m/l still fp32-safe (max exact, sum accumulated fp32)."""
    in_dtype = q_ref.dtype
    q = _apply_rope_tile(q_ref[0].astype(jnp.float32), cq_ref[0], sq_ref[0])
    k = _apply_rope_tile(k_ref[0].astype(jnp.float32), ck_ref[0], sk_ref[0])
    q = (q * scale).astype(in_dtype)
    k = k.astype(in_dtype)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.bfloat16)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    o = jnp.dot(p, v_ref[0], preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def build(kern):
    kernel = functools.partial(kern, scale=d ** -0.5)

    @jax.jit
    def f(q, k, v, cq, sq, ck, sk):
        qf = q.reshape(B * H, N, d)
        kf = k.reshape(B * H, N, d)
        vf = v.reshape(B * H, N, d)
        spec_qkv = pl.BlockSpec((1, N, d), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        spec_tab = pl.BlockSpec((1, N, d), lambda i: (i // H, 0, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel, grid=(B * H,),
            in_specs=[spec_qkv] * 3 + [spec_tab] * 4,
            out_specs=spec_qkv,
            out_shape=jax.ShapeDtypeStruct((B * H, N, d), v.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * H * (N * N * d * 2),
                bytes_accessed=(qf.size + kf.size + vf.size) * 2,
                transcendentals=B * H * N * N),
        )(qf, kf, vf, cq, sq, ck, sk)
        return out.reshape(B, H, N, d)

    return f


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.bfloat16)
    pos = jnp.asarray(
        np.stack(np.meshgrid(np.arange(24), np.arange(32), indexing="ij"),
                 -1).reshape(1, N, 2).repeat(B, 0), jnp.int32)
    cq, sq = _rope_tables(pos, d, 100.0)
    ref = attention_ref(q, k, v, pos, pos)
    ref32 = np.asarray(ref, np.float32)

    for name, kern in [("base", kern_base), ("bf16exp", kern_bf16exp),
                       ("bf16s", kern_bf16s)]:
        f = build(kern)
        out = f(q, k, v, cq, sq, cq, sq)
        err = np.abs(np.asarray(out, np.float32) - ref32)
        rel = np.median(err / (np.abs(ref32) + 1e-6))
        sync(out)
        t0 = time.perf_counter()
        iters = 50
        for _ in range(iters):
            out = f(q, k, v, cq, sq, cq, sq)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:8s}  {dt*1e3:6.2f} ms   max_abs_err={err.max():.4f} "
              f"median_rel={rel:.5f}", flush=True)


if __name__ == "__main__":
    main()
