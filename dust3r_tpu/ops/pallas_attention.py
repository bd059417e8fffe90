"""Fused attention + 2D RoPE Pallas kernel for TPU.

Replaces the reference's curope CUDA extension + separate attention matmuls
(SURVEY.md §2.10). DUSt3R sequences are short (<= ~1200 tokens at 512
resolutions, patch 16), so the right TPU design is NOT long-seq flash
tiling: one grid program per (batch, head) keeps q/k/v AND the full logits
tile resident in VMEM, fusing RoPE application, q.k^T, softmax and P.v into
a single kernel - the (N, N) attention matrix never touches HBM.

RoPE convention (croco RoPE100): head_dim split in two halves (y | x);
each half rotated by its coordinate's frequencies with rotate-half pairing.
cos/sin tables are precomputed per (B, N) once per shape (they depend only
on token positions, shared across heads and layers).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rope import rope_cos_sin

# interpret mode runs the kernel as plain jax on any backend - used by the
# CPU test suite to exercise the kernel math without a TPU
_INTERPRET = bool(os.environ.get("DUST3R_TPU_PALLAS_INTERPRET"))


def _rope_tables(positions, head_dim, base):
    """cos/sin of shape (B, N, head_dim), halves laid out [y | x]."""
    d = head_dim // 2
    cos_y, sin_y = rope_cos_sin(positions[..., 0], d, base, jnp.float32)
    cos_x, sin_x = rope_cos_sin(positions[..., 1], d, base, jnp.float32)
    return (jnp.concatenate([cos_y, cos_x], axis=-1),
            jnp.concatenate([sin_y, sin_x], axis=-1))


def _apply_rope_tile(t, cos, sin):
    """t (N, d) with halves [y | x]; rotate-half within each half."""
    d = t.shape[-1]
    h, q = d // 2, d // 4
    ty, tx = t[:, :h], t[:, h:]
    rot = jnp.concatenate([-ty[:, q:], ty[:, :q], -tx[:, q:], tx[:, :q]],
                          axis=-1)
    return t * cos + rot * sin


def _attn_kernel_multihead(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref,
                           sk_ref, o_ref, *, scale, use_rope, n_heads):
    """G heads per grid program: amortizes per-program latency over
    several (small) per-head matmuls. Refs are (G, N, d)."""
    in_dtype = q_ref.dtype
    if use_rope:
        cq, sq = cq_ref[0], sq_ref[0]
        ck, sk = ck_ref[0], sk_ref[0]

    def body(h, _):
        q = q_ref[h].astype(jnp.float32)
        k = k_ref[h].astype(jnp.float32)
        if use_rope:
            q2 = _apply_rope_tile(q, cq, sq)
            k2 = _apply_rope_tile(k, ck, sk)
        else:
            q2, k2 = q, k
        q2 = (q2 * scale).astype(in_dtype)
        k2 = k2.astype(in_dtype)
        s = jax.lax.dot_general(q2, k2, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        # normalize the (N, d) output rather than the (N, N) matrix:
        # one fewer full pass over the attention matrix on the VPU
        o = jnp.dot(p.astype(v_ref.dtype), v_ref[h],
                    preferred_element_type=jnp.float32)
        o_ref[h] = (o / l).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_heads, body, 0)


def _fused_attention_simple(q, k, v, cq, sq, ck, sk, use_rope):
    """One (batch, head) per grid program - the fast-compiling default."""
    B, H, Nq, d = q.shape
    Nk = k.shape[2]
    qf = q.reshape(B * H, Nq, d)
    kf = k.reshape(B * H, Nk, d)
    vf = v.reshape(B * H, Nk, d)
    Ncq = cq.shape[1]
    Nck = ck.shape[1]
    kernel = functools.partial(_attn_kernel, scale=d ** -0.5,
                               use_rope=use_rope)
    out = pl.pallas_call(
        kernel,
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, Nq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ncq, d), lambda i, H=H: (i // H, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ncq, d), lambda i, H=H: (i // H, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nck, d), lambda i, H=H: (i // H, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nck, d), lambda i, H=H: (i // H, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Nq, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Nq, d), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (Nq * Nk * d * 2),
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=B * H * Nq * Nk,
        ),
        interpret=_INTERPRET,
    )(qf, kf, vf, cq, sq, ck, sk)
    return out.reshape(B, H, Nq, d)


def _attn_kernel(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref, o_ref,
                 *, scale, use_rope):
    # RoPE is applied in fp32 for accuracy, but the matmuls MUST run on
    # bf16 inputs (fp32 MXU matmul decomposes into ~6 bf16 passes);
    # accumulation stays fp32 via preferred_element_type.
    in_dtype = q_ref.dtype
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    if use_rope:
        q = _apply_rope_tile(q, cq_ref[0], sq_ref[0])
        k = _apply_rope_tile(k, ck_ref[0], sk_ref[0])
    q = (q * scale).astype(in_dtype)
    k = k.astype(in_dtype)
    s = jax.lax.dot_general(q, k,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (Nq, Nk)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    # normalize the (N, d) output rather than the (N, N) matrix:
    # one fewer full pass over the attention matrix on the VPU
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rope_base", "heads_per_program"))
def fused_attention(q, k, v, positions_q=None, positions_k=None,
                    rope_base=100.0, heads_per_program=1):
    # NOTE heads_per_program>1 amortizes grid overhead (~5% faster in
    # isolation) but its dynamic VMEM indexing makes Mosaic compile each
    # of the model's ~72 kernel instances far slower - keep G=1 default.
    """q,k,v: (B, H, N, d). positions: (B, N, 2) int or None (no RoPE)."""
    B, H, Nq, d = q.shape
    Nk = k.shape[2]
    use_rope = positions_q is not None

    if use_rope:
        cq, sq = _rope_tables(positions_q, d, rope_base)
        ck, sk = _rope_tables(positions_k, d, rope_base)
    else:
        cq = sq = jnp.ones((B, 1, d), jnp.float32)
        ck = sk = jnp.ones((B, 1, d), jnp.float32)

    G = heads_per_program
    while H % G:
        G //= 2
    if G == 1:
        return _fused_attention_simple(q, k, v, cq, sq, ck, sk, use_rope)
    qf = q.reshape(B * H, Nq, d)
    kf = k.reshape(B * H, Nk, d)
    vf = v.reshape(B * H, Nk, d)

    Ncq = cq.shape[1]
    Nck = ck.shape[1]
    grid = (B * H // G,)
    kernel = functools.partial(_attn_kernel_multihead, scale=d ** -0.5,
                               use_rope=use_rope, n_heads=G)
    HG = H // G  # programs per batch entry
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, Nq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Nk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Nk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ncq, d), lambda i, HG=HG: (i // HG, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ncq, d), lambda i, HG=HG: (i // HG, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nck, d), lambda i, HG=HG: (i // HG, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nck, d), lambda i, HG=HG: (i // HG, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, Nq, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Nq, d), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (Nq * Nk * d * 2),
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=B * H * Nq * Nk,
        ),
        interpret=_INTERPRET,
    )(qf, kf, vf, cq, sq, ck, sk)
    return out.reshape(B, H, Nq, d)
