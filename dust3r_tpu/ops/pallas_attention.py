"""Fused attention + 2D RoPE Pallas kernel for TPU.

Replaces the reference's curope CUDA extension + separate attention matmuls
(SURVEY.md §2.10). DUSt3R sequences are short (<= ~1200 tokens at 512
resolutions, patch 16), so the right TPU design is NOT long-seq flash
tiling: each grid program keeps q/k/v AND the full logits tiles resident in
VMEM, fusing RoPE application, q.k^T, softmax and P.v into a single kernel
- the (N, N) attention matrix never touches HBM.

Round-2 design (measured in-graph on v5e, scripts/exp_attn_r2.py; the
round-1 numbers were inflated ~4x by per-dispatch tunnel overhead):

  * G heads per grid program, STATICALLY unrolled (python loop over
    constant indices - no dynamic VMEM indexing, so Mosaic compile time
    stays low) in two phases: per-head q.k^T + softmax (one fp32 logits
    tile live at a time, probabilities accumulated in bf16 - they are
    cast to bf16 before the P.v matmul anyway, so numerics are bitwise
    identical), then all P.v matmuls. Keeping every head's fp32 logits
    alive across a full phase (the first v2 layout) peaked at ~17 MB
    scoped VMEM and failed to compile inside the full model
    (scripts/exp_attn_vmem_r2.py); this layout peaks at ~8 MB and is
    also slightly faster and 2.5x faster to Mosaic-compile.
  * the softmax row-sum is folded into the P.v matmul: v is padded to 128
    lanes with a ones-column, so one MXU pass yields [P@v | rowsum(P)] and
    the VPU sum pass over the (N, N) matrix disappears. d=64 only fills
    half the MXU output lanes anyway - the ones-column rides for free.
  * (16,16,768,64) bf16 w/ RoPE, in-graph marginal timing: 0.448 ms
    (86 TF/s) vs 0.57 ms for the 1-head/program round-1 kernel.

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

# VMEM budget for the per-program softmax tiles. Live set per program:
# G bf16 probability tiles + ONE fp32 logits tile (per-head softmax frees
# each fp32 tile before the next q.k^T). Kept well under the 16 MB scoped
# VMEM limit: inside the full-model program Mosaic does not reuse buffers
# across the unrolled head loop (G=4 at 768 tokens allocates 17 MB of
# stack and fails to compile there, while the same kernel standalone is
# fine), and G=2 measures within 3% of G=4 anyway (scripts/test_g2 run,
# 0.467 vs 0.455 ms at (16,16,768,64)).
_LOGITS_VMEM_BUDGET = 6 * 1024 * 1024


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


def _attn_kernel(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref, o_ref,
                 *, scale, use_rope, n_heads, fold_sum):
    """G statically-unrolled heads per program, phase-ordered.

    RoPE is applied in fp32 for accuracy, but the matmuls MUST run on bf16
    inputs (fp32 MXU matmul decomposes into ~6 bf16 passes); accumulation
    stays fp32 via preferred_element_type.
    """
    in_dtype = q_ref.dtype
    G = n_heads
    d = q_ref.shape[-1]
    Nk = k_ref.shape[1]
    if use_rope:
        cq, sq = cq_ref[0], sq_ref[0]
        ck, sk = ck_ref[0], sk_ref[0]

    ps, ls = [], []
    for h in range(G):  # phase 1: per-head q.k^T + softmax, p stored bf16
        q = q_ref[h].astype(jnp.float32)
        k = k_ref[h].astype(jnp.float32)
        if use_rope:
            q = _apply_rope_tile(q, cq, sq)
            k = _apply_rope_tile(k, ck, sk)
        q = (q * scale).astype(in_dtype)
        k = k.astype(in_dtype)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        if not fold_sum:
            ls.append(jnp.sum(p, axis=-1, keepdims=True))
        ps.append(p.astype(in_dtype))

    for h in range(G):  # phase 2: all P.v on the MXU
        if fold_sum:
            # v padded to 128 lanes with a ones-column: one matmul yields
            # [P@v | rowsum(P)]; skips the VPU sum pass over (N, N)
            v_aug = jnp.concatenate(
                [v_ref[h].astype(jnp.float32),
                 jnp.ones((Nk, 128 - d), jnp.float32)], axis=-1)
            o_aug = jnp.dot(ps[h], v_aug.astype(in_dtype),
                            preferred_element_type=jnp.float32)
            o_ref[h] = (o_aug[:, :d] / o_aug[:, d:d + 1]).astype(o_ref.dtype)
        else:
            o = jnp.dot(ps[h], v_ref[h],
                        preferred_element_type=jnp.float32)
            o_ref[h] = (o / ls[h]).astype(o_ref.dtype)


def _auto_heads_per_program(H, Nq, Nk):
    """Largest divisor of H whose softmax live set fits the VMEM budget.

    Live set: G bf16 probability tiles + one fp32 logits tile (see
    _attn_kernel phase structure)."""
    for G in (8, 4, 2, 1):
        if H % G == 0 and (G * 2 + 4) * Nq * Nk <= _LOGITS_VMEM_BUDGET:
            return G
    return 1


@functools.partial(jax.jit, static_argnames=("rope_base", "heads_per_program"))
def fused_attention(q, k, v, positions_q=None, positions_k=None,
                    rope_base=100.0, heads_per_program=None):
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

    G = heads_per_program or _auto_heads_per_program(H, Nq, Nk)
    while H % G:
        G //= 2
    fold_sum = d < 128

    qf = q.reshape(B * H, Nq, d)
    kf = k.reshape(B * H, Nk, d)
    vf = v.reshape(B * H, Nk, d)
    Ncq = cq.shape[1]
    Nck = ck.shape[1]
    HG = H // G  # programs per batch entry
    kernel = functools.partial(_attn_kernel, scale=d ** -0.5,
                               use_rope=use_rope, n_heads=G,
                               fold_sum=fold_sum)
    out = pl.pallas_call(
        kernel,
        grid=(B * HG,),
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
