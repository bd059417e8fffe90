"""Attention compute paths: plain XLA einsum and the fused Pallas kernel.

Both share one signature so the model can switch per-platform. Sequence
lengths in DUSt3R-style workloads are short (<= 1024 tokens at 512x384 and
patch 16), so the win from the Pallas path is fusing RoPE + softmax + matmuls
into a single VMEM-resident kernel rather than classical long-seq flash
tiling.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from .rope import apply_rope2d


def attention_ref(q, k, v, positions_q=None, positions_k=None, rope_base=100.0):
    """Reference attention. q,k,v: (B, H, N, d). positions: (B, N, 2) or None.

    RoPE is applied to q and k (not v), then softmax(q k^T / sqrt(d)) v,
    accumulated in fp32 regardless of input dtype.
    """
    if positions_q is not None:
        q = apply_rope2d(q, positions_q, rope_base)
    if positions_k is not None:
        k = apply_rope2d(k, positions_k, rope_base)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def _use_pallas_default():
    if os.environ.get("DUST3R_TPU_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _attention_pallas_diff(q, k, v, positions_q, positions_k, rope_base):
    """Differentiable wrapper: Pallas kernel forward, XLA backward.

    pallas_call has no automatic VJP; the backward pass recomputes the
    (rope'd) attention weights with plain XLA math (flash-style
    rematerialization - nothing big is saved from the forward).
    """
    from .pallas_attention import fused_attention

    return fused_attention(q, k, v, positions_q, positions_k, rope_base)


def _attention_pallas_fwd(q, k, v, positions_q, positions_k, rope_base):
    out = _attention_pallas_diff(q, k, v, positions_q, positions_k, rope_base)
    return out, (q, k, v, positions_q, positions_k)


def _attention_pallas_bwd(rope_base, res, g):
    q, k, v, positions_q, positions_k = res
    # recompute rope'd q/k and the softmax in fp32
    qr = apply_rope2d(q, positions_q, rope_base) if positions_q is not None \
        else q
    kr = apply_rope2d(k, positions_k, rope_base) if positions_k is not None \
        else k
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", qr, kr,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)

    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g32,
                    preferred_element_type=jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g32, v.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dqr = jnp.einsum("bhqk,bhkd->bhqd", ds, kr.astype(jnp.float32),
                     preferred_element_type=jnp.float32) * scale
    dkr = jnp.einsum("bhqk,bhqd->bhkd", ds, qr.astype(jnp.float32),
                     preferred_element_type=jnp.float32) * scale

    # rope adjoint = inverse rotation (cos, -sin)
    def rope_inv(t, pos):
        if pos is None:
            return t
        return _apply_rope2d_inverse(t, pos, rope_base)

    dq = rope_inv(dqr, positions_q).astype(q.dtype)
    dk = rope_inv(dkr, positions_k).astype(k.dtype)
    return dq, dk, dv.astype(v.dtype), None, None


def _apply_rope2d_inverse(tokens, positions, base):
    """Adjoint/inverse of apply_rope2d (rotation by -angle)."""
    from .rope import rope_cos_sin, _rotate_half

    head_dim = tokens.shape[-1]
    d = head_dim // 2
    y_tok, x_tok = tokens[..., :d], tokens[..., d:]

    def inv1d(t, pos1d):
        cos, sin = rope_cos_sin(pos1d, d, base, t.dtype)
        cos = cos[:, None, :, :]
        sin = sin[:, None, :, :]
        return t * cos - _rotate_half(t) * sin

    y_tok = inv1d(y_tok, positions[..., 0])
    x_tok = inv1d(x_tok, positions[..., 1])
    return jnp.concatenate([y_tok, x_tok], axis=-1)


_attention_pallas_diff.defvjp(_attention_pallas_fwd, _attention_pallas_bwd)


def attention(q, k, v, positions_q=None, positions_k=None, rope_base=100.0,
              impl=None):
    """Dispatching attention entry point used by the model blocks.

    impl: None (auto: pallas on TPU), 'ref', or 'pallas'. The pallas path
    is differentiable via a custom VJP (XLA recompute backward).
    """
    if impl is None:
        impl = "pallas" if _use_pallas_default() else "ref"
    if impl == "pallas":
        try:
            return _attention_pallas_diff(q, k, v, positions_q, positions_k,
                                          rope_base)
        except Exception:
            # fall back if the kernel can't serve this shape/platform
            return attention_ref(q, k, v, positions_q, positions_k, rope_base)
    return attention_ref(q, k, v, positions_q, positions_k, rope_base)
