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


def attention(q, k, v, positions_q=None, positions_k=None, rope_base=100.0,
              impl=None):
    """Dispatching attention entry point used by the model blocks.

    impl: None (auto: pallas on TPU), 'ref', or 'pallas'.
    """
    if impl is None:
        impl = "pallas" if _use_pallas_default() else "ref"
    if impl == "pallas":
        from .pallas_attention import fused_attention
        try:
            return fused_attention(q, k, v, positions_q, positions_k, rope_base)
        except Exception:
            # fall back if the kernel can't serve this shape/platform
            return attention_ref(q, k, v, positions_q, positions_k, rope_base)
    return attention_ref(q, k, v, positions_q, positions_k, rope_base)
