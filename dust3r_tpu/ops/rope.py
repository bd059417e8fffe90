"""2D rotary position embedding (RoPE2D, freq base 100).

TPU-native replacement for the reference's optional `curope` CUDA extension
(reference README.md:83-89; croco submodule, absent from the mount). The
convention is reconstructed from dust3r's usage: per-token integer (y, x)
positions, head dim split in two halves, the first half rotated by the
y-position frequencies and the second by the x-position frequencies; each
half uses interleaved-pair ("rotate-half") 1D RoPE.

Pure jnp; also reused inside the Pallas fused attention kernel.
"""
from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(positions, dim, base=100.0, dtype=jnp.float32):
    """Per-coordinate cos/sin tables.

    positions: (B, N) integer positions for ONE coordinate.
    dim: the (even) subspace dimension this coordinate rotates (head_dim // 2).
    Returns cos, sin of shape (B, N, dim).
    """
    assert dim % 2 == 0
    inv_freq = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # (B, N, dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (B, N, dim)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _apply_rope1d(tokens, cos, sin):
    """tokens (B, H, N, d); cos/sin (B, N, d) broadcast over heads."""
    cos = cos[:, None, :, :]
    sin = sin[:, None, :, :]
    return tokens * cos + _rotate_half(tokens) * sin


def apply_rope2d(tokens, positions, base=100.0):
    """Apply 2D RoPE.

    tokens: (B, num_heads, N, head_dim), head_dim % 4 == 0.
    positions: (B, N, 2) integer (y, x) token positions.
    """
    head_dim = tokens.shape[-1]
    assert head_dim % 4 == 0, "head_dim must be divisible by 4 for 2D RoPE"
    d = head_dim // 2
    y_tok, x_tok = tokens[..., :d], tokens[..., d:]
    cos_y, sin_y = rope_cos_sin(positions[..., 0], d, base, tokens.dtype)
    cos_x, sin_x = rope_cos_sin(positions[..., 1], d, base, tokens.dtype)
    y_tok = _apply_rope1d(y_tok, cos_y, sin_y)
    x_tok = _apply_rope1d(x_tok, cos_x, sin_x)
    return jnp.concatenate([y_tok, x_tok], axis=-1)
