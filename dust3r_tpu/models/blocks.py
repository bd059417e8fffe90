"""Transformer building blocks (encoder Block, DecoderBlock, PatchEmbed).

TPU-native (flax.linen) re-implementation of the backbone interface that the
reference consumes from its absent croco submodule (interface reconstructed in
SURVEY.md §1/L0; call contracts at reference dust3r/model.py:136-137,180-186).

Conventions:
  * tokens are (B, N, C); per-token integer positions are (B, N, 2) = (y, x)
  * LayerNorm eps 1e-6, computed in fp32
  * GELU matches torch.nn.GELU (exact erf) at fp32 compute; bf16 compute
    uses the tanh form (error below bf16 rounding - see gelu())
  * qkv is one fused projection in self-attention; cross-attention has
    separate q/k/v projections (torch-name-compatible: projq/projk/projv)
  * `dtype` is the compute dtype (bf16 on TPU); params always fp32
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn
import jax

from ..ops.attention import attention
from ..ops.quant import make_dense


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def gelu(x):
    """GELU at a precision matched to the compute dtype.

    torch.nn.GELU (the reference, croco blocks) is the exact erf form; we
    keep that for fp32 compute. Under bf16 compute the exact erf costs
    0.56 ms/layer on the v5e VPU - more than both MLP GEMMs (peak-rate,
    scripts/exp_gelu_r2.py) - while the tanh approximation costs 0.086 ms
    and differs by at most 5e-4, an order of magnitude BELOW the 3.1e-2
    rounding already introduced by casting the activations to bf16. So the
    tanh form is numerically free where it applies and exact elsewhere.
    """
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


class LayerNormF32(nn.Module):
    """LayerNorm computed in fp32, output cast back to input dtype."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        y = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32, name="ln")(
            x.astype(jnp.float32))
        return y.astype(dt)


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    quant: bool = False  # int8 gemms (inference only; ops/quant.py)

    @nn.compact
    def __call__(self, x):
        x = make_dense(self.hidden_dim, self.dtype, self.quant, "fc1")(x)
        x = gelu(x)
        x = make_dense(self.out_dim, self.dtype, self.quant, "fc2")(x)
        return x


class SelfAttention(nn.Module):
    dim: int
    num_heads: int
    rope_base: Optional[float] = 100.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: Optional[str] = None  # None=auto, 'ref', 'pallas'
    quant: bool = False  # int8 gemms (inference only; ops/quant.py)

    @nn.compact
    def __call__(self, x, pos):
        B, N, C = x.shape
        h = self.num_heads
        d = C // h
        qkv = make_dense(3 * C, self.dtype, self.quant, "qkv")(x)
        qkv = qkv.reshape(B, N, 3, h, d).transpose(2, 0, 3, 1, 4)  # (3, B, h, N, d)
        q, k, v = qkv[0], qkv[1], qkv[2]
        pos_r = pos if self.rope_base is not None else None
        out = attention(q, k, v, pos_r, pos_r, self.rope_base or 0.0,
                        impl=self.attn_impl)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return make_dense(C, self.dtype, self.quant, "proj")(out)


class CrossAttention(nn.Module):
    dim: int
    num_heads: int
    rope_base: Optional[float] = 100.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: Optional[str] = None
    quant: bool = False  # int8 gemms (inference only; ops/quant.py)

    @nn.compact
    def __call__(self, query, key, value, qpos, kpos):
        B, Nq, C = query.shape
        Nk = key.shape[1]
        h = self.num_heads
        d = C // h
        q = make_dense(C, self.dtype, self.quant, "projq")(query)
        k = make_dense(C, self.dtype, self.quant, "projk")(key)
        v = make_dense(C, self.dtype, self.quant, "projv")(value)
        q = q.reshape(B, Nq, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(B, Nk, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, Nk, h, d).transpose(0, 2, 1, 3)
        if self.rope_base is not None:
            out = attention(q, k, v, qpos, kpos, self.rope_base, impl=self.attn_impl)
        else:
            out = attention(q, k, v, None, None, 0.0, impl=self.attn_impl)
        out = out.transpose(0, 2, 1, 3).reshape(B, Nq, C)
        return make_dense(C, self.dtype, self.quant, "proj")(out)


class Block(nn.Module):
    """Encoder block: pre-LN self-attention (with 2D RoPE) + MLP."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    rope_base: Optional[float] = 100.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: Optional[str] = None
    quant: bool = False  # int8 gemms (inference only; ops/quant.py)

    @nn.compact
    def __call__(self, x, pos):
        x = x + SelfAttention(self.dim, self.num_heads, self.rope_base,
                              self.dtype, self.attn_impl, self.quant,
                              name="attn")(
            LayerNormF32(name="norm1")(x), pos)
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, self.dtype,
                    self.quant, name="mlp")(LayerNormF32(name="norm2")(x))
        return x


class DecoderBlock(nn.Module):
    """Decoder block: self-attn + cross-attn to the other view + MLP.

    Called as blk(x, y, xpos, ypos) -> (x, y), matching the reference's
    decoder contract (dust3r/model.py:180-186). norm_y normalizes the other
    view's tokens before cross-attention (croco norm_im2_in_dec=True).
    """
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    rope_base: Optional[float] = 100.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: Optional[str] = None
    quant: bool = False  # int8 gemms (inference only; ops/quant.py)

    @nn.compact
    def __call__(self, x, y, xpos, ypos):
        x = x + SelfAttention(self.dim, self.num_heads, self.rope_base,
                              self.dtype, self.attn_impl, self.quant,
                              name="attn")(
            LayerNormF32(name="norm1")(x), xpos)
        y_ = LayerNormF32(name="norm_y")(y)
        x = x + CrossAttention(self.dim, self.num_heads, self.rope_base,
                               self.dtype, self.attn_impl, self.quant,
                               name="cross_attn")(
            LayerNormF32(name="norm2")(x), y_, y_, xpos, ypos)
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, self.dtype,
                    self.quant, name="mlp")(LayerNormF32(name="norm3")(x))
        return x, y


class PatchEmbed(nn.Module):
    """Conv patchifier producing tokens + integer (y, x) positions.

    Input images are NHWC. Inference compiles one program per TRUE
    orientation (H, W) bucket; training batches store portrait samples
    transposed (shape-uniform batches) and pass `portrait=True` to process
    them at true orientation, exactly like the reference's ManyAR path
    (dust3r/patch_embed.py:52-70: `self.proj(img.swapaxes(-1, -2))` +
    swapped position grid).
    """
    patch_size: int = 16
    embed_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img, portrait=False):
        if portrait:
            # stored landscape -> true portrait orientation; the conv then
            # sees the image the reference's ManyAR conv sees
            img = img.swapaxes(1, 2)
        B, H, W, C = img.shape
        assert H % self.patch_size == 0 and W % self.patch_size == 0, \
            f"image size {(H, W)} not divisible by patch size {self.patch_size}"
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", dtype=self.dtype, name="proj")(img)
        Ht, Wt = H // self.patch_size, W // self.patch_size
        x = x.reshape(B, Ht * Wt, self.embed_dim)
        pos = token_positions(B, Ht, Wt)
        return x, pos


def token_positions(B, Ht, Wt):
    """(B, Ht*Wt, 2) int32 (y, x) positions, row-major."""
    yy = jax.lax.broadcasted_iota(jnp.int32, (Ht, Wt), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (Ht, Wt), 1)
    pos = jnp.stack([yy, xx], axis=-1).reshape(1, Ht * Wt, 2)
    return jnp.broadcast_to(pos, (B, Ht * Wt, 2))
