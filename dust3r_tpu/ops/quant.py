"""Opt-in int8 quantized inference for the transformer gemms.

Beyond-parity serving mode (the reference has no quantized path). The
motivation is measured, not assumed: the v5e MXU doubles its rate on int8
operands, and `scripts/exp_int8_r3.py` measured XLA int8 dot_general at
239-416 TOPS (1.3-1.9x over bf16) at this model's projection/MLP shapes —
but 0.15x at the K=64 attention cores (docs/DESIGN.md round-3 addendum).
So the quantized mode covers exactly the gemm-bound part of the forward:

  * quantized: the encoder/decoder blocks' qkv / out-proj / cross-attn
    q,k,v projections / MLP fc1+fc2, and decoder_embed;
  * NOT quantized: attention cores (q·kT, P·V — int8 loses at K=64),
    LayerNorms, patchify, and the heads (the expm1 pointmap postprocess
    amplifies quantization noise exponentially; heads stay at the fp32
    parity policy).

Scheme: symmetric int8, per-OUTPUT-CHANNEL weight scales (computed once at
load by `quantize_for_inference`), per-TOKEN dynamic activation scales
(computed in-graph — one abs-max pass the VPU overlaps with the MXU).
The quantization pass runs in the activation's own dtype (bf16 in the
production path): the scale math lives on the tiny (tokens, 1) abs-max
tensor in fp32, but the big tensor is never upcast — measured on the v5e
at the encoder fc1 shape (scripts/exp_quant2_r3.py): bf16 Dense 0.568 ms,
fp32-math qdense 0.501, own-dtype qdense 0.446 (1.27x) — the fp32 upcast
of x was most of the gap between the first-cut mode's 0.97x full-model
result and the int8 gemm's headroom. The scale targets ±126 (not 127) so
the bf16 rounding of x·inv can never push past ±127.5 (a clip guards the
edge); a power-of-2-scale variant (exact bf16 multiply, no clip) measured
the same speed but costs up to 1 extra bit of noise and failed the conf
accuracy contract. Accumulation is int32 (`preferred_element_type`),
rescaled in fp32.

This is an INFERENCE mode: `jnp.round` has zero gradient, so a quantized
model must not be trained (no straight-through estimator on purpose).
Accuracy is defended by tests/test_quant.py: the int8 full-model pointmap
error vs the fp32 reference path is required to stay within ~4x of the
noise the default bf16 compute mode already accepts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class QuantDense(nn.Module):
    """Drop-in Dense replacement running the matmul on int8 operands.

    Params: `kernel_q` int8 (K, features), `kernel_scale` f32 (features,)
    (absorbs the 1/127 activation quantum too), `bias` f32 (features,).
    Produced from a trained fp32 Dense kernel by `quantize_params`; the
    zeros/ones initializers below exist only so `.init()` builds the right
    tree structure — a quantized model is always loaded, never trained.
    """
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        K = x.shape[-1]
        wq = self.param("kernel_q", nn.initializers.zeros,
                        (K, self.features), jnp.int8)
        sw = self.param("kernel_scale", nn.initializers.ones,
                        (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        # per-token symmetric scale targeting ±126: the 1-level margin
        # absorbs the bf16 rounding of inv and of x·inv, so the clip only
        # ever trims the last representable step. Scale math stays fp32 on
        # the tiny (tokens, 1) tensor; the BIG tensor is multiplied in its
        # own dtype (no fp32 upcast — that upcast was the measured cost).
        # 1e-12 floor guards all-zero tokens.
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        inv = 126.0 / jnp.maximum(amax.astype(jnp.float32), 1e-12)
        # rounded once; dequant inverts THIS. The optimization_barrier
        # pins the f32->bf16 rounding: the axon terminal's
        # --xla_allow_excess_precision=true would otherwise elide the
        # cast chain and let quant/dequant see scales differing by a
        # bf16 ulp (ADVICE r3). Costs nothing: (tokens, 1) tensor.
        inv_r = jax.lax.optimization_barrier(inv.astype(x.dtype))
        xq = jnp.clip(jnp.round(x * inv_r), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * (1.0 / inv_r.astype(jnp.float32))
             * sw + b)
        return y.astype(self.dtype)


def make_dense(features, dtype, quant, name):
    """Dense-layer factory: the blocks route every projection through this
    so one `quant` flag flips the whole transformer body to int8."""
    if quant:
        return QuantDense(features, dtype=dtype, name=name)
    return nn.Dense(features, dtype=dtype, name=name)


def quantize_dense_params(leaf):
    """fp32 Dense {kernel, bias} -> {kernel_q, kernel_scale, bias}.

    kernel may be (K, N) or scan-stacked (depth, K, N); the scale is
    per-output-channel (max |w| over the contraction axis only).
    """
    w = leaf["kernel"].astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=-2), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / s[..., None, :]), -127, 127).astype(jnp.int8)
    return {"kernel_q": wq, "kernel_scale": s,
            "bias": leaf["bias"].astype(jnp.float32)}


# Dense names quantized inside encoder/decoder blocks (see module doc for
# why ONLY these): self-attn fused qkv + out proj, cross-attn q/k/v + out
# proj, MLP fc1/fc2.
_BLOCK_DENSE_NAMES = frozenset(
    {"qkv", "proj", "projq", "projk", "projv", "fc1", "fc2"})


def _inside_blocks(path):
    return any(p.startswith(("enc_blocks", "dec_blocks")) for p in path)


def quantize_params(params):
    """Walk a trained fp32/bf16 param tree and quantize every transformer
    Dense (plus decoder_embed) into the QuantDense layout. All other
    leaves (LayerNorms, patchify conv, heads, attention internals) pass
    through untouched, so the tree matches `model.clone(quant=True)`'s
    structure exactly. Pure jax — wrap in jit for a one-dispatch convert
    on tunneled devices."""
    def walk(node, path):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            is_dense = (isinstance(v, dict) and "kernel" in v
                        and getattr(v["kernel"], "ndim", 0) >= 2)
            if is_dense and (k == "decoder_embed"
                             or (k in _BLOCK_DENSE_NAMES
                                 and _inside_blocks(path))):
                out[k] = quantize_dense_params(v)
            else:
                out[k] = walk(v, path + (k,))
        return out
    return walk(params, ())


def quantize_for_inference(model, params):
    """(model, fp32 params) -> (int8 model, quantized params).

    One-time conversion at load; the returned pair drops into
    `InferenceEngine` / `model.apply` unchanged. The convert runs as a
    single jitted program (one dispatch through the axon tunnel).
    """
    qmodel = model.clone(quant=True)
    qparams = jax.jit(quantize_params)(params)
    return qmodel, qparams
