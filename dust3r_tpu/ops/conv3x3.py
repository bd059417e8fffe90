"""3x3 stride-1 same-pad NHWC convolution: XLA path + Pallas tap-sum path.

The DPT heads are conv-bound: XLA's conv op runs their shapes at
13-46 TF/s regardless of precision config while plain dots hit ~213 TF/s
bf16 (scripts/exp_convprec_r3.py), and every XLA-level dot reformulation
of a conv loses to HBM tap re-reads (scripts/exp_conv2dot_r3.py). The
Pallas path keeps the taps VMEM-resident:

  * horizontal taps materialized as three shifted views (XLA slices);
  * one grid program per row-block computes
      Z[.., dy*Cout + c] = sum_dx x[.., w+dx-1] @ W[dy, dx]
    as THREE aligned (rows*W, Cin) @ (Cin, 3*Cout) matmuls (bf16 inputs,
    fp32 MXU accumulation);
  * the vertical combine y[h] = sum_dy Z_dy[h+dy-1] is a fused XLA
    shifted add.

Numerics: bf16 input rounding, the same class as XLA's default TPU conv
(which also rounds fp32 conv inputs to bf16 internally - measured rel err
2.1e-3 vs fp32, exp_convprec_r3). Backward runs the exact XLA transpose
convs via jax.vjp of the reference conv (the unused primal is DCE'd).

Reference behavior: torch nn.Conv2d(k=3, s=1, p=1) as used throughout
dust3r/heads/dpt_head.py and the croco DPT adapter.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = bool(os.environ.get("DUST3R_TPU_PALLAS_INTERPRET"))


def conv3x3_ref(x, w, b=None):
    """Plain XLA conv (NHWC, HWIO), same padding, stride 1."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _tap_kernel(x0_ref, x1_ref, x2_ref, w_ref, o_ref):
    acc = jax.lax.dot_general(x0_ref[...], w_ref[0],
                              (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(x1_ref[...], w_ref[1],
                               (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(x2_ref[...], w_ref[2],
                               (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def _pick_rows(total_rows, w, cin, cout, budget=12 * 1024 * 1024):
    """Rows per grid program, sized against the SCOPED vmem budget: the
    three tap blocks + the (rows, W, 3*Cout) output, each double-buffered
    (input-only sizing OOM'd the 16M scoped limit, and oversized blocks
    additionally caused register-spill blowups)."""
    per_row = w * (3 * cin + 3 * cout) * 2 * 2
    rows = max(1, budget // per_row)
    while total_rows % rows:
        rows -= 1
    return rows



def _conv3x3_pallas_raw(x, w):
    """Z-producing pallas call + vertical combine; returns x.dtype."""
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    xb = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (0, 0), (1, 1), (0, 0)))
    taps = [jax.lax.slice(xb, (0, 0, dx, 0), (B, H, dx + W, Cin))
            .reshape(B * H, W, Cin) for dx in range(3)]
    # (dy,dx,Cin,Cout) -> (dx, Cin, dy*Cout): per-dx matrices whose
    # columns hold the 3 vertical taps dy-major
    wcat = w.astype(jnp.bfloat16).transpose(1, 2, 0, 3).reshape(
        3, Cin, 3 * Cout)
    R = B * H
    Tr = _pick_rows(R, W, Cin, Cout)
    tap_spec = pl.BlockSpec((Tr, W, Cin), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    Z = pl.pallas_call(
        _tap_kernel,
        grid=(R // Tr,),
        in_specs=[tap_spec, tap_spec, tap_spec,
                  pl.BlockSpec((3, Cin, 3 * Cout), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Tr, W, 3 * Cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, W, 3 * Cout), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * W * 9 * Cin * Cout,
            bytes_accessed=3 * R * W * Cin * 2 + R * W * 3 * Cout * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(*taps, wcat)
    Z = Z.reshape(B, H, W, 3 * Cout).astype(x.dtype)
    Zp = jnp.pad(Z, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return sum(jax.lax.slice(Zp, (0, dy, 0, dy * Cout),
                             (B, dy + H, W, (dy + 1) * Cout))
               for dy in range(3))


@jax.custom_vjp
def _conv3x3_pallas_diff(x, w):
    return _conv3x3_pallas_raw(x, w)


def _conv3x3_fwd(x, w):
    return _conv3x3_pallas_raw(x, w), (x, w)


def _conv3x3_bwd(res, g):
    x, w = res
    # exact XLA transpose convolutions; the re-traced primal conv is
    # unused and dead-code-eliminated
    _, vjp = jax.vjp(lambda x, w: conv3x3_ref(x, w), x, w)
    return vjp(g.astype(x.dtype))


_conv3x3_pallas_diff.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def conv3x3_tapcat(x, w, b=None):
    """One full-lane tap einsum + 9 shifted adds (pure XLA).

    t = pad(x) @ Wall ((Cin, 9*Cout) - x read once, full MXU lanes), then
    y[h,w] = sum_{dy,dx} t[h+dy-1, w+dx, (dy,dx)-block]. FLOPs identical
    to the conv; trades the conv op's low MXU rate for a 9*Cout-channel
    bf16 intermediate's HBM round trip.
    """
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (0, 0), (1, 1), (0, 0)))
    wall = w.astype(jnp.bfloat16).transpose(2, 0, 1, 3).reshape(
        Cin, 9 * Cout)  # columns (dy, dx, cout)
    t = jnp.einsum("bhpc,cn->bhpn", xp, wall)
    tp = jnp.pad(t, ((0, 0), (1, 1), (0, 0), (0, 0)))
    y = None
    for dy in range(3):
        for dx in range(3):
            blk = (dy * 3 + dx) * Cout
            s = jax.lax.slice(tp, (0, dy, dx, blk),
                              (B, dy + H, dx + W, blk + Cout))
            y = s if y is None else y + s
    y = y.astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


# process-wide impl override; None = auto. Final round-3 measurement
# (single process, 512_dpt pair forward B=8): the XLA conv op is the
# best 3x3 path (111.9 ms) - tapcat 114.2, pallas 182 - ONCE the 1x1
# convs are taken off the conv op (Conv1x1 einsum in models/heads.py:
# 135.7 -> 111.9 ms, the single biggest head win). So auto = 'ref'
# everywhere; 'tapcat'/'pallas' stay selectable via env
# DUST3R_TPU_CONV3X3 or set_default_impl for future re-measurement.
_DEFAULT_IMPL = os.environ.get("DUST3R_TPU_CONV3X3") or None


def current_impl():
    """The conv impl in effect ('ref'|'pallas'|'tapcat')."""
    return _DEFAULT_IMPL or "ref"


def use_fast_dots():
    """bf16 inputs (+ fp32 accumulation) for the heads' pointwise dots
    (Conv1x1, upsample matmuls, PatchExpand). True on TPU - where the
    conv op already rounds its inputs to bf16 internally (measured rel
    err 2.1e-3, exp_convprec_r3), so this changes nothing numerically
    while hitting the fast MXU path - or when a non-ref conv impl is
    forced. CPU keeps full fp32 (golden/parity environment)."""
    if _DEFAULT_IMPL and _DEFAULT_IMPL != "ref":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def set_default_impl(impl):
    """Override the process-wide conv impl ('ref'|'pallas'|'tapcat', or
    None for auto). Affects subsequently TRACED programs only."""
    global _DEFAULT_IMPL
    assert impl in ("ref", "pallas", "tapcat", None)
    _DEFAULT_IMPL = impl


def conv3x3(x, w, b=None, impl=None):
    """Dispatching 3x3 same-pad conv. x: (B,H,W,Cin); w: (3,3,Cin,Cout).

    impl: None (process default, see set_default_impl), 'ref', 'pallas',
    or 'tapcat'.
    """
    if impl is None:
        impl = current_impl()
    if impl == "pallas" and jax.default_backend() != "tpu" \
            and not _INTERPRET:
        impl = "ref"  # the kernel only serves TPU
    if impl == "pallas":
        y = _conv3x3_pallas_diff(x, w)
        if b is not None:
            y = y + b.astype(y.dtype)
        return y
    if impl == "tapcat":
        return conv3x3_tapcat(x, w, b)
    return conv3x3_ref(x, w, b)
