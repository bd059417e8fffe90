"""Prediction heads: linear (pixel-shuffle) and DPT, plus head postprocess.

Behavioral contracts:
  * postprocess / reg_dense_depth / reg_dense_conf:
      reference dust3r/heads/postprocess.py:10-58
  * LinearPts3d: reference dust3r/heads/linear_head.py:12-41
  * DPT head: reference dust3r/heads/dpt_head.py:20-115 plus the croco/
    MultiMAE DPTOutputAdapter trunk it consumes (submodule absent from the
    mount; structure reconstructed: 4 hook projections, 3x3 RN convs,
    4 fusion refinenets with residual conv units and align_corners=True
    2x bilinear upsampling, regression output head).

All heads take fp32 tokens (the model casts before calling, mirroring the
reference's fp32-heads-under-AMP rule, dust3r/model.py:206-208) and NHWC
feature maps.
"""
from __future__ import annotations

import math

import numpy as np
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from ..ops.conv3x3 import conv3x3

Mode = Tuple[str, float, float]


class Conv3x3(nn.Module):
    """3x3 stride-1 same-pad conv with a switchable compute path
    (ops/conv3x3.py). Parameter names/shapes identical to nn.Conv
    (kernel (3,3,Cin,Cout) HWIO + bias) so checkpoints are unaffected."""
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,)) if self.use_bias else None
        return conv3x3(x.astype(self.dtype), kernel, bias)


class Conv1x1(nn.Module):
    """1x1 conv as an einsum (a dot hits the MXU properly; XLA's conv op
    does not). Follows ops/conv3x3.use_fast_dots(): the
    dot runs at the head dtype on CPU (fp32 - matches the conv to float
    noise) and on bf16 inputs + fp32 accumulation on TPU, the same
    numeric class as XLA's TPU conv (which rounds its inputs to bf16
    internally). Measured: taking the 1x1s off the conv op is the single
    biggest DPT head win, 135.7 -> 111.9 ms on the full 512_dpt pair
    forward. Param names/shapes identical to nn.Conv((1,1))."""
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops import conv3x3 as convmod

        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, cin, self.features))
        if convmod.use_fast_dots():
            y = jnp.einsum("bhwc,cn->bhwn", x.astype(jnp.bfloat16),
                           kernel[0, 0].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        else:
            y = jnp.einsum("bhwc,cn->bhwn", x.astype(self.dtype),
                           kernel[0, 0].astype(self.dtype))
        y = y.astype(self.dtype)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,)).astype(y.dtype)
        return y


def reg_dense_depth(xyz, mode: Mode):
    """Map raw xyz channels to 3D points. mode=('exp', -inf, inf) in all
    published configs: direction * expm1(norm)."""
    mode_name, vmin, vmax = mode
    no_bounds = (vmin == -math.inf) and (vmax == math.inf)
    assert no_bounds, "bounded depth modes are not used by any published config"
    if mode_name == "linear":
        return xyz
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    xyz = xyz / jnp.clip(d, 1e-8)
    if mode_name == "square":
        return xyz * jnp.square(d)
    if mode_name == "exp":
        return xyz * jnp.expm1(d)
    raise ValueError(f"bad depth mode {mode_name}")


def reg_dense_conf(x, mode: Mode):
    """Map raw channel to confidence."""
    mode_name, vmin, vmax = mode
    if mode_name == "exp":
        return vmin + jnp.minimum(jnp.exp(x), vmax - vmin)
    if mode_name == "sigmoid":
        return (vmax - vmin) * jax.nn.sigmoid(x) + vmin
    raise ValueError(f"bad conf mode {mode_name}")


def postprocess(fmap, depth_mode: Mode, conf_mode):
    """fmap: (B, H, W, 3[+1]) NHWC raw head output -> dict(pts3d[, conf])."""
    res = dict(pts3d=reg_dense_depth(fmap[..., 0:3], depth_mode))
    if conf_mode is not None:
        res["conf"] = reg_dense_conf(fmap[..., 3], conf_mode)
    return res


class LinearPts3d(nn.Module):
    """Per-token linear projection to a (patch x patch) block of 3D points."""
    patch_size: int
    depth_mode: Mode
    conf_mode: Mode
    has_conf: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, decout, img_shape):
        H, W = img_shape
        tokens = decout[-1].astype(self.dtype)  # (B, S, D)
        p = self.patch_size
        nch = 3 + int(self.has_conf)
        feat = nn.Dense(nch * p * p, dtype=self.dtype, name="proj")(tokens)
        feat = rearrange(feat, "b (h w) (c ph pw) -> b (h ph) (w pw) c",
                         h=H // p, w=W // p, c=nch, ph=p, pw=p)
        feat = feat.astype(jnp.float32)  # postprocess always fp32
        return postprocess(feat, self.depth_mode,
                           self.conf_mode if self.has_conf else None)


# ---------------------------------------------------------------------------
# DPT head
# ---------------------------------------------------------------------------

def _interp_matrix(n_in, n_out, dtype=jnp.float32):
    """(n_out, n_in) bilinear interpolation matrix, align_corners=True."""
    if n_in == 1:
        return jnp.ones((n_out, 1), dtype)
    src = np.arange(n_out) * (n_in - 1) / max(n_out - 1, 1)
    lo = np.floor(src).astype(np.int32)
    hi = np.minimum(lo + 1, n_in - 1)
    w = (src - lo).astype(np.float64)
    m = np.zeros((n_out, n_in), np.float64)
    m[np.arange(n_out), lo] += 1 - w
    m[np.arange(n_out), hi] += w
    return jnp.asarray(m, dtype)


def _up2x_axis_lerp(x, axis):
    """2x align-corners upsample along `axis` via the even/odd closed
    form — shifts + fused lerps, no gathers and no matmul FLOPs.

    For n_out = 2n, src(o) = o*(n-1)/(2n-1) gives floor indices
    lo(2k) = k-1 (k>=1) and lo(2k+1) = k, so
      out[2k]   = (k/(2n-1))        * x[k-1] + (1 - k/(2n-1))  * x[k]
      out[2k+1] = (1 - w_k) * x[k] + w_k * x[k+1],  w_k = (n-1-k)/(2n-1)
    Boundary terms carry zero weight, so clamped shifts are exact.
    """
    n = x.shape[axis]
    dt = x.dtype
    shape = [1, 1, 1, 1]
    shape[axis] = n
    k = np.arange(n, dtype=np.float64)
    we = jnp.asarray((k / (2 * n - 1)).reshape(shape), jnp.float32)
    wo = jnp.asarray(((n - 1 - k) / (2 * n - 1)).reshape(shape), jnp.float32)

    def shift(src, d):  # clamped shift by d along axis (d in {-1, +1})
        pad = [(0, 0)] * 4
        pad[axis] = (max(d, 0), max(-d, 0))
        padded = jnp.pad(src, pad, mode="edge")
        lo = [0] * 4
        hi = list(padded.shape)
        if d > 0:
            hi[axis] -= d
        else:
            lo[axis] -= d
        return jax.lax.slice(padded, lo, hi)

    even = (we * shift(x, 1) + (1.0 - we) * x).astype(dt)
    odd = ((1.0 - wo) * x + wo * shift(x, -1)).astype(dt)
    out = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * n
    return out.reshape(new_shape)


# process-wide upsample impl: 'matmul' (dense interp matmuls on the MXU)
# or 'lerp' (shift-based closed form, O(HWC) real FLOPs). Overridable via
# env DUST3R_TPU_UPSAMPLE or set_upsample_impl for measurement.
import os as _os

_UPSAMPLE_IMPL = _os.environ.get("DUST3R_TPU_UPSAMPLE") or None
if _UPSAMPLE_IMPL not in ("matmul", "lerp", None):  # typos must not silently
    raise ValueError(  # fall back to 'matmul' and invalidate measurements
        f"DUST3R_TPU_UPSAMPLE={_UPSAMPLE_IMPL!r}: expected 'matmul' or 'lerp'")


def set_upsample_impl(impl):
    """Override the process-wide upsample impl ('matmul'|'lerp', or None
    for auto). Affects subsequently TRACED programs only."""
    global _UPSAMPLE_IMPL
    assert impl in ("matmul", "lerp", None)
    _UPSAMPLE_IMPL = impl


def upsample2x_align_corners(x, impl=None):
    """NHWC bilinear 2x upsample with align_corners=True (torch parity).

    Two impls, same semantics (equality pinned by tests/test_torch_parity
    and test_heads):

      * 'lerp': even/odd shift+lerp closed form — the real-FLOP
        formulation (O(HWC)). Unlike the round-2 "lerp-based upsamplers"
        dead end this form has NO gathers — outputs are interleaved lerps
        of clamped shifts.
      * 'matmul' (default): two dense interpolation matmuls on the MXU
        (2H*H*(WC) MACs for an O(HWC) op). Under the fast conv impl the
        dots run bf16 inputs + fp32 accumulation.
    """
    from ..ops import conv3x3 as convmod

    if impl is None:
        impl = _UPSAMPLE_IMPL or "matmul"
    if impl == "lerp":
        return _up2x_axis_lerp(_up2x_axis_lerp(x, 1), 2)

    B, H, W, C = x.shape
    dt = x.dtype
    fast = convmod.use_fast_dots() and dt == jnp.float32
    mdt = jnp.bfloat16 if fast else dt
    mh = _interp_matrix(H, 2 * H, mdt)
    mw = _interp_matrix(W, 2 * W, mdt)
    x = x.astype(mdt)
    x = jnp.einsum("oh,bhwc->bowc", mh, x,
                   preferred_element_type=jnp.float32).astype(mdt)
    x = jnp.einsum("ow,bhwc->bhoc", mw, x,
                   preferred_element_type=jnp.float32)
    return x.astype(dt)


class _PatchExpand(nn.Module):
    """Exact equivalent of torch ConvTranspose2d(k=s, stride=s): each input
    pixel expands into an s x s block through a learned (in, out, s, s)
    tensor. Implemented as one einsum (non-overlapping => no conv needed)."""
    features: int
    scale: int

    @nn.compact
    def __call__(self, x):
        from ..ops import conv3x3 as convmod

        B, H, W, Cin = x.shape
        s = self.scale
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (Cin, self.features, s, s))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = x.dtype
        if convmod.use_fast_dots() and dt == jnp.float32:
            y = jnp.einsum("bhwi,ioyx->bhywxo", x.astype(jnp.bfloat16),
                           w.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        else:
            y = jnp.einsum("bhwi,ioyx->bhywxo", x, w)
        y = y.astype(dt).reshape(B, H * s, W * s, self.features) + b
        return y


class ResidualConvUnit(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = Conv3x3(self.features, dtype=self.dtype, name="conv1")(out)
        out = nn.relu(out)
        out = Conv3x3(self.features, dtype=self.dtype, name="conv2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res=None):
        out = x
        if res is not None:
            out = out + ResidualConvUnit(self.features, self.dtype,
                                         name="resConfUnit1")(res)
        out = ResidualConvUnit(self.features, self.dtype,
                               name="resConfUnit2")(out)
        # The reference applies out_conv AFTER the 2x upsample; a 1x1 conv
        # commutes exactly with bilinear interpolation (pointwise channel
        # mixing, and the interp rows form a partition of unity so the bias
        # passes through too), so run it at the 4x-cheaper coarse resolution.
        out = Conv1x1(self.features, dtype=self.dtype,
                      name="out_conv")(out)
        out = upsample2x_align_corners(out)
        return out


class DPTHead(nn.Module):
    """DPT fusion trunk + regression head over 4 hooked decoder layers.

    hooks index into the model's list of per-layer decoder outputs
    (entry 0 = encoder output). Config from reference create_dpt_head
    (dpt_head.py:96-115): feature_dim 256, layer_dims (96,192,384,768),
    hooks (0, 6, 9, 12), dim_tokens (enc_dim, dec_dim, dec_dim, dec_dim).
    """
    patch_size: int
    depth_mode: Mode
    conf_mode: Mode
    has_conf: bool = True
    hooks: Sequence[int] = (0, 6, 9, 12)
    layer_dims: Sequence[int] = (96, 192, 384, 768)
    feature_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, decout, img_shape):
        H, W = img_shape
        p = self.patch_size
        Nh, Nw = H // p, W // p
        nch = 3 + int(self.has_conf)
        dt = self.dtype

        layers = []
        for idx, hook in enumerate(self.hooks):
            t = decout[hook].astype(dt)  # (B, S, D)
            x = t.reshape(t.shape[0], Nh, Nw, t.shape[-1])
            # per-hook projection ("act_postprocess")
            x = Conv1x1(self.layer_dims[idx], dtype=dt,
                        name=f"act_{idx}_proj")(x)
            if idx == 0:
                x = _PatchExpand(self.layer_dims[idx], 4, name="act_0_up4")(x)
            elif idx == 1:
                x = _PatchExpand(self.layer_dims[idx], 2, name="act_1_up2")(x)
            elif idx == 3:
                x = nn.Conv(self.layer_dims[idx], (3, 3), strides=(2, 2),
                            padding=1, dtype=dt, name="act_3_down2")(x)
            # scratch projection to common feature dim
            x = Conv3x3(self.feature_dim, use_bias=False, dtype=dt,
                        name=f"layer{idx + 1}_rn")(x)
            layers.append(x)

        path4 = FeatureFusionBlock(self.feature_dim, dt, name="refinenet4")(layers[3])
        path4 = path4[:, :layers[2].shape[1], :layers[2].shape[2], :]
        path3 = FeatureFusionBlock(self.feature_dim, dt, name="refinenet3")(path4, layers[2])
        path2 = FeatureFusionBlock(self.feature_dim, dt, name="refinenet2")(path3, layers[1])
        path1 = FeatureFusionBlock(self.feature_dim, dt, name="refinenet1")(path2, layers[0])

        # regression head: conv3x3 -> 2x upsample -> conv3x3 -> relu -> conv1x1
        out = Conv3x3(self.feature_dim // 2, dtype=dt,
                      name="head_conv1")(path1)
        out = upsample2x_align_corners(out)
        out = Conv3x3(32, dtype=dt, name="head_conv2")(out)
        out = nn.relu(out)
        out = Conv1x1(nch, dtype=dt, name="head_conv3")(out)
        out = out.astype(jnp.float32)  # postprocess always fp32

        return postprocess(out, self.depth_mode,
                           self.conf_mode if self.has_conf else None)


def head_factory(head_type, output_mode, *, patch_size, dec_depth,
                 depth_mode, conf_mode, has_conf, name,
                 dtype=jnp.float32):
    if output_mode != "pts3d":
        raise NotImplementedError(f"unexpected {output_mode=}")
    if head_type == "linear":
        return LinearPts3d(patch_size, depth_mode, conf_mode, has_conf,
                           dtype=dtype, name=name)
    if head_type == "dpt":
        assert dec_depth > 9
        hooks = (0, dec_depth * 2 // 4, dec_depth * 3 // 4, dec_depth)
        return DPTHead(patch_size, depth_mode, conf_mode, has_conf,
                       hooks=hooks, dtype=dtype, name=name)
    raise NotImplementedError(f"unexpected {head_type=}")
