"""Op-level parity vs torch CPU for the numerics that must match the
reference implementation exactly (conv/interp/pixel-shuffle conventions).

These are the ops SURVEY.md §7 flags as parity risks: align-corners
interpolation, ConvTranspose semantics, pixel_shuffle ordering, patchify
convolution, GELU flavor.
"""
import pytest
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F
from einops import rearrange

from dust3r_tpu.models.heads import upsample2x_align_corners, _PatchExpand
from dust3r_tpu.models.blocks import gelu_exact
from dust3r_tpu.ops.rope import apply_rope2d

# multi-minute file: excluded from the quick (-m quick) suite
pytestmark = pytest.mark.slow


def nhwc(t):  # torch NCHW tensor -> numpy NHWC
    return t.permute(0, 2, 3, 1).numpy()


class TestInterp:
    def test_upsample2x_align_corners(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
        ours = np.asarray(upsample2x_align_corners(jnp.asarray(x)))
        theirs = nhwc(F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                                    scale_factor=2, mode="bilinear",
                                    align_corners=True))
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestPatchExpand:
    def test_matches_convtranspose(self):
        rng = np.random.default_rng(1)
        Cin, Cout, s = 6, 4, 4
        x = rng.standard_normal((2, 3, 5, Cin)).astype(np.float32)
        w = rng.standard_normal((Cin, Cout, s, s)).astype(np.float32)
        b = rng.standard_normal(Cout).astype(np.float32)

        mod = _PatchExpand(Cout, s)
        params = {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}
        ours = np.asarray(mod.apply(params, jnp.asarray(x)))

        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        theirs = nhwc(F.conv_transpose2d(tx, torch.from_numpy(w),
                                         torch.from_numpy(b), stride=s))
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestConv:
    def test_patchify_conv(self):
        """flax VALID stride-p conv == torch Conv2d(p, stride=p)."""
        rng = np.random.default_rng(2)
        p, Cout = 4, 5
        x = rng.standard_normal((1, 8, 12, 3)).astype(np.float32)
        w_t = rng.standard_normal((Cout, 3, p, p)).astype(np.float32)
        b = rng.standard_normal(Cout).astype(np.float32)

        import flax.linen as nn
        conv = nn.Conv(Cout, (p, p), strides=(p, p), padding="VALID")
        kernel = jnp.asarray(w_t.transpose(2, 3, 1, 0))  # OIHW -> HWIO
        ours = np.asarray(conv.apply(
            {"params": {"kernel": kernel, "bias": jnp.asarray(b)}}, jnp.asarray(x)))
        theirs = nhwc(F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                               torch.from_numpy(w_t), torch.from_numpy(b),
                               stride=p))
        np.testing.assert_allclose(ours, theirs, atol=1e-4)

    def test_stride2_pad1_conv(self):
        """DPT act_3 downsample: torch Conv2d(k3, s2, p1) on odd sizes."""
        rng = np.random.default_rng(3)
        x = rng.standard_normal((1, 21, 13, 4)).astype(np.float32)
        w_t = rng.standard_normal((6, 4, 3, 3)).astype(np.float32)
        b = np.zeros(6, np.float32)

        import flax.linen as nn
        conv = nn.Conv(6, (3, 3), strides=(2, 2), padding=1)
        kernel = jnp.asarray(w_t.transpose(2, 3, 1, 0))
        ours = np.asarray(conv.apply(
            {"params": {"kernel": kernel, "bias": jnp.asarray(b)}}, jnp.asarray(x)))
        theirs = nhwc(F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                               torch.from_numpy(w_t), torch.from_numpy(b),
                               stride=2, padding=1))
        np.testing.assert_allclose(ours, theirs, atol=1e-4)


class TestActivations:
    def test_gelu_exact(self):
        x = np.linspace(-4, 4, 101).astype(np.float32)
        ours = np.asarray(gelu_exact(jnp.asarray(x)))
        theirs = F.gelu(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_layernorm(self):
        rng = np.random.default_rng(4)
        x = rng.standard_normal((3, 7, 16)).astype(np.float32)
        g = rng.standard_normal(16).astype(np.float32)
        b = rng.standard_normal(16).astype(np.float32)
        import flax.linen as nn
        ln = nn.LayerNorm(epsilon=1e-6)
        ours = np.asarray(ln.apply(
            {"params": {"scale": jnp.asarray(g), "bias": jnp.asarray(b)}},
            jnp.asarray(x)))
        theirs = F.layer_norm(torch.from_numpy(x), (16,),
                              torch.from_numpy(g), torch.from_numpy(b),
                              eps=1e-6).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestPixelShuffle:
    def test_linear_head_rearrange_matches_pixel_shuffle(self):
        """The linear head's einops rearrange must equal the reference's
        transpose+view+pixel_shuffle chain (linear_head.py:33-37)."""
        rng = np.random.default_rng(5)
        B, Ht, Wt, p, nch = 2, 3, 4, 4, 4
        feat = rng.standard_normal((B, Ht * Wt, nch * p * p)).astype(np.float32)

        ours = np.asarray(rearrange(jnp.asarray(feat),
                                    "b (h w) (c ph pw) -> b (h ph) (w pw) c",
                                    h=Ht, w=Wt, c=nch, ph=p, pw=p))

        t = torch.from_numpy(feat)
        t = t.transpose(-1, -2).view(B, nch * p * p, Ht, Wt)
        t = F.pixel_shuffle(t, p)  # (B, nch, Ht*p, Wt*p)
        theirs = t.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


class TestRope:
    def test_rope2d_against_direct_rotation(self):
        """Check apply_rope2d against an explicit per-token 2x2 rotation
        construction of the croco RoPE100 convention."""
        rng = np.random.default_rng(6)
        B, H, N, D = 1, 2, 5, 16  # head_dim 16 -> 8 per coordinate
        tokens = rng.standard_normal((B, H, N, D)).astype(np.float32)
        pos = rng.integers(0, 7, (B, N, 2)).astype(np.int32)

        out = np.asarray(apply_rope2d(jnp.asarray(tokens), jnp.asarray(pos)))

        # direct construction
        d = D // 2  # per-coordinate dim
        base = 100.0
        inv_freq = 1.0 / (base ** (np.arange(0, d, 2) / d))  # (d/2,)
        expected = np.empty_like(tokens)
        for b in range(B):
            for h in range(H):
                for n in range(N):
                    for coord in range(2):  # 0: y-half, 1: x-half
                        seg = tokens[b, h, n, coord * d:(coord + 1) * d]
                        p_ = pos[b, n, coord]
                        ang = p_ * inv_freq  # (d/2,)
                        cos, sin = np.cos(ang), np.sin(ang)
                        x1, x2 = seg[:d // 2], seg[d // 2:]
                        rot = np.concatenate([x1 * cos - x2 * sin,
                                              x2 * cos + x1 * sin])
                        expected[b, h, n, coord * d:(coord + 1) * d] = rot
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_rope_preserves_norm(self):
        rng = np.random.default_rng(7)
        tokens = rng.standard_normal((2, 3, 10, 32)).astype(np.float32)
        pos = rng.integers(0, 20, (2, 10, 2)).astype(np.int32)
        out = np.asarray(apply_rope2d(jnp.asarray(tokens), jnp.asarray(pos)))
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1),
                                   np.linalg.norm(tokens, axis=-1), rtol=1e-5)

    def test_rope_relative_property(self):
        """Attention logits depend only on relative positions."""
        rng = np.random.default_rng(8)
        q = rng.standard_normal((1, 1, 1, 32)).astype(np.float32)
        k = rng.standard_normal((1, 1, 1, 32)).astype(np.float32)

        def logit(pq, pk):
            qq = apply_rope2d(jnp.asarray(q), jnp.asarray(pq, dtype=jnp.int32).reshape(1, 1, 2))
            kk = apply_rope2d(jnp.asarray(k), jnp.asarray(pk, dtype=jnp.int32).reshape(1, 1, 2))
            return float(jnp.sum(qq * kk))

        a = logit([3, 5], [1, 2])
        b = logit([12, 9], [10, 6])  # same relative offset (2, 3)
        assert abs(a - b) < 1e-4
