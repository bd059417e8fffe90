"""AsymmetricCroCo3DStereo: siamese ViT encoder + twin cross-attention
decoders + pointmap/confidence heads.

Behavioral contract: reference dust3r/model.py:46-211 (forward semantics,
head dispatch, fp32 heads) and the CroCo backbone interface it consumes
(SURVEY.md L0). TPU-native design choices:

  * NHWC images at their TRUE orientation; one XLA program per (H, W)
    bucket (replaces the reference's transposed-storage ManyAR batching -
    mathematically identical outputs).
  * encode / decode / head exposed as separate apply-methods so the
    inference pipeline can encode each unique image ONCE and reuse features
    across all pairs of a scene graph (strictly generalizes the reference's
    symmetrized-batch fast path, dust3r/model.py:162-166).
  * compute dtype configurable (bf16 on TPU), params fp32, heads fp32.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .blocks import Block, DecoderBlock, PatchEmbed, LayerNormF32
from .heads import head_factory

inf = math.inf


class _EncScanBody(nn.Module):
    """Scan body wrapping one encoder Block; carry = (x, pos)."""
    dim: int
    num_heads: int
    mlp_ratio: float
    rope_base: Optional[float]
    dtype: jnp.dtype
    attn_impl: Optional[str]
    quant: bool = False

    @nn.compact
    def __call__(self, carry, _):
        x, pos = carry
        x = Block(self.dim, self.num_heads, self.mlp_ratio, self.rope_base,
                  self.dtype, self.attn_impl, self.quant, name="block")(x, pos)
        return (x, pos), None


class _DecScanBody(nn.Module):
    """Scan body wrapping one decoder layer pair (blk1, blk2);
    carry = (x1, x2, pos1, pos2); outputs per-layer (x1, x2) for hooks."""
    dim: int
    num_heads: int
    mlp_ratio: float
    rope_base: Optional[float]
    dtype: jnp.dtype
    attn_impl: Optional[str]
    quant: bool = False

    @nn.compact
    def __call__(self, carry, _):
        x1, x2, pos1, pos2 = carry
        args = (self.dim, self.num_heads, self.mlp_ratio, self.rope_base,
                self.dtype, self.attn_impl, self.quant)
        nx1, _ = DecoderBlock(*args, name="block1")(x1, x2, pos1, pos2)
        nx2, _ = DecoderBlock(*args, name="block2")(x2, x1, pos2, pos1)
        return (nx1, nx2, pos1, pos2), (nx1, nx2)


class AsymmetricCroCo3DStereo(nn.Module):
    # published config (README.md:318): ViT-L encoder / ViT-B decoder
    img_size: Tuple[int, int] = (224, 224)
    patch_size: int = 16
    enc_embed_dim: int = 1024
    enc_depth: int = 24
    enc_num_heads: int = 16
    dec_embed_dim: int = 768
    dec_depth: int = 12
    dec_num_heads: int = 12
    mlp_ratio: float = 4.0
    pos_embed: str = "RoPE100"
    output_mode: str = "pts3d"
    head_type: str = "linear"
    depth_mode: Tuple[str, float, float] = ("exp", -inf, inf)
    conf_mode: Optional[Tuple[str, float, float]] = ("exp", 1, inf)
    landscape_only: bool = True
    dtype: jnp.dtype = jnp.float32
    head_dtype: jnp.dtype = jnp.float32  # reference runs heads fp32; bf16
    # trades a small (<1e-2 RMSE) accuracy delta for ~3x faster DPT convs
    attn_impl: Optional[str] = None  # None=auto, 'ref', 'pallas'
    scan_layers: bool = False  # lax.scan over layers: one traced block per
    # stack instead of depth copies (much faster XLA compiles; parameters
    # are stacked (depth, ...) - see checkpoint.stack_scan_params)
    remat: bool = False  # rematerialize block activations in the backward
    # pass (jax.checkpoint): trades ~30% more FLOPs for O(depth) less
    # activation memory - needed for large-batch training on 16GB HBM
    remat_policy: str = "full"  # 'full' recomputes everything (max memory
    # saving); 'dots' saves MXU matmul outputs and recomputes only the
    # cheap VPU work (less recompute, more memory) - a middle point
    # between remat=False and full remat for configs that fit
    quant: bool = False  # int8 transformer gemms (INFERENCE ONLY): use
    # ops/quant.quantize_for_inference(model, params) to build the pair;
    # heads/attention cores/LNs stay at the parity precision policy

    @classmethod
    def from_pretrained(cls, name_or_path, **overrides):
        """Reference-parity loader (dust3r/model.py:76-85 hf hub mixin):
        `AsymmetricCroCo3DStereo.from_pretrained("naver/DUSt3R_...")`.
        Returns (model, variables) - params are explicit in JAX, there is
        no `.to(device)` step (arrays land on the default device)."""
        from ..checkpoint import from_pretrained as _from_pretrained

        return _from_pretrained(name_or_path, **overrides)

    @property
    def rope_base(self) -> Optional[float]:
        if self.pos_embed.startswith("RoPE"):
            return float(self.pos_embed[len("RoPE"):])
        raise NotImplementedError(f"unsupported pos_embed {self.pos_embed}")

    def setup(self):
        self.patch_embed = PatchEmbed(self.patch_size, self.enc_embed_dim,
                                      self.dtype, name="patch_embed")
        enc_args = (self.enc_embed_dim, self.enc_num_heads, self.mlp_ratio,
                    self.rope_base, self.dtype, self.attn_impl, self.quant)
        dec_args = (self.dec_embed_dim, self.dec_num_heads, self.mlp_ratio,
                    self.rope_base, self.dtype, self.attn_impl, self.quant)
        remat_kw = {}
        if self.remat and self.remat_policy != "full":
            import jax

            remat_kw["policy"] = {
                "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            }[self.remat_policy]
        if self.scan_layers:
            enc_body = (nn.remat(_EncScanBody, **remat_kw) if self.remat
                        else _EncScanBody)
            dec_body = (nn.remat(_DecScanBody, **remat_kw) if self.remat
                        else _DecScanBody)
            self.enc_scan = nn.scan(
                enc_body, variable_axes={"params": 0},
                split_rngs={"params": True}, length=self.enc_depth,
            )(*enc_args, name="enc_blocks_scan")
            self.dec_scan = nn.scan(
                dec_body, variable_axes={"params": 0},
                split_rngs={"params": True}, length=self.dec_depth,
            )(*dec_args, name="dec_blocks_scan")
        else:
            BlockCls = (nn.remat(Block, **remat_kw) if self.remat
                        else Block)
            DecCls = (nn.remat(DecoderBlock, **remat_kw) if self.remat
                      else DecoderBlock)
            self.enc_blocks = [
                BlockCls(*enc_args, name=f"enc_blocks_{i}")
                for i in range(self.enc_depth)]
            self.dec_blocks = [
                DecCls(*dec_args, name=f"dec_blocks_{i}")
                for i in range(self.dec_depth)]
            self.dec_blocks2 = [
                DecCls(*dec_args, name=f"dec_blocks2_{i}")
                for i in range(self.dec_depth)]
        self.enc_norm = LayerNormF32(name="enc_norm")
        from ..ops.quant import make_dense
        self.decoder_embed = make_dense(self.dec_embed_dim, self.dtype,
                                        self.quant, "decoder_embed")
        self.dec_norm = LayerNormF32(name="dec_norm")
        has_conf = bool(self.conf_mode)
        self.downstream_head1 = head_factory(
            self.head_type, self.output_mode, patch_size=self.patch_size,
            dec_depth=self.dec_depth, depth_mode=self.depth_mode,
            conf_mode=self.conf_mode, has_conf=has_conf,
            dtype=self.head_dtype, name="downstream_head1")
        self.downstream_head2 = head_factory(
            self.head_type, self.output_mode, patch_size=self.patch_size,
            dec_depth=self.dec_depth, depth_mode=self.depth_mode,
            conf_mode=self.conf_mode, has_conf=has_conf,
            dtype=self.head_dtype, name="downstream_head2")

    # ------------------------------------------------------------------ #
    # stages (each is exposed via model.apply(..., method=...))
    # ------------------------------------------------------------------ #

    def encode(self, img, is_portrait=None):
        """img: (B, H, W, 3) normalized. -> (tokens, pos).

        is_portrait: optional (B,) bool — ManyAR batches (reference
        dust3r/patch_embed.py:52-70): images stored landscape, per-sample
        flags marking samples whose TRUE orientation is portrait. Both
        patchify orientations run (the patchify conv is ~0.1% of the
        forward) and tokens/positions are selected per sample; the
        transformer body is orientation-agnostic given tokens+positions,
        so it runs once. Static shapes throughout — no boolean gathers.
        """
        img = img.astype(self.dtype)
        x, pos = self.patch_embed(img)
        if is_portrait is not None:
            xp, posp = self.patch_embed(img, portrait=True)
            sel = is_portrait[:, None, None]
            x = jnp.where(sel, xp, x)
            pos = jnp.where(sel, posp, pos)
        if self.scan_layers:
            (x, _), _ = self.enc_scan((x, pos), None)
        else:
            for blk in self.enc_blocks:
                x = blk(x, pos)
        return self.enc_norm(x), pos

    def decode(self, f1, pos1, f2, pos2):
        """Dual-stream decoder; returns per-layer outputs for both sides.

        Output: two lists of length dec_depth+1; entry 0 is the (normed)
        encoder output, entries 1.. are decoder layer outputs, the last one
        passed through dec_norm (reference dust3r/model.py:172-191).
        """
        out1 = [f1]
        out2 = [f2]
        x1 = self.decoder_embed(f1)
        x2 = self.decoder_embed(f2)
        if self.scan_layers:
            (x1, x2, _, _), (ys1, ys2) = self.dec_scan(
                (x1, x2, pos1, pos2), None)
            out1 += [ys1[i] for i in range(self.dec_depth)]
            out2 += [ys2[i] for i in range(self.dec_depth)]
        else:
            for blk1, blk2 in zip(self.dec_blocks, self.dec_blocks2):
                nx1, _ = blk1(x1, x2, pos1, pos2)
                nx2, _ = blk2(x2, x1, pos2, pos1)
                x1, x2 = nx1, nx2
                out1.append(x1)
                out2.append(x2)
        out1[-1] = self.dec_norm(out1[-1])
        out2[-1] = self.dec_norm(out2[-1])
        return out1, out2

    def head(self, head_num, decout, img_shape):
        """Run downstream head `head_num` (1 or 2) at head_dtype
        (fp32 by default, matching the reference's AMP rule)."""
        decout = [t.astype(self.head_dtype) for t in decout]
        h = self.downstream_head1 if head_num == 1 else self.downstream_head2
        return h(decout, img_shape)

    def _head_manyar(self, head_num, decout, img_shape, is_portrait):
        """ManyAR head split (reference dust3r/utils/misc.py:54-100): run
        the head at BOTH orientations on the full batch and select per
        sample; the portrait result is transposed back to storage
        orientation so loss/GT comparison stays element-aligned. Static
        shapes (the reference's boolean sub-batching is dynamic); the
        double head pass is only paid on batches that contain portrait
        samples — the host omits the flags otherwise.
        """
        H, W = img_shape
        res_l = self.head(head_num, decout, (H, W))
        res_p = self.head(head_num, decout, (W, H))
        out = {}
        for k in res_l:
            pv = res_p[k].swapaxes(1, 2)  # back to storage orientation
            sel = is_portrait.reshape((-1,) + (1,) * (res_l[k].ndim - 1))
            out[k] = jnp.where(sel, pv, res_l[k])
        return out

    def __call__(self, img1, img2, is_portrait1=None, is_portrait2=None,
                 symmetrized=False):
        """Full pair forward. img1/img2: (B, H, W, 3).

        Without flags, images are at their true orientation (inference
        buckets). With is_portrait1/2 ((B,) bool), this is a ManyAR
        training batch: images stored landscape, flagged samples processed
        at true (portrait) orientation and returned at storage orientation
        (reference dust3r/patch_embed.py:32-70, utils/misc.py:54-100).

        symmetrized=True: the batch is (I,J),(J,I)-interleaved (the
        training default - make_batch_symmetric), i.e. img2 is img1 with
        each consecutive pair swapped. Only img1 is encoded and view2's
        features are a pair-swap permutation of view1's - HALF the encoder
        cost, the reference's symmetrized fast path (model.py:162-166 via
        utils/misc.py:32-51). The caller asserts the batch layout.

        Returns (res1, res2): res1 = {pts3d, conf}; res2 =
        {pts3d_in_other_view, conf} - view2's points in view1's frame.
        """
        shape1 = img1.shape[1:3]
        shape2 = img2.shape[1:3]
        assert (is_portrait1 is None) == (is_portrait2 is None), \
            "pass is_portrait flags for BOTH views or neither"
        manyar = is_portrait1 is not None

        def swap_pairs(t):
            B = t.shape[0]
            return t.reshape((B // 2, 2) + t.shape[1:])[:, ::-1].reshape(
                t.shape)

        if symmetrized:
            assert shape1 == shape2, "symmetrized batches share one shape"
            f1, pos1 = self.encode(img1, is_portrait=is_portrait1)
            f2, pos2 = swap_pairs(f1), swap_pairs(pos1)
        elif shape1 == shape2:
            # shared-shape fast path: one encoder batch (model.py:142-151)
            mask = (jnp.concatenate([is_portrait1, is_portrait2])
                    if manyar else None)
            feat, pos = self.encode(jnp.concatenate([img1, img2], axis=0),
                                    is_portrait=mask)
            B = img1.shape[0]
            f1, f2 = feat[:B], feat[B:]
            pos1, pos2 = pos[:B], pos[B:]
        else:
            f1, pos1 = self.encode(img1, is_portrait=is_portrait1)
            f2, pos2 = self.encode(img2, is_portrait=is_portrait2)

        dec1, dec2 = self.decode(f1, pos1, f2, pos2)
        if manyar:
            res1 = self._head_manyar(1, dec1, shape1, is_portrait1)
            res2 = self._head_manyar(2, dec2, shape2, is_portrait2)
        else:
            res1 = self.head(1, dec1, shape1)
            res2 = self.head(2, dec2, shape2)
        res2["pts3d_in_other_view"] = res2.pop("pts3d")
        return res1, res2


# ---------------------------------------------------------------------- #
# published configurations
# ---------------------------------------------------------------------- #

def dust3r_224_linear(**kw) -> AsymmetricCroCo3DStereo:
    """DUSt3R_ViTLarge_BaseDecoder_224_linear (README.md:330)."""
    kw.setdefault("img_size", (224, 224))
    kw.setdefault("head_type", "linear")
    return AsymmetricCroCo3DStereo(**kw)


def dust3r_512_linear(**kw) -> AsymmetricCroCo3DStereo:
    """DUSt3R_ViTLarge_BaseDecoder_512_linear (README.md:376)."""
    kw.setdefault("img_size", (512, 512))
    kw.setdefault("head_type", "linear")
    return AsymmetricCroCo3DStereo(**kw)


def dust3r_512_dpt(**kw) -> AsymmetricCroCo3DStereo:
    """DUSt3R_ViTLarge_BaseDecoder_512_dpt (README.md:388)."""
    kw.setdefault("img_size", (512, 512))
    kw.setdefault("head_type", "dpt")
    return AsymmetricCroCo3DStereo(**kw)


NAMED_MODELS = {
    "DUSt3R_ViTLarge_BaseDecoder_224_linear": dust3r_224_linear,
    "DUSt3R_ViTLarge_BaseDecoder_512_linear": dust3r_512_linear,
    "DUSt3R_ViTLarge_BaseDecoder_512_dpt": dust3r_512_dpt,
}
