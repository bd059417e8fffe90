"""Torch re-implementation of the DUSt3R architecture for golden tests.

The croco submodule is absent from the reference mount, so true-reference
golden tests are impossible offline; this module reconstructs the
documented architecture (SURVEY.md L0: pre-LN ViT blocks with 2D RoPE,
fused qkv, cross-attention decoder with norm_y, pixel-shuffle linear head)
in torch with CHECKPOINT-COMPATIBLE tensor names, giving an independent
implementation to (a) cross-check the JAX model's math and (b) exercise
the .pth converter on realistically-named state dicts.
"""
import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class RoPE2D(nn.Module):
    def __init__(self, freq=100.0):
        super().__init__()
        self.base = freq

    def rotate_half(self, x):
        x1, x2 = x[..., : x.shape[-1] // 2], x[..., x.shape[-1] // 2:]
        return torch.cat((-x2, x1), dim=-1)

    def apply_rope1d(self, tokens, pos1d, D):
        inv_freq = 1.0 / (self.base ** (torch.arange(0, D, 2).float() / D))
        freqs = pos1d.float()[..., None] * inv_freq  # (B, N, D/2)
        emb = torch.cat((freqs, freqs), dim=-1)
        cos = emb.cos()[:, None]  # (B, 1, N, D)
        sin = emb.sin()[:, None]
        return tokens * cos + self.rotate_half(tokens) * sin

    def forward(self, tokens, positions):
        D = tokens.size(3) // 2
        y, x = tokens.chunk(2, dim=-1)
        y = self.apply_rope1d(y, positions[:, :, 0], D)
        x = self.apply_rope1d(x, positions[:, :, 1], D)
        return torch.cat((y, x), dim=-1)


class Attention(nn.Module):
    def __init__(self, dim, num_heads, rope):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.rope = rope

    def forward(self, x, xpos):
        B, N, C = x.shape
        h = self.num_heads
        qkv = self.qkv(x).reshape(B, N, 3, h, C // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = self.rope(q, xpos)
        k = self.rope(k, xpos)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(out)


class CrossAttention(nn.Module):
    def __init__(self, dim, num_heads, rope):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.projq = nn.Linear(dim, dim, bias=True)
        self.projk = nn.Linear(dim, dim, bias=True)
        self.projv = nn.Linear(dim, dim, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.rope = rope

    def forward(self, query, key, value, qpos, kpos):
        B, Nq, C = query.shape
        Nk = key.shape[1]
        h = self.num_heads
        q = self.projq(query).reshape(B, Nq, h, C // h).permute(0, 2, 1, 3)
        k = self.projk(key).reshape(B, Nk, h, C // h).permute(0, 2, 1, 3)
        v = self.projv(value).reshape(B, Nk, h, C // h).permute(0, 2, 1, 3)
        q = self.rope(q, qpos)
        k = self.rope(k, kpos)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, Nq, C)
        return self.proj(out)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim, num_heads, rope, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, num_heads, rope)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x, xpos):
        x = x + self.attn(self.norm1(x), xpos)
        x = x + self.mlp(self.norm2(x))
        return x


class DecoderBlock(nn.Module):
    def __init__(self, dim, num_heads, rope, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, num_heads, rope)
        self.cross_attn = CrossAttention(dim, num_heads, rope)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.norm3 = nn.LayerNorm(dim, eps=1e-6)
        self.norm_y = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x, y, xpos, ypos):
        x = x + self.attn(self.norm1(x), xpos)
        y_ = self.norm_y(y)
        x = x + self.cross_attn(self.norm2(x), y_, y_, xpos, ypos)
        x = x + self.mlp(self.norm3(x))
        return x, y


class ResidualConvUnit(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.conv1 = nn.Conv2d(features, features, 3, 1, 1)
        self.conv2 = nn.Conv2d(features, features, 3, 1, 1)

    def forward(self, x):
        out = torch.relu(x)
        out = self.conv1(out)
        out = torch.relu(out)
        out = self.conv2(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.resConfUnit1 = ResidualConvUnit(features)
        self.resConfUnit2 = ResidualConvUnit(features)
        self.out_conv = nn.Conv2d(features, features, 1)

    def forward(self, x, res=None):
        out = x
        if res is not None:
            out = out + self.resConfUnit1(res)
        out = self.resConfUnit2(out)
        out = F.interpolate(out, scale_factor=2, mode="bilinear",
                            align_corners=True)
        return self.out_conv(out)


class TorchDPT(nn.Module):
    """croco/MultiMAE-style DPTOutputAdapter with reference tensor names."""

    def __init__(self, enc_dim, dec_dim, patch_size=16, hooks=(0, 6, 9, 12),
                 layer_dims=(96, 192, 384, 768), feature_dim=256,
                 num_channels=4):
        super().__init__()
        self.hooks = hooks
        self.patch_size = patch_size
        dims_in = [enc_dim, dec_dim, dec_dim, dec_dim]
        self.act_postprocess = nn.ModuleList([
            nn.Sequential(nn.Conv2d(dims_in[0], layer_dims[0], 1),
                          nn.ConvTranspose2d(layer_dims[0], layer_dims[0],
                                             4, 4)),
            nn.Sequential(nn.Conv2d(dims_in[1], layer_dims[1], 1),
                          nn.ConvTranspose2d(layer_dims[1], layer_dims[1],
                                             2, 2)),
            nn.Sequential(nn.Conv2d(dims_in[2], layer_dims[2], 1)),
            nn.Sequential(nn.Conv2d(dims_in[3], layer_dims[3], 1),
                          nn.Conv2d(layer_dims[3], layer_dims[3], 3, 2, 1)),
        ])
        self.scratch = nn.Module()
        self.scratch.layer_rn = nn.ModuleList([
            nn.Conv2d(d, feature_dim, 3, 1, 1, bias=False)
            for d in layer_dims])
        for k in range(1, 5):
            setattr(self.scratch, f"refinenet{k}",
                    FeatureFusionBlock(feature_dim))
        self.head = nn.Sequential(
            nn.Conv2d(feature_dim, feature_dim // 2, 3, 1, 1),
            nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True),
            nn.Conv2d(feature_dim // 2, 32, 3, 1, 1),
            nn.ReLU(True),
            nn.Conv2d(32, num_channels, 1),
        )

    def forward(self, decout, H, W):
        p = self.patch_size
        Nh, Nw = H // p, W // p
        layers = [decout[h] for h in self.hooks]
        layers = [t.transpose(1, 2).reshape(t.shape[0], -1, Nh, Nw)
                  for t in layers]
        layers = [self.act_postprocess[i](l) for i, l in enumerate(layers)]
        layers = [self.scratch.layer_rn[i](l) for i, l in enumerate(layers)]
        path4 = self.scratch.refinenet4(layers[3])
        path4 = path4[:, :, :layers[2].shape[2], :layers[2].shape[3]]
        path3 = self.scratch.refinenet3(path4, layers[2])
        path2 = self.scratch.refinenet2(path3, layers[1])
        path1 = self.scratch.refinenet1(path2, layers[0])
        return self.head(path1)


class TorchDust3R(nn.Module):
    """Linear-head AsymmetricCroCo3DStereo with reference tensor names."""

    def __init__(self, patch_size=16, enc_embed_dim=64, enc_depth=2,
                 enc_num_heads=2, dec_embed_dim=48, dec_depth=2,
                 dec_num_heads=2, head_type="linear"):
        super().__init__()
        self.patch_size = patch_size
        self.head_type = head_type
        self.dec_depth = dec_depth
        rope = RoPE2D(100.0)
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, enc_embed_dim, patch_size,
                                          stride=patch_size)
        self.enc_blocks = nn.ModuleList(
            [Block(enc_embed_dim, enc_num_heads, rope)
             for _ in range(enc_depth)])
        self.enc_norm = nn.LayerNorm(enc_embed_dim, eps=1e-6)
        self.decoder_embed = nn.Linear(enc_embed_dim, dec_embed_dim)
        self.dec_blocks = nn.ModuleList(
            [DecoderBlock(dec_embed_dim, dec_num_heads, rope)
             for _ in range(dec_depth)])
        self.dec_blocks2 = nn.ModuleList(
            [DecoderBlock(dec_embed_dim, dec_num_heads, rope)
             for _ in range(dec_depth)])
        self.dec_norm = nn.LayerNorm(dec_embed_dim, eps=1e-6)
        for n in (1, 2):
            head = nn.Module()
            if head_type == "linear":
                head.proj = nn.Linear(dec_embed_dim, 4 * patch_size ** 2)
            else:
                hooks = (0, dec_depth * 2 // 4, dec_depth * 3 // 4, dec_depth)
                head.dpt = TorchDPT(enc_embed_dim, dec_embed_dim, patch_size,
                                    hooks=hooks)
            setattr(self, f"downstream_head{n}", head)

    def _positions(self, B, Ht, Wt):
        y = torch.arange(Ht)
        x = torch.arange(Wt)
        pos = torch.cartesian_prod(y, x)  # row-major (y, x)
        return pos[None].expand(B, -1, -1)

    def _encode(self, img):
        B, C, H, W = img.shape
        x = self.patch_embed.proj(img)
        Ht, Wt = x.shape[-2:]
        x = x.flatten(2).transpose(1, 2)
        pos = self._positions(B, Ht, Wt)
        for blk in self.enc_blocks:
            x = blk(x, pos)
        return self.enc_norm(x), pos

    def _postprocess(self, feat_nhwc):
        xyz, conf = feat_nhwc[..., :3], feat_nhwc[..., 3]
        d = xyz.norm(dim=-1, keepdim=True)
        pts3d = xyz / d.clip(min=1e-8) * torch.expm1(d)
        return pts3d, 1 + conf.exp()

    def _head(self, head, decout, H, W):
        if self.head_type == "linear":
            tokens = decout[-1]
            B, S, _ = tokens.shape
            p = self.patch_size
            feat = head.proj(tokens)
            feat = feat.transpose(-1, -2).view(B, -1, H // p, W // p)
            feat = F.pixel_shuffle(feat, p).permute(0, 2, 3, 1)  # B,H,W,4
        else:
            feat = head.dpt(decout, H, W).permute(0, 2, 3, 1)
        return self._postprocess(feat)

    def forward(self, img1, img2):
        """img: (B, 3, H, W). Returns (pts1, conf1, pts2, conf2)."""
        H, W = img1.shape[-2:]
        f1, pos1 = self._encode(img1)
        f2, pos2 = self._encode(img2)
        dec1 = [f1]
        dec2 = [f2]
        x1 = self.decoder_embed(f1)
        x2 = self.decoder_embed(f2)
        for blk1, blk2 in zip(self.dec_blocks, self.dec_blocks2):
            nx1, _ = blk1(x1, x2, pos1, pos2)
            nx2, _ = blk2(x2, x1, pos2, pos1)
            x1, x2 = nx1, nx2
            dec1.append(x1)
            dec2.append(x2)
        dec1[-1] = self.dec_norm(dec1[-1])
        dec2[-1] = self.dec_norm(dec2[-1])
        pts1, conf1 = self._head(self.downstream_head1, dec1, H, W)
        pts2, conf2 = self._head(self.downstream_head2, dec2,
                                 img2.shape[-2], img2.shape[-1])
        return pts1, conf1, pts2, conf2
