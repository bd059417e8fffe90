"""Checkpoint name-map assertions against reference-derivable facts.

The croco submodule is absent from the reference mount, so the block
internals are a reconstruction - but a lot of the checkpoint key structure
IS pinned down by the reference code itself. These tests assert the
converter's name map against every such fact, so a drift in our naming
would be caught even without a real checkpoint:

  * dust3r/model.py:91-98 - single-decoder checkpoints are duplicated by
    replacing the 'dec_blocks' prefix with 'dec_blocks2'
  * dust3r/model.py:104-105 - module attrs mask_token / patch_embed /
    enc_blocks (freeze groups name real submodules)
  * dust3r/patch_embed.py + croco PatchEmbed - patch_embed.proj conv
  * dust3r/heads/dpt_head.py:85 - PixelwiseTaskWithDPT stores the trunk as
    self.dpt (DPTOutputAdapter_fix)
  * dpt_head.py:26-33 - act_postprocess is a ModuleList (indexed names);
    the duplicated act_{k}_postprocess attrs are DELETED, so checkpoints
    contain only act_postprocess.{idx}
  * dpt_head.py:52-61 - scratch.layer_rn[idx], scratch.refinenet{1..4},
    final self.head Sequential
  * dpt_head.py:96-115 - hooks [0, 2l/4, 3l/4, l], feature_dim 256,
    last_dim 128, dim_tokens [enc, dec, dec, dec], channels 3+conf
  * heads/linear_head.py:25 - linear head projection is self.proj
"""
import numpy as np
import pytest

import jax

from dust3r_tpu.checkpoint import (convert_torch_state_dict,
                                   to_torch_state_dict)
from dust3r_tpu.models.model import dust3r_512_dpt, dust3r_224_linear


def _full_sd(head_type="dpt", enc_depth=2, dec_depth=12):
    """Build a synthetic torch-named state dict by exporting a real init."""
    import jax.numpy as jnp
    kw = dict(enc_depth=enc_depth, dec_depth=dec_depth,
              enc_embed_dim=64, enc_num_heads=2,
              dec_embed_dim=48, dec_num_heads=2)
    model = (dust3r_512_dpt if head_type == "dpt" else dust3r_224_linear)(**kw)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img)
    sd = to_torch_state_dict(variables, enc_depth=enc_depth,
                             dec_depth=dec_depth, head_type=head_type)
    return model, variables, {k: np.asarray(v) for k, v in sd.items()}


class TestNameMap:
    @pytest.fixture(scope="class")
    def dpt_sd(self):
        return _full_sd("dpt")

    def test_backbone_attr_names(self, dpt_sd):
        _, _, sd = dpt_sd
        # model.py:104-105 freeze groups + forward path attrs
        assert "patch_embed.proj.weight" in sd
        assert "patch_embed.proj.bias" in sd
        assert "enc_blocks.0.norm1.weight" in sd
        assert "enc_norm.weight" in sd and "enc_norm.bias" in sd
        assert "decoder_embed.weight" in sd
        assert "dec_blocks.0.norm1.weight" in sd
        assert "dec_blocks2.0.norm1.weight" in sd
        assert "dec_norm.weight" in sd

    def test_dec_blocks2_duplication_rule(self, dpt_sd):
        """Single-decoder checkpoints: prefix replace per model.py:94-97."""
        model, _, sd = dpt_sd
        single = {k: v for k, v in sd.items()
                  if not k.startswith("dec_blocks2")}
        variables = convert_torch_state_dict(
            single, enc_depth=model.enc_depth, dec_depth=model.dec_depth,
            head_type="dpt")
        p = variables["params"]
        for i in range(model.dec_depth):
            a = p[f"dec_blocks_{i}"]["mlp"]["fc1"]["kernel"]
            b = p[f"dec_blocks2_{i}"]["mlp"]["fc1"]["kernel"]
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_dpt_trunk_names(self, dpt_sd):
        """dpt_head.py:26-65: self.dpt trunk member names."""
        _, _, sd = dpt_sd
        for head in ("downstream_head1", "downstream_head2"):
            # act_postprocess ModuleList, duplicated attrs deleted
            assert f"{head}.dpt.act_postprocess.0.0.weight" in sd
            assert f"{head}.dpt.act_postprocess.0.1.weight" in sd  # convT x4
            assert f"{head}.dpt.act_postprocess.1.1.weight" in sd  # convT x2
            assert f"{head}.dpt.act_postprocess.2.0.weight" in sd
            assert f"{head}.dpt.act_postprocess.3.1.weight" in sd  # stride-2
            assert not any(f"{head}.dpt.act_1_postprocess" in k for k in sd)
            # scratch projections + refinenets
            assert (f"{head}.dpt.scratch.layer1_rn.weight" in sd
                    or f"{head}.dpt.scratch.layer_rn.0.weight" in sd)
            for k in range(1, 5):
                # refinenet4's resConfUnit1 is dead weight (no res input):
                # torch checkpoints carry it but a flax init tree doesn't
                units = ("resConfUnit1", "resConfUnit2") if k < 4 \
                    else ("resConfUnit2",)
                for unit in units:
                    for conv in ("conv1", "conv2"):
                        key = (f"{head}.dpt.scratch.refinenet{k}."
                               f"{unit}.{conv}.weight")
                        assert key in sd, key
                assert f"{head}.dpt.scratch.refinenet{k}.out_conv.weight" in sd
            # regression head Sequential: conv, interp, conv, relu, conv
            assert f"{head}.dpt.head.0.weight" in sd
            assert f"{head}.dpt.head.2.weight" in sd
            assert f"{head}.dpt.head.4.weight" in sd
            assert f"{head}.dpt.head.1.weight" not in sd  # Interpolate
            assert f"{head}.dpt.head.3.weight" not in sd  # ReLU

    def test_layer_rn_alternate_name_accepted(self, dpt_sd):
        """Both scratch.layer{k}_rn and scratch.layer_rn.{k-1} appear in
        the wild (attr vs ModuleList registration); accept either."""
        model, _, sd = dpt_sd
        renamed = {}
        for k, v in sd.items():
            for idx in range(1, 5):
                k = k.replace(f"scratch.layer{idx}_rn", f"scratch.layer_rn.{idx - 1}")
            renamed[k] = v
        variables = convert_torch_state_dict(
            renamed, enc_depth=model.enc_depth, dec_depth=model.dec_depth,
            head_type="dpt")
        assert "downstream_head1" in variables["params"]

    def test_dpt_config_matches_create_dpt_head(self):
        """dpt_head.py:96-115 formulas on the published dims."""
        from dust3r_tpu.models.heads import DPTHead
        model = dust3r_512_dpt()
        assert model.enc_embed_dim == 1024 and model.dec_embed_dim == 768
        from dust3r_tpu.models.heads import head_factory
        head = head_factory("dpt", "pts3d", patch_size=16,
                            dec_depth=model.dec_depth,
                            depth_mode=model.depth_mode,
                            conf_mode=model.conf_mode, has_conf=True,
                            name="h")
        l2 = model.dec_depth
        assert tuple(head.hooks) == (0, l2 * 2 // 4, l2 * 3 // 4, l2) == \
            (0, 6, 9, 12)
        assert head.feature_dim == 256
        assert head.feature_dim // 2 == 128  # last_dim

    def test_linear_head_name(self):
        _, _, sd = _full_sd("linear")
        assert "downstream_head1.proj.weight" in sd
        assert "downstream_head1.proj.bias" in sd
        assert "downstream_head2.proj.weight" in sd

    def test_qkv_is_fused_cross_attn_is_split(self, dpt_sd):
        """croco blocks: self-attention uses ONE fused qkv Linear; decoder
        cross-attention uses separate projq/projk/projv (reconstructed
        convention; pinned here so the converter and model stay in sync)."""
        _, _, sd = dpt_sd
        assert "enc_blocks.0.attn.qkv.weight" in sd
        assert "enc_blocks.0.attn.proj.weight" in sd
        for p in ("projq", "projk", "projv", "proj"):
            assert f"dec_blocks.0.cross_attn.{p}.weight" in sd
        # decoder block norms: norm1 (self), norm2 (cross q), norm3 (mlp),
        # norm_y (other view tokens, croco norm_im2_in_dec=True)
        for n in ("norm1", "norm2", "norm3", "norm_y"):
            assert f"dec_blocks.0.{n}.weight" in sd

    def test_roundtrip_bit_exact(self, dpt_sd):
        model, variables, sd = dpt_sd
        v2 = convert_torch_state_dict(sd, enc_depth=model.enc_depth,
                                      dec_depth=model.dec_depth,
                                      head_type="dpt")
        for (p1, a), (p2, b) in zip(
                jax.tree_util.tree_flatten_with_path(variables)[0],
                jax.tree_util.tree_flatten_with_path(v2)[0]):
            assert p1 == p2
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestValidateRealCkptScript:
    def test_end_to_end_on_synthetic_pth(self, tmp_path):
        """Drive scripts/validate_real_ckpt.py through its full path with a
        synthetic-but-real .pth (saved by our exporter with the reference's
        checkpoint schema), including the parity comparison branch."""
        import subprocess
        import sys as _sys
        import torch
        import jax.numpy as jnp

        kw = dict(enc_depth=2, dec_depth=12, enc_embed_dim=64,
                  enc_num_heads=2, dec_embed_dim=48, dec_num_heads=2)
        model = dust3r_512_dpt(**kw)
        img = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), img, img)
        sd = to_torch_state_dict(variables, enc_depth=2, dec_depth=12,
                                 head_type="dpt")
        arch = ("AsymmetricCroCo3DStereo(pos_embed='RoPE100', "
                "img_size=(512, 512), head_type='dpt', output_mode='pts3d', "
                "depth_mode=('exp', -inf, inf), conf_mode=('exp', 1, inf), "
                "enc_embed_dim=64, enc_depth=2, enc_num_heads=2, "
                "dec_embed_dim=48, dec_depth=12, dec_num_heads=2)")
        ckpt_path = tmp_path / "synthetic.pth"
        import argparse
        torch.save({"model": {k: torch.from_numpy(np.asarray(v))
                              for k, v in sd.items()},
                    "args": argparse.Namespace(model=arch)},
                   ckpt_path)

        out_npz = tmp_path / "outs.npz"
        import sys
        env_script = [sys.executable, "scripts/validate_real_ckpt.py",
                      str(ckpt_path), "--cpu", "--height", "64",
                      "--width", "64", "--save-outputs", str(out_npz)]
        r = subprocess.run(env_script, capture_output=True, text=True,
                           cwd="/root/repo", timeout=600)
        assert r.returncode == 0, r.stdout + r.stderr
        assert "round trip OK" in r.stdout
        assert "name coverage OK" in r.stdout

        # second run: compare against the recorded outputs (self-parity)
        r2 = subprocess.run(
            [sys.executable, "scripts/validate_real_ckpt.py", str(ckpt_path),
             "--cpu", "--height", "64", "--width", "64",
             "--ref-outputs", str(out_npz)],
            capture_output=True, text=True, cwd="/root/repo", timeout=600)
        assert r2.returncode == 0, r2.stdout + r2.stderr
        assert "PARITY OK" in r2.stdout
