"""Third-party convention cross-check for the DPT fusion trunk.

The round-3 verdict flagged that all torch-parity evidence is
self-referential (this repo's own torch reimplementation, written from the
same survey). DUSt3R's DPT head comes from the isl-org/DPT lineage
(reference dust3r/heads/dpt_head.py via croco's dpt_block), and the
huggingface `transformers` package ships an INDEPENDENT port of that same
lineage (`transformers.models.dpt.modeling_dpt`, validated against the
published Intel DPT weights). Mapping our flax FeatureFusionBlock weights
into `DPTFeatureFusionLayer` and comparing outputs therefore checks our
reconstruction of the fusion conventions — pre-activation residual units,
residual-add order, align_corners=True 2x upsample, 1x1 projection —
against code neither written by this repo nor derived from its survey.

It also validates the one deliberate deviation: we apply the 1x1
projection BEFORE the 2x upsample (4x cheaper; exact because a pointwise
channel mixing commutes with bilinear interpolation and the interp rows
form a partition of unity). Equality against transformers' order proves
the commute on real third-party semantics.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from dust3r_tpu.models.heads import FeatureFusionBlock

D = 32  # fusion width


def _build_transformers_layer():
    from transformers.models.dpt.configuration_dpt import DPTConfig
    from transformers.models.dpt.modeling_dpt import DPTFeatureFusionLayer

    cfg = DPTConfig(fusion_hidden_size=D,
                    use_batch_norm_in_fusion_residual=False)
    return DPTFeatureFusionLayer(cfg).eval()


def _copy_conv(tconv, params, name):
    """flax HWIO kernel + bias -> torch Conv2d OIHW."""
    k = np.asarray(params[name]["kernel"])  # (kh, kw, in, out)
    tconv.weight.data = torch.from_numpy(
        np.ascontiguousarray(k.transpose(3, 2, 0, 1)))
    tconv.bias.data = torch.from_numpy(np.array(params[name]["bias"]))


class TestFusionBlockVsTransformers:
    @pytest.fixture(scope="class")
    def pair(self):
        block = FeatureFusionBlock(D)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 8, 12, D)).astype(np.float32)
        res = rng.normal(size=(1, 8, 12, D)).astype(np.float32)
        variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x),
                               jnp.asarray(res))
        p = variables["params"]

        tlayer = _build_transformers_layer()
        for unit, tunit in (("resConfUnit1", tlayer.residual_layer1),
                            ("resConfUnit2", tlayer.residual_layer2)):
            _copy_conv(tunit.convolution1, p[unit], "conv1")
            _copy_conv(tunit.convolution2, p[unit], "conv2")
        _copy_conv(tlayer.projection, p, "out_conv")
        return block, variables, tlayer, x, res

    def test_fused_path_matches(self, pair):
        """x + residual input: full fusion math + upsample + projection."""
        block, variables, tlayer, x, res = pair
        ours = np.asarray(block.apply(variables, jnp.asarray(x),
                                      jnp.asarray(res)))
        with torch.no_grad():
            theirs = tlayer(torch.from_numpy(x).permute(0, 3, 1, 2),
                            torch.from_numpy(res).permute(0, 3, 1, 2))
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        assert ours.shape == theirs.shape == (1, 16, 24, D)
        np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)

    def test_no_residual_path_matches(self, pair):
        """Deepest fusion stage: no residual input (reference passes only
        the reassembled feature)."""
        block, variables, tlayer, x, res = pair
        ours = np.asarray(block.apply(variables, jnp.asarray(x)))
        with torch.no_grad():
            theirs = tlayer(torch.from_numpy(x).permute(0, 3, 1, 2))
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


class TestReassembleVsTransformers:
    """The reassemble stage (reference act_postprocess: 1x1 projection +
    per-hook resize — ConvTranspose(k=s, stride=s) up, stride-2 3x3 conv
    down) against transformers' DPTReassembleLayer of the same lineage."""

    D_IN, CH = 24, 16

    def _build(self, factor):
        from transformers.models.dpt.configuration_dpt import DPTConfig
        from transformers.models.dpt.modeling_dpt import DPTReassembleLayer

        cfg = DPTConfig(hidden_size=self.D_IN)
        return DPTReassembleLayer(cfg, channels=self.CH,
                                  factor=factor).eval()

    def test_upsample_factor4(self):
        import flax.linen as nn
        from dust3r_tpu.models.heads import Conv1x1, _PatchExpand

        class Stage(nn.Module):
            ch: int

            @nn.compact
            def __call__(self, x):
                x = Conv1x1(self.ch, name="proj")(x)
                return _PatchExpand(self.ch, 4, name="up4")(x)

        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 6, 9, self.D_IN)).astype(np.float32)
        stage = Stage(self.CH)
        variables = stage.init(jax.random.PRNGKey(1), jnp.asarray(x))
        p = variables["params"]

        tlayer = self._build(factor=4)
        _copy_conv(tlayer.projection, p, "proj")
        # _PatchExpand stores (in, out, s, s) — torch ConvTranspose2d's
        # native weight layout
        tlayer.resize.weight.data = torch.from_numpy(
            np.array(p["up4"]["kernel"]))
        tlayer.resize.bias.data = torch.from_numpy(
            np.array(p["up4"]["bias"]))

        ours = np.asarray(stage.apply(variables, jnp.asarray(x)))
        with torch.no_grad():
            theirs = tlayer(torch.from_numpy(x).permute(0, 3, 1, 2))
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        assert ours.shape == theirs.shape == (1, 24, 36, self.CH)
        np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)

    def test_downsample_factor_half(self):
        import flax.linen as nn
        from dust3r_tpu.models.heads import Conv1x1

        class Stage(nn.Module):
            ch: int

            @nn.compact
            def __call__(self, x):
                x = Conv1x1(self.ch, name="proj")(x)
                return nn.Conv(self.ch, (3, 3), strides=(2, 2), padding=1,
                               name="down2")(x)

        rng = np.random.default_rng(2)
        x = rng.normal(size=(1, 8, 12, self.D_IN)).astype(np.float32)
        stage = Stage(self.CH)
        variables = stage.init(jax.random.PRNGKey(2), jnp.asarray(x))
        p = variables["params"]

        tlayer = self._build(factor=0.5)
        _copy_conv(tlayer.projection, p, "proj")
        _copy_conv(tlayer.resize, p, "down2")

        ours = np.asarray(stage.apply(variables, jnp.asarray(x)))
        with torch.no_grad():
            theirs = tlayer(torch.from_numpy(x).permute(0, 3, 1, 2))
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        assert ours.shape == theirs.shape == (1, 4, 6, self.CH)
        np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)
