import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dust3r_tpu.models.model import AsymmetricCroCo3DStereo
from dust3r_tpu.models.blocks import token_positions

TINY = dict(img_size=(32, 32), patch_size=16, enc_embed_dim=64, enc_depth=2,
            enc_num_heads=2, dec_embed_dim=48, dec_depth=12, dec_num_heads=2,
            attn_impl="ref")


def make_model(head_type="linear", **kw):
    cfg = dict(TINY)
    cfg.update(kw)
    cfg["head_type"] = head_type
    return AsymmetricCroCo3DStereo(**cfg)


class TestModelForward:
    @pytest.mark.parametrize("head_type", ["linear", "dpt"])
    def test_pair_forward_shapes(self, head_type):
        model = make_model(head_type)
        rng = jax.random.PRNGKey(0)
        img1 = jax.random.normal(rng, (2, 32, 48, 3))
        img2 = jax.random.normal(rng, (2, 32, 48, 3))
        params = model.init(jax.random.PRNGKey(1), img1, img2)
        res1, res2 = model.apply(params, img1, img2)
        assert res1["pts3d"].shape == (2, 32, 48, 3)
        assert res1["conf"].shape == (2, 32, 48)
        assert res2["pts3d_in_other_view"].shape == (2, 32, 48, 3)
        assert np.all(np.asarray(res1["conf"]) >= 1.0)  # conf = 1 + exp
        assert np.all(np.isfinite(np.asarray(res1["pts3d"])))

    def test_mixed_shapes(self):
        model = make_model("linear")
        img1 = jnp.ones((1, 32, 48, 3))
        img2 = jnp.ones((1, 48, 32, 3))  # portrait second view
        params = model.init(jax.random.PRNGKey(0), img1, img2)
        res1, res2 = model.apply(params, img1, img2)
        assert res1["pts3d"].shape == (1, 32, 48, 3)
        assert res2["pts3d_in_other_view"].shape == (1, 48, 32, 3)

    def test_encode_decode_head_stages_match_forward(self):
        """The staged API (encode once, reuse) must equal the pair forward."""
        model = make_model("linear")
        k = jax.random.PRNGKey(2)
        img1 = jax.random.normal(k, (1, 32, 32, 3))
        img2 = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 3))
        params = model.init(jax.random.PRNGKey(1), img1, img2)

        res1, res2 = model.apply(params, img1, img2)

        f1, pos1 = model.apply(params, img1, method="encode")
        f2, pos2 = model.apply(params, img2, method="encode")
        dec1, dec2 = model.apply(params, f1, pos1, f2, pos2, method="decode")
        r1 = model.apply(params, 1, dec1, (32, 32), method="head")
        r2 = model.apply(params, 2, dec2, (32, 32), method="head")

        np.testing.assert_allclose(np.asarray(r1["pts3d"]),
                                   np.asarray(res1["pts3d"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(r2["pts3d"]),
                                   np.asarray(res2["pts3d_in_other_view"]),
                                   atol=1e-5)

    def test_asymmetry(self):
        """view1 and view2 heads/decoders differ (asymmetric model)."""
        model = make_model("linear")
        img = jax.random.normal(jax.random.PRNGKey(4), (1, 32, 32, 3))
        params = model.init(jax.random.PRNGKey(1), img, img)
        res1, res2 = model.apply(params, img, img)
        # same image both sides, but the two outputs must not coincide
        assert not np.allclose(np.asarray(res1["pts3d"]),
                               np.asarray(res2["pts3d_in_other_view"]))

    def test_deterministic(self):
        model = make_model("linear")
        img1 = jax.random.normal(jax.random.PRNGKey(5), (1, 32, 32, 3))
        img2 = jax.random.normal(jax.random.PRNGKey(6), (1, 32, 32, 3))
        params = model.init(jax.random.PRNGKey(1), img1, img2)
        a, _ = model.apply(params, img1, img2)
        b, _ = model.apply(params, img1, img2)
        np.testing.assert_array_equal(np.asarray(a["pts3d"]), np.asarray(b["pts3d"]))


class TestTokenPositions:
    def test_row_major_yx(self):
        pos = np.asarray(token_positions(1, 2, 3))
        assert pos.shape == (1, 6, 2)
        np.testing.assert_array_equal(
            pos[0], [[0, 0], [0, 1], [0, 2], [1, 0], [1, 1], [1, 2]])


class TestBf16:
    def test_bf16_forward_close_to_fp32(self):
        m32 = make_model("linear")
        m16 = make_model("linear", dtype=jnp.bfloat16)
        img1 = jax.random.normal(jax.random.PRNGKey(7), (1, 32, 32, 3))
        img2 = jax.random.normal(jax.random.PRNGKey(8), (1, 32, 32, 3))
        params = m32.init(jax.random.PRNGKey(1), img1, img2)
        r32, _ = m32.apply(params, img1, img2)
        r16, _ = m16.apply(params, img1, img2)
        # heads run fp32 in both; bf16 body introduces moderate error
        err = np.abs(np.asarray(r32["pts3d"]) - np.asarray(r16["pts3d"]))
        assert float(np.median(err)) < 0.1
