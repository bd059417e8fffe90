"""Golden-value regression: fixed-seed tiny model must reproduce committed
outputs bit-for-bit-ish (guards against silent numeric drift across
refactors - the role of the reference parity tests, SURVEY.md §4)."""
import os.path as osp

import numpy as np
import jax

from dust3r_tpu.models.model import AsymmetricCroCo3DStereo

GOLDEN = osp.join(osp.dirname(__file__), "golden", "tiny_model_outputs.npz")

TINY = dict(img_size=(32, 32), patch_size=16, enc_embed_dim=64, enc_depth=2,
            enc_num_heads=2, dec_embed_dim=48, dec_depth=2, dec_num_heads=2,
            attn_impl="ref")


def test_golden_outputs():
    model = AsymmetricCroCo3DStereo(**TINY)
    img1 = jax.random.normal(jax.random.PRNGKey(10), (1, 32, 48, 3))
    img2 = jax.random.normal(jax.random.PRNGKey(11), (1, 32, 48, 3))
    params = model.init(jax.random.PRNGKey(12), img1, img2)
    r1, r2 = model.apply(params, img1, img2)

    golden = np.load(GOLDEN)
    np.testing.assert_allclose(np.asarray(r1["pts3d"]), golden["pts3d"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1["conf"]), golden["conf"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r2["pts3d_in_other_view"]),
                               golden["pts3d2"], rtol=1e-5, atol=1e-5)
