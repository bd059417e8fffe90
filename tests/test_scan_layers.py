"""scan_layers mode: lax.scan over stacked layer params must reproduce the
python-loop model exactly (given stacked weights)."""
import numpy as np
import jax
import jax.numpy as jnp

from dust3r_tpu.models.model import AsymmetricCroCo3DStereo
from dust3r_tpu.checkpoint import stack_scan_params, unstack_scan_params

TINY = dict(img_size=(32, 32), patch_size=16, enc_embed_dim=64, enc_depth=3,
            enc_num_heads=2, dec_embed_dim=48, dec_depth=2, dec_num_heads=2,
            attn_impl="ref")


def test_scan_matches_loop():
    loop_model = AsymmetricCroCo3DStereo(**TINY)
    scan_model = AsymmetricCroCo3DStereo(scan_layers=True, **TINY)

    img1 = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 48, 3))
    img2 = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 48, 3))
    loop_params = loop_model.init(jax.random.PRNGKey(2), img1, img2)
    scan_params = stack_scan_params(loop_params, TINY["enc_depth"],
                                    TINY["dec_depth"])

    # sanity: the stacked tree matches what scan init produces
    ref_tree = scan_model.init(jax.random.PRNGKey(3), img1, img2)
    ref_shapes = jax.tree.map(lambda x: x.shape, ref_tree)
    got_shapes = jax.tree.map(lambda x: x.shape, scan_params)
    assert ref_shapes == got_shapes

    r_loop1, r_loop2 = loop_model.apply(loop_params, img1, img2)
    r_scan1, r_scan2 = scan_model.apply(scan_params, img1, img2)
    np.testing.assert_allclose(np.asarray(r_scan1["pts3d"]),
                               np.asarray(r_loop1["pts3d"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_scan2["pts3d_in_other_view"]),
                               np.asarray(r_loop2["pts3d_in_other_view"]),
                               rtol=1e-5, atol=1e-5)

    # round-trip back to the per-layer tree
    back = unstack_scan_params(scan_params, TINY["enc_depth"],
                               TINY["dec_depth"])
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(loop_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _assert_grads_close(got, want, tol=1e-4):
    """Per-leaf scale-aware comparison: elementwise-relative tolerance is
    meaningless for near-zero entries of a chaotic deep-net gradient, so
    compare against each leaf's own magnitude."""
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.max(np.abs(b))), 1e-8)
        assert float(np.max(np.abs(a - b))) <= tol * scale


def test_remat_matches_plain():
    """remat=True must be numerically identical (forward AND grad) - it only
    changes what's saved for the backward pass."""
    plain = AsymmetricCroCo3DStereo(**TINY)
    remat = AsymmetricCroCo3DStereo(remat=True, **TINY)
    img1 = jax.random.normal(jax.random.PRNGKey(6), (1, 32, 32, 3))
    img2 = jax.random.normal(jax.random.PRNGKey(7), (1, 32, 32, 3))
    params = plain.init(jax.random.PRNGKey(8), img1, img2)

    def loss(m):
        def f(p):
            r1, r2 = m.apply(p, img1, img2)
            return jnp.sum(r1["pts3d"] ** 2) + jnp.sum(
                r2["pts3d_in_other_view"] ** 2)
        return f

    l_p, g_p = jax.value_and_grad(loss(plain))(params)
    l_r, g_r = jax.value_and_grad(loss(remat))(params)
    np.testing.assert_allclose(float(l_r), float(l_p), rtol=1e-6)
    _assert_grads_close(g_r, g_p)


import pytest


@pytest.mark.parametrize("remat_policy", ["full", "dots"])
def test_remat_scan_combo(remat_policy):
    """remat composes with scan_layers (the large-batch training config);
    both checkpoint policies ('full' recompute and 'dots' = save MXU
    matmul outputs) must be numerically identical to no-remat."""
    plain = AsymmetricCroCo3DStereo(scan_layers=True, **TINY)
    remat = AsymmetricCroCo3DStereo(scan_layers=True, remat=True,
                                    remat_policy=remat_policy, **TINY)
    img = jax.random.normal(jax.random.PRNGKey(9), (1, 32, 32, 3))
    params = plain.init(jax.random.PRNGKey(10), img, img)

    def loss(m, p):
        r1, _ = m.apply(p, img, img)
        return jnp.sum(r1["conf"])

    g_p = jax.grad(lambda p: loss(plain, p))(params)
    g_r = jax.grad(lambda p: loss(remat, p))(params)
    _assert_grads_close(g_r, g_p)


def test_scan_dpt_hooks():
    """DPT hooks consume per-layer scan outputs correctly."""
    cfg = dict(TINY, dec_depth=12, head_type="dpt")
    loop_model = AsymmetricCroCo3DStereo(**cfg)
    scan_model = AsymmetricCroCo3DStereo(scan_layers=True, **cfg)
    img = jax.random.normal(jax.random.PRNGKey(4), (1, 32, 32, 3))
    loop_params = loop_model.init(jax.random.PRNGKey(5), img, img)
    scan_params = stack_scan_params(loop_params, cfg["enc_depth"], 12)
    r1, _ = loop_model.apply(loop_params, img, img)
    s1, _ = scan_model.apply(scan_params, img, img)
    # scan/loop differ by float-reassociation noise (~6e-6 at the decoder)
    # which expm1 in the pointmap postprocess amplifies on large values
    np.testing.assert_allclose(np.asarray(s1["pts3d"]),
                               np.asarray(r1["pts3d"]), rtol=2e-3, atol=1e-3)
