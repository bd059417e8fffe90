"""ManyAR true-orientation training path (VERDICT r1 item 4).

Reference semantics: portrait samples are STORED transposed (shape-uniform
batches, base_stereo_view_dataset.py:200-219) but PROCESSED at true
orientation (ManyAR patch embed dust3r/patch_embed.py:32-70 + per-sample
head split utils/misc.py:54-100), outputs returned at storage orientation.
The TPU build implements this with static shapes: both patchify
orientations + per-sample select, double head pass + select, triggered by
per-sample is_portrait flags.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dust3r_tpu.models.model import AsymmetricCroCo3DStereo

TINY = dict(img_size=(64, 64), patch_size=16, enc_embed_dim=64, enc_depth=2,
            enc_num_heads=2, dec_embed_dim=48, dec_depth=2, dec_num_heads=2,
            attn_impl="ref", landscape_only=False)


@pytest.fixture(scope="module", params=["linear", "dpt"])
def model_and_params(request):
    head_type = request.param
    cfg = dict(TINY, head_type=head_type)
    if head_type == "dpt":
        cfg["dec_depth"] = 12
    model = AsymmetricCroCo3DStereo(**cfg)
    img = jnp.zeros((1, 48, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, img)
    return model, params


def _rand_imgs(B, H, W, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), (B, H, W, 3))


class TestManyARModel:
    def test_portrait_matches_true_orientation(self, model_and_params):
        """A portrait sample stored transposed + is_portrait flag must
        produce EXACTLY the true-orientation result, transposed back to
        storage orientation."""
        model, params = model_and_params
        true1 = _rand_imgs(1, 64, 48, 1)   # true portrait (H > W)
        true2 = _rand_imgs(1, 64, 48, 2)

        rd1, rd2 = model.apply(params, true1, true2)          # direct
        stored1, stored2 = true1.swapaxes(1, 2), true2.swapaxes(1, 2)
        rm1, rm2 = model.apply(params, stored1, stored2,
                               is_portrait1=jnp.array([True]),
                               is_portrait2=jnp.array([True]))

        for k in ("pts3d", "conf"):
            want = np.asarray(rd1[k]).swapaxes(1, 2)
            np.testing.assert_allclose(np.asarray(rm1[k]), want,
                                       rtol=1e-5, atol=1e-5, err_msg=k)
        want = np.asarray(rd2["pts3d_in_other_view"]).swapaxes(1, 2)
        np.testing.assert_allclose(np.asarray(rm2["pts3d_in_other_view"]),
                                   want, rtol=1e-5, atol=1e-5)

    def test_all_landscape_flags_match_plain_path(self, model_and_params):
        """is_portrait=all-False must reproduce the plain program."""
        model, params = model_and_params
        img1, img2 = _rand_imgs(2, 48, 64, 3), _rand_imgs(2, 48, 64, 4)
        r1, r2 = model.apply(params, img1, img2)
        m1, m2 = model.apply(params, img1, img2,
                             is_portrait1=jnp.zeros(2, bool),
                             is_portrait2=jnp.zeros(2, bool))
        np.testing.assert_allclose(np.asarray(m1["pts3d"]),
                                   np.asarray(r1["pts3d"]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m2["pts3d_in_other_view"]),
                                   np.asarray(r2["pts3d_in_other_view"]),
                                   rtol=1e-5, atol=1e-5)

    def test_mixed_batch_selects_per_sample(self, model_and_params):
        """Mixed batch: each sample must equal its single-sample result.

        Tolerance note: the DPT head shows ~2e-3 batch-size-dependent
        float noise EVEN ON THE PLAIN PATH (measured: plain B=2 vs B=1
        maxdiff 0.00204 — conv reassociation amplified by the expm1
        postprocess), so the DPT comparison uses a tolerance above that
        floor; the single-sample test above pins the orientation math at
        1e-5."""
        model, params = model_and_params
        tol = dict(rtol=1e-3, atol=5e-3) if model.head_type == "dpt" \
            else dict(rtol=1e-5, atol=1e-5)
        land1, land2 = _rand_imgs(1, 48, 64, 5), _rand_imgs(1, 48, 64, 6)
        port_true1, port_true2 = _rand_imgs(1, 64, 48, 7), _rand_imgs(1, 64, 48, 8)
        stor1 = jnp.concatenate([land1, port_true1.swapaxes(1, 2)])
        stor2 = jnp.concatenate([land2, port_true2.swapaxes(1, 2)])
        mask = jnp.array([False, True])

        m1, m2 = model.apply(params, stor1, stor2,
                             is_portrait1=mask, is_portrait2=mask)
        rl1, rl2 = model.apply(params, land1, land2)
        rp1, rp2 = model.apply(params, port_true1, port_true2)

        np.testing.assert_allclose(np.asarray(m1["pts3d"][0]),
                                   np.asarray(rl1["pts3d"][0]), **tol)
        np.testing.assert_allclose(
            np.asarray(m1["pts3d"][1]),
            np.asarray(rp1["pts3d"][0]).swapaxes(0, 1), **tol)
        np.testing.assert_allclose(
            np.asarray(m2["pts3d_in_other_view"][1]),
            np.asarray(rp2["pts3d_in_other_view"][0]).swapaxes(0, 1), **tol)


class TestManyARTraining:
    def test_loss_identical_stored_transposed_or_not(self):
        """VERDICT r1 item 4 done-criterion: the training loss of a
        portrait sample is identical whether it enters as (stored
        transposed + flag) or directly at true orientation."""
        from dust3r_tpu.training import loss_of_one_batch
        from dust3r_tpu.losses import ConfLoss, Regr3D, L21

        model = AsymmetricCroCo3DStereo(**TINY)
        img = jnp.zeros((1, 48, 64, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), img, img)
        criterion = ConfLoss(Regr3D(L21, norm_mode="avg_dis"), alpha=0.2)

        rng = np.random.default_rng(0)
        H, W = 64, 48  # true portrait
        def make_view(seed):
            r = np.random.default_rng(seed)
            pts = r.standard_normal((1, H, W, 3)).astype(np.float32) + \
                np.float32([0, 0, 3])
            return dict(
                img=jnp.asarray(r.standard_normal((1, H, W, 3)),
                                jnp.float32),
                pts3d=jnp.asarray(pts),
                valid_mask=jnp.asarray(r.uniform(size=(1, H, W)) > 0.2),
                camera_pose=jnp.broadcast_to(jnp.eye(4), (1, 4, 4)))

        v1, v2 = make_view(1), make_view(2)

        def transposed_view(v):
            out = dict(v)
            for k in ("img", "pts3d"):
                out[k] = v[k].swapaxes(1, 2)
            out["valid_mask"] = v["valid_mask"].swapaxes(1, 2)
            out["is_portrait"] = jnp.array([True])
            return out

        (loss_true, det_true), _ = loss_of_one_batch(
            model, params, criterion, (v1, v2))
        (loss_stored, det_stored), _ = loss_of_one_batch(
            model, params, criterion,
            (transposed_view(v1), transposed_view(v2)))

        np.testing.assert_allclose(float(loss_stored), float(loss_true),
                                   rtol=1e-5)
        for k in det_true:
            if np.ndim(det_true[k]) == 0:
                np.testing.assert_allclose(float(det_stored[k]),
                                           float(det_true[k]), rtol=1e-5,
                                           err_msg=k)

    def test_add_manyar_flags(self):
        from dust3r_tpu.training import add_manyar_flags

        ts_land = np.array([[48, 64], [48, 64]])
        ts_mix = np.array([[48, 64], [64, 48]])
        v1 = dict(true_shape=ts_land, img=np.zeros((2, 48, 64, 3)))
        v2 = dict(true_shape=ts_land, img=np.zeros((2, 48, 64, 3)))
        o1, o2 = add_manyar_flags(v1, v2)
        assert "is_portrait" not in o1 and "is_portrait" not in o2

        v2m = dict(true_shape=ts_mix, img=np.zeros((2, 48, 64, 3)))
        o1, o2 = add_manyar_flags(v1, v2m)
        assert "is_portrait" in o1 and "is_portrait" in o2
        np.testing.assert_array_equal(o1["is_portrait"], [False, False])
        np.testing.assert_array_equal(o2["is_portrait"], [False, True])


class TestSymmetrizedFastPath:
    """Reference model.py:162-166: (I,J),(J,I)-interleaved batches encode
    only view1; view2's features are a pair-swap permutation."""

    def test_matches_plain_path(self):
        model = AsymmetricCroCo3DStereo(**TINY)
        I = _rand_imgs(1, 48, 64, 20)
        J = _rand_imgs(1, 48, 64, 21)
        K = _rand_imgs(1, 48, 64, 22)
        L = _rand_imgs(1, 48, 64, 23)
        img1 = jnp.concatenate([I, J, K, L])      # (I,J),(J,I),(K,L),(L,K)
        img2 = jnp.concatenate([J, I, L, K])
        params = model.init(jax.random.PRNGKey(0), img1[:1], img2[:1])
        r1, r2 = model.apply(params, img1, img2)
        s1, s2 = model.apply(params, img1, img2, symmetrized=True)
        np.testing.assert_allclose(np.asarray(s1["pts3d"]),
                                   np.asarray(r1["pts3d"]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s2["pts3d_in_other_view"]),
                                   np.asarray(r2["pts3d_in_other_view"]),
                                   rtol=1e-5, atol=1e-5)

    def test_manyar_symmetrized(self):
        """Mixed-orientation symmetric batch: fast path must agree with
        the plain ManyAR path."""
        model = AsymmetricCroCo3DStereo(**TINY)
        land = _rand_imgs(1, 48, 64, 24)
        port = _rand_imgs(1, 64, 48, 25).swapaxes(1, 2)   # stored landscape
        img1 = jnp.concatenate([land, port])
        img2 = jnp.concatenate([port, land])
        m1 = jnp.array([False, True])
        m2 = jnp.array([True, False])
        params = model.init(jax.random.PRNGKey(0), img1[:1], img2[:1])
        r1, r2 = model.apply(params, img1, img2,
                             is_portrait1=m1, is_portrait2=m2)
        s1, s2 = model.apply(params, img1, img2,
                             is_portrait1=m1, is_portrait2=m2,
                             symmetrized=True)
        np.testing.assert_allclose(np.asarray(s1["pts3d"]),
                                   np.asarray(r1["pts3d"]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s2["pts3d_in_other_view"]),
                                   np.asarray(r2["pts3d_in_other_view"]),
                                   rtol=1e-5, atol=1e-5)

    def test_training_loss_matches(self):
        """build_train_step(symmetrized=True) must produce the same loss
        as the plain path on a make_batch_symmetric batch."""
        from dust3r_tpu.training import (TrainSpec, init_train_state,
                                         build_train_step,
                                         make_batch_symmetric,
                                         _batch_to_device)
        from dust3r_tpu.losses import ConfLoss, Regr3D, L21

        model = AsymmetricCroCo3DStereo(**TINY)
        rng = np.random.default_rng(3)
        H, W = 48, 64

        def make_view(seed):
            r = np.random.default_rng(seed)
            pose = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
            return dict(
                img=r.standard_normal((2, H, W, 3)).astype(np.float32),
                pts3d=(r.standard_normal((2, H, W, 3)).astype(np.float32)
                       + np.float32([0, 0, 3])),
                valid_mask=r.uniform(size=(2, H, W)) > 0.2,
                camera_pose=pose,
                true_shape=np.tile(np.int32([H, W]), (2, 1)))

        v1, v2 = make_batch_symmetric(make_view(1), make_view(2))
        batch = (_batch_to_device(v1), _batch_to_device(v2))
        criterion = ConfLoss(Regr3D(L21), alpha=0.2)
        spec = TrainSpec(lr=1e-4, warmup_epochs=0, epochs=1)
        params = model.init(jax.random.PRNGKey(0),
                            batch[0]["img"][:1], batch[1]["img"][:1])
        losses = {}
        for sym in (False, True):
            # step_fn donates its state; give each run its own param copy
            state = init_train_state(jax.tree.map(jnp.copy, params), spec)
            step = build_train_step(model, criterion, spec, symmetrized=sym)
            _, metrics = step(state, batch, jnp.asarray(0.0))
            losses[sym] = float(metrics["loss"])
        np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)
