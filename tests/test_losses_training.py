import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dust3r_tpu.losses import (L21, Regr3D, ConfLoss, Regr3D_ShiftInv,
                               Regr3D_ScaleInv, Regr3D_ScaleShiftInv)
from dust3r_tpu.models.model import AsymmetricCroCo3DStereo
from dust3r_tpu.training import (TrainSpec, init_train_state, build_train_step,
                                 cosine_warmup_lr, loss_of_one_batch)
from dust3r_tpu.utils.geometry import geotrf, inv

TINY = dict(img_size=(32, 32), patch_size=16, enc_embed_dim=64, enc_depth=2,
            enc_num_heads=2, dec_embed_dim=48, dec_depth=2, dec_num_heads=2,
            attn_impl="ref")


def make_batch(B=2, H=32, W=32, seed=0):
    rng = np.random.default_rng(seed)

    def view(k):
        pose = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
        pose[:, :3, 3] = rng.standard_normal((B, 3)) * 0.1
        return dict(
            img=jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32),
            pts3d=jnp.asarray(rng.uniform(0.5, 3, (B, H, W, 3)), jnp.float32),
            valid_mask=jnp.asarray(rng.uniform(size=(B, H, W)) > 0.2),
            camera_pose=jnp.asarray(pose),
        )
    return view(0), view(1)


def fake_preds(view1, view2, perfect=False, seed=1):
    rng = np.random.default_rng(seed)
    in_cam1 = inv(view1["camera_pose"])
    gt1 = geotrf(in_cam1, view1["pts3d"])
    gt2 = geotrf(in_cam1, view2["pts3d"])
    noise = 0.0 if perfect else 0.1
    p1 = gt1 + noise * jnp.asarray(rng.standard_normal(gt1.shape), jnp.float32)
    p2 = gt2 + noise * jnp.asarray(rng.standard_normal(gt2.shape), jnp.float32)
    conf = jnp.asarray(1.0 + rng.uniform(0.1, 2, gt1.shape[:-1]), jnp.float32)
    pred1 = dict(pts3d=p1, conf=conf)
    pred2 = dict(pts3d_in_other_view=p2, conf=conf)
    return pred1, pred2


class TestRegr3D:
    def test_perfect_prediction_zero_loss(self):
        v1, v2 = make_batch()
        pred1, pred2 = fake_preds(v1, v2, perfect=True)
        loss, details = Regr3D(L21)(v1, v2, pred1, pred2)
        assert float(loss) < 1e-5
        assert "Regr3D_pts3d_1" in details

    def test_noise_increases_loss(self):
        v1, v2 = make_batch()
        p1a, p2a = fake_preds(v1, v2, perfect=True)
        p1b, p2b = fake_preds(v1, v2, perfect=False)
        la, _ = Regr3D(L21)(v1, v2, p1a, p2a)
        lb, _ = Regr3D(L21)(v1, v2, p1b, p2b)
        assert float(lb) > float(la)

    def test_scale_invariance(self):
        """Predictions scaled by a constant give ~the same normalized loss."""
        v1, v2 = make_batch()
        pred1, pred2 = fake_preds(v1, v2)
        l1, _ = Regr3D(L21, norm_mode="avg_dis")(v1, v2, pred1, pred2)
        pred1s = dict(pts3d=pred1["pts3d"] * 5.0, conf=pred1["conf"])
        pred2s = dict(pts3d_in_other_view=pred2["pts3d_in_other_view"] * 5.0,
                      conf=pred2["conf"])
        l2, _ = Regr3D(L21, norm_mode="avg_dis")(v1, v2, pred1s, pred2s)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)

    def test_gt_scale_not_invariant(self):
        v1, v2 = make_batch()
        pred1, pred2 = fake_preds(v1, v2)
        crit = Regr3D(L21, norm_mode="avg_dis", gt_scale=True)
        l1, _ = crit(v1, v2, pred1, pred2)
        pred1s = dict(pts3d=pred1["pts3d"] * 5.0, conf=pred1["conf"])
        pred2s = dict(pts3d_in_other_view=pred2["pts3d_in_other_view"] * 5.0,
                      conf=pred2["conf"])
        l2, _ = crit(v1, v2, pred1s, pred2s)
        # pred normalized, gt kept at own scale -> same loss again actually;
        # but the *gt* scaled must change the loss
        v1b = dict(v1, pts3d=v1["pts3d"] * 5.0)
        v2b = dict(v2, pts3d=v2["pts3d"] * 5.0)
        l3, _ = crit(v1b, v2b, pred1, pred2)
        assert not np.isclose(float(l1), float(l3), rtol=1e-3)

    def test_shift_scale_inv_variants(self):
        v1, v2 = make_batch()
        pred1, pred2 = fake_preds(v1, v2)
        for cls in (Regr3D_ShiftInv, Regr3D_ScaleInv, Regr3D_ScaleShiftInv):
            loss, _ = cls(L21)(v1, v2, pred1, pred2)
            assert np.isfinite(float(loss))

    def test_eval_criterion_contract(self):
        """Regr3D_ScaleShiftInv(L21, gt_scale=True): the test criterion."""
        v1, v2 = make_batch()
        pred1, pred2 = fake_preds(v1, v2, perfect=True)
        loss, _ = Regr3D_ScaleShiftInv(L21, gt_scale=True)(v1, v2, pred1, pred2)
        assert float(loss) < 1e-4


class TestConfLoss:
    def test_formula(self):
        v1, v2 = make_batch()
        pred1, pred2 = fake_preds(v1, v2)
        loss, details = ConfLoss(Regr3D(L21), alpha=0.2)(v1, v2, pred1, pred2)
        assert np.isfinite(float(loss))
        assert "conf_loss_1" in details
        # uniform conf == 1 reduces ConfLoss to plain masked mean loss
        ones = jnp.ones_like(pred1["conf"])
        p1 = dict(pts3d=pred1["pts3d"], conf=ones)
        p2 = dict(pts3d_in_other_view=pred2["pts3d_in_other_view"], conf=ones)
        lc, _ = ConfLoss(Regr3D(L21), alpha=0.2)(v1, v2, p1, p2)
        lp, _ = Regr3D(L21)(v1, v2, p1, p2)
        np.testing.assert_allclose(float(lc), float(lp), rtol=1e-5)

    def test_loss_algebra(self):
        v1, v2 = make_batch()
        pred1, pred2 = fake_preds(v1, v2)
        combo = ConfLoss(Regr3D(L21), alpha=0.2) + 0.5 * Regr3D_ScaleInv(L21)
        loss, details = combo(v1, v2, pred1, pred2)
        l1, _ = ConfLoss(Regr3D(L21), alpha=0.2)(v1, v2, pred1, pred2)
        l2, _ = Regr3D_ScaleInv(L21)(v1, v2, pred1, pred2)
        np.testing.assert_allclose(float(loss), float(l1) + 0.5 * float(l2),
                                   rtol=1e-5)
        assert "ConfLoss" in repr(combo) and "0.5*" in repr(combo)


class TestTrainStep:
    def test_loss_decreases(self):
        model = AsymmetricCroCo3DStereo(**TINY)
        v1, v2 = make_batch()
        params = model.init(jax.random.PRNGKey(0), v1["img"], v2["img"])
        criterion = ConfLoss(Regr3D(L21), alpha=0.2)
        spec = TrainSpec(lr=1e-3, warmup_epochs=0, epochs=1, amp=False)
        state = init_train_state(params, spec)
        step = build_train_step(model, criterion, spec)

        losses = []
        for i in range(8):
            state, metrics = step(state, (v1, v2), jnp.asarray(0.5))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses
        assert np.isfinite(losses).all()

    def test_nonfinite_grads_skip_update(self):
        """NaN batch -> the step reports skipped=1 and leaves params and
        Adam moments untouched (GradScaler-skip analogue)."""
        model = AsymmetricCroCo3DStereo(**TINY)
        v1, v2 = make_batch()
        params = model.init(jax.random.PRNGKey(0), v1["img"], v2["img"])
        before = jax.tree.map(np.array, params)
        criterion = ConfLoss(Regr3D(L21), alpha=0.2)
        spec = TrainSpec(lr=1e-3, warmup_epochs=0, epochs=1, amp=False)
        state = init_train_state(params, spec)
        step = build_train_step(model, criterion, spec)

        bad_v1 = dict(v1, img=v1["img"].at[0, 0, 0, 0].set(jnp.nan))
        state, metrics = step(state, (bad_v1, v2), jnp.asarray(0.5))
        assert float(metrics["skipped"]) == 1.0
        after = jax.tree.leaves(state["params"])
        for a, b in zip(after, jax.tree.leaves(before)):
            np.testing.assert_array_equal(np.asarray(a), b)

        # a clean batch afterwards updates normally
        state, metrics = step(state, (v1, v2), jnp.asarray(0.5))
        assert float(metrics["skipped"]) == 0.0
        assert np.isfinite(float(metrics["loss"]))
        changed = any(
            not np.array_equal(np.asarray(a), b) for a, b in
            zip(jax.tree.leaves(state["params"]), jax.tree.leaves(before)))
        assert changed

    def test_clip_grad(self):
        model = AsymmetricCroCo3DStereo(**TINY)
        v1, v2 = make_batch()
        params = model.init(jax.random.PRNGKey(0), v1["img"], v2["img"])
        criterion = ConfLoss(Regr3D(L21), alpha=0.2)
        spec = TrainSpec(lr=1e-3, warmup_epochs=0, epochs=1, amp=False,
                         clip_grad=1e-6)  # absurdly tight: update ~ 0
        state = init_train_state(params, spec)
        step = build_train_step(model, criterion, spec)
        before = jax.tree.map(np.array, params)
        state, metrics = step(state, (v1, v2), jnp.asarray(0.5))
        # grad_norm metric is pre-clip; params moved by at most ~lr since
        # Adam normalizes, but the clipped grads are tiny -> effective
        # update far below the unclipped one. Just check it ran and params
        # moved by a bounded amount.
        assert float(metrics["grad_norm"]) > 1e-6
        for a, b in zip(jax.tree.leaves(state["params"]),
                        jax.tree.leaves(before)):
            assert float(np.max(np.abs(np.asarray(a) - b))) < 2e-3

    def test_grad_accum_matches_large_batch(self):
        model = AsymmetricCroCo3DStereo(**TINY)
        v1, v2 = make_batch(B=4)
        params = model.init(jax.random.PRNGKey(0), v1["img"][:1], v2["img"][:1])
        criterion = ConfLoss(Regr3D(L21), alpha=0.2)

        # NOTE the step donates its input state (in-place update), so the
        # second run needs its own copy of the parameters, made BEFORE the
        # first step consumes them.
        params2 = jax.tree.map(jnp.array, params)

        spec1 = TrainSpec(lr=1e-3, warmup_epochs=0, epochs=1, accum_iter=1)
        state1 = init_train_state(params, spec1)
        step1 = build_train_step(model, criterion, spec1)
        state1, m1 = step1(state1, (v1, v2), jnp.asarray(0.5))
        spec2 = TrainSpec(lr=1e-3, warmup_epochs=0, epochs=1, accum_iter=2)
        state2 = init_train_state(params2, spec2)
        step2 = build_train_step(model, criterion, spec2)
        split = jax.tree.map(lambda x: x.reshape((2, 2) + x.shape[1:]), (v1, v2))
        state2, m2 = step2(state2, split, jnp.asarray(0.5))

        # same data, same lr: parameter updates should be close. Not exact:
        # masked mean-of-means over micro-batches != joint mean when valid
        # counts differ (true for the reference's accum too), and Adam's
        # normalized first step amplifies tiny grad differences to ~lr.
        p1 = jax.tree.leaves(state1["params"])
        p2 = jax.tree.leaves(state2["params"])
        for a, b in zip(p1, p2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2.5e-3)

    def test_lr_schedule(self):
        lr = float(cosine_warmup_lr(5.0, 1e-4, 1e-6, 10, 100))
        np.testing.assert_allclose(lr, 5e-5, rtol=1e-6)  # mid-warmup
        lr_end = float(cosine_warmup_lr(100.0, 1e-4, 1e-6, 10, 100))
        np.testing.assert_allclose(lr_end, 1e-6, atol=1e-9)
        lr_mid = float(cosine_warmup_lr(55.0, 1e-4, 1e-6, 10, 100))
        np.testing.assert_allclose(lr_mid, (1e-4 + 1e-6) / 2, rtol=1e-3)


class TestMeshTraining:
    def test_8device_dp_fsdp_step(self):
        """Full train step over a 4x2 (data, fsdp) mesh on virtual devices."""
        from dust3r_tpu.parallel.mesh import (make_mesh, shard_params,
                                              shard_batch)
        assert len(jax.devices()) >= 8
        mesh = make_mesh(n_data=4, n_fsdp=2)
        model = AsymmetricCroCo3DStereo(**TINY)
        v1, v2 = make_batch(B=8)
        params = model.init(jax.random.PRNGKey(0), v1["img"][:1], v2["img"][:1])
        criterion = ConfLoss(Regr3D(L21), alpha=0.2)
        spec = TrainSpec(lr=1e-3, warmup_epochs=0, epochs=1)

        with mesh:
            sharded_params = shard_params(mesh, params)
            state = init_train_state(sharded_params, spec)
            batch = shard_batch(mesh, (v1, v2))
            step = build_train_step(model, criterion, spec, mesh=mesh)
            state, metrics = step(state, batch, jnp.asarray(0.0))
            loss_sharded = float(metrics["loss"])

        # compare against single-device step
        state_ref = init_train_state(params, spec)
        step_ref = build_train_step(model, criterion, spec)
        _, metrics_ref = step_ref(state_ref, (v1, v2), jnp.asarray(0.0))
        np.testing.assert_allclose(loss_sharded, float(metrics_ref["loss"]),
                                   rtol=1e-4)

    def test_8device_dp_fsdp_tp_step(self):
        """2x2x2 (data, fsdp, model) mesh: Megatron MLP tensor parallelism
        composed with FSDP + DP; loss must match single-device."""
        from dust3r_tpu.parallel.mesh import (make_mesh, shard_params,
                                              shard_batch, param_shardings)
        from jax.sharding import PartitionSpec as P
        assert len(jax.devices()) >= 8
        mesh = make_mesh(n_data=2, n_fsdp=2, n_model=2)
        model = AsymmetricCroCo3DStereo(**TINY)
        v1, v2 = make_batch(B=4)
        params = model.init(jax.random.PRNGKey(0), v1["img"][:1],
                            v2["img"][:1])

        # the MLP kernels really are TP-sharded
        sh = param_shardings(mesh, params)
        fc1 = sh["params"]["enc_blocks_0"]["mlp"]["fc1"]["kernel"].spec
        fc2 = sh["params"]["enc_blocks_0"]["mlp"]["fc2"]["kernel"].spec
        assert fc1[-1] == "model" and fc2[0] == "model"

        criterion = ConfLoss(Regr3D(L21), alpha=0.2)
        spec = TrainSpec(lr=1e-3, warmup_epochs=0, epochs=1)
        with mesh:
            state = init_train_state(shard_params(mesh, params), spec)
            batch = shard_batch(mesh, (v1, v2))
            step = build_train_step(model, criterion, spec, mesh=mesh)
            state, metrics = step(state, batch, jnp.asarray(0.0))
            loss_tp = float(metrics["loss"])

        state_ref = init_train_state(params, spec)
        step_ref = build_train_step(model, criterion, spec)
        _, metrics_ref = step_ref(state_ref, (v1, v2), jnp.asarray(0.0))
        np.testing.assert_allclose(loss_tp, float(metrics_ref["loss"]),
                                   rtol=1e-4)
