import numpy as np
import pytest

from dust3r_tpu.cloud_opt import (global_aligner, GlobalAlignerMode,
                                  PointCloudOptimizer, PairViewer)
from dust3r_tpu.utils.geometry import (xy_grid, geotrf, inv,
                                       depthmap_to_absolute_camera_coordinates)

# No file-level slow mark: the seconds-scale unit tests (consts layout,
# int8 quantize/dequant, presets, optimizer accessors) stay in the quick
# (-m quick) dev-loop suite; only the individually-marked multi-minute
# alignment/equivalence runs are excluded (measured per-test in
# /tmp/cloudopt_durations.log, round 5).


def make_synthetic_scene(n_imgs=4, H=24, W=32, focal=40.0, seed=0,
                         symmetrize=True, edges=None):
    """Fabricate perfectly consistent pairwise predictions from a known
    scene: per-image smooth depth + circular camera rig."""
    rng = np.random.default_rng(seed)
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)

    poses = []
    world_pts = []
    depths = []
    for k in range(n_imgs):
        ang = 0.25 * k
        R = np.array([[np.cos(ang), 0, np.sin(ang)],
                      [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]], np.float32)
        t = np.array([np.sin(ang) * 2, 0.1 * k, -2 * np.cos(ang)], np.float32)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3], pose[:3, 3] = R, t
        poses.append(pose)

        yy, xx = np.mgrid[:H, :W]
        depth = (2.5 + 0.5 * np.sin(xx / 7 + k) * np.cos(yy / 5)
                 + 0.05 * rng.standard_normal((H, W))).astype(np.float32)
        depths.append(depth)
        wpts, _ = depthmap_to_absolute_camera_coordinates(depth, K, pose)
        world_pts.append(np.asarray(wpts))

    if edges is None:
        edges = [(i, j) for i in range(n_imgs) for j in range(n_imgs)
                 if i != j] if symmetrize \
            else [(i, j) for i in range(n_imgs) for j in range(i)]

    pred1_pts, pred2_pts, conf1, conf2 = [], [], [], []
    for i, j in edges:
        w2c = np.asarray(inv(poses[i]))
        pred1_pts.append(np.asarray(geotrf(w2c, world_pts[i])))
        pred2_pts.append(np.asarray(geotrf(w2c, world_pts[j])))
        conf1.append(np.full((H, W), 3.5, np.float32) +
                     rng.uniform(0, 1, (H, W)).astype(np.float32))
        conf2.append(np.full((H, W), 3.5, np.float32) +
                     rng.uniform(0, 1, (H, W)).astype(np.float32))

    out = dict(
        view1=dict(idx=[i for i, j in edges],
                   img=np.zeros((len(edges), H, W, 3), np.float32)),
        view2=dict(idx=[j for i, j in edges],
                   img=np.zeros((len(edges), H, W, 3), np.float32)),
        pred1=dict(pts3d=np.stack(pred1_pts), conf=np.stack(conf1)),
        pred2=dict(pts3d_in_other_view=np.stack(pred2_pts),
                   conf=np.stack(conf2)),
    )
    return out, poses, depths, focal


def relpose(p0, p1):
    return np.asarray(inv(p0)) @ np.asarray(p1)


def angular_error_deg(R1, R2):
    cos = (np.trace(R1.T @ R2) - 1) / 2
    return np.degrees(np.arccos(np.clip(cos, -1, 1)))


class TestPointCloudOptimizer:
    @pytest.fixture(scope="class")
    def aligned(self):
        out, poses, depths, focal = make_synthetic_scene()
        scene = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                               verbose=False)
        loss = scene.compute_global_alignment(init="mst", niter=150,
                                              schedule="cosine", lr=0.01)
        return scene, poses, depths, focal, loss

    def test_loss_converges(self, aligned):
        scene, *_, loss = aligned
        assert np.isfinite(loss)
        assert loss < 0.03, f"alignment loss too high: {loss}"
        # loss decreased over iterations
        assert scene.last_losses[-1] < scene.last_losses[10]

    def test_focals_recovered(self, aligned):
        scene, poses, depths, focal, _ = aligned
        focals = np.asarray(scene.get_focals()).reshape(-1)
        np.testing.assert_allclose(focals, focal, rtol=0.05)

    def test_relative_poses_recovered(self, aligned):
        scene, poses, *_ = aligned
        est = np.asarray(scene.get_im_poses())
        for k in range(1, len(poses)):
            gt_rel = relpose(poses[0], poses[k])
            est_rel = relpose(est[0], est[k])
            assert angular_error_deg(gt_rel[:3, :3], est_rel[:3, :3]) < 3.0
            # translation direction (scale-free)
            tg = gt_rel[:3, 3] / np.linalg.norm(gt_rel[:3, 3])
            te = est_rel[:3, 3] / np.linalg.norm(est_rel[:3, 3])
            assert np.dot(tg, te) > 0.99

    def test_depthmaps_recovered_up_to_scale(self, aligned):
        scene, poses, depths, *_ = aligned
        est = scene.get_depthmaps()
        ratios = [np.median(np.asarray(e) / d) for e, d in zip(est, depths)]
        # one global scale, consistent across images
        np.testing.assert_allclose(ratios, np.mean(ratios), rtol=0.05)
        for e, d, r in zip(est, depths, ratios):
            np.testing.assert_allclose(np.asarray(e), d * r, rtol=0.1)

    def test_accessor_shapes(self, aligned):
        scene, *_ = aligned
        n = scene.n_imgs
        assert np.asarray(scene.get_im_poses()).shape == (n, 4, 4)
        assert np.asarray(scene.get_intrinsics()).shape == (n, 3, 3)
        pts = scene.get_pts3d()
        assert len(pts) == n and np.asarray(pts[0]).shape == (24, 32, 3)
        masks = scene.get_masks()
        assert masks[0].shape == (24, 32) and masks[0].dtype == bool
        conf = scene.get_conf()
        assert len(conf) == n

    def test_pts3d_consistent_with_pose_and_depth(self, aligned):
        scene, *_ = aligned
        pts = np.asarray(scene.get_pts3d()[0])
        depth = np.asarray(scene.get_depthmaps()[0])
        K = np.asarray(scene.get_intrinsics()[0])
        pose = np.asarray(scene.get_im_poses()[0])
        pts_ref, _ = depthmap_to_absolute_camera_coordinates(depth, K, pose)
        np.testing.assert_allclose(pts, np.asarray(pts_ref), atol=1e-3)


class TestCleanAndMisc:
    def test_clean_pointcloud_runs(self):
        out, *_ = make_synthetic_scene(n_imgs=3)
        scene = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                               verbose=False)
        scene.compute_global_alignment(init="mst", niter=20, lr=0.01)
        scene.clean_pointcloud()
        assert all(np.isfinite(c).all() for c in scene.im_conf)

    def test_no_init_alignment(self):
        out, *_ = make_synthetic_scene(n_imgs=3)
        scene = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                               verbose=False)
        loss = scene.compute_global_alignment(init=None, niter=10, lr=0.01)
        assert np.isfinite(loss)


class TestPresets:
    def test_preset_pose_and_focal(self):
        out, poses, depths, focal = make_synthetic_scene(n_imgs=3)
        scene = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                               verbose=False)
        scene.preset_pose([poses[0], poses[1], poses[2]])
        scene.preset_focal([focal] * 3)
        loss = scene.compute_global_alignment(init="known_poses", niter=100,
                                              lr=0.01)
        assert loss < 0.05
        est = np.asarray(scene.get_im_poses())
        for k in range(3):
            np.testing.assert_allclose(est[k], poses[k], atol=1e-4)
        focals = np.asarray(scene.get_focals()).reshape(-1)
        np.testing.assert_allclose(focals, focal, rtol=1e-5)
        # absolute scale is pinned by the known poses
        for e, d in zip(scene.get_depthmaps(), depths):
            np.testing.assert_allclose(np.asarray(e), d, rtol=0.15)


class TestPresetSemantics:
    """Reference preset contracts (reference cloud_opt/optimizer.py:63-95
    vs modular_optimizer.py:38-69): the dense optimizer requires presets
    to cover EVERY image; the Modular variant allows partial presets and
    freezes only what it actually set."""

    def test_incomplete_mask_raises(self):
        out, poses, depths, focal = make_synthetic_scene(n_imgs=3)
        scene = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                               verbose=False)
        with pytest.raises(AssertionError, match="incomplete mask"):
            scene.preset_pose([poses[0]], pose_msk=[0])
        with pytest.raises(AssertionError, match="incomplete mask"):
            scene.preset_focal([focal], msk=[1])

    def test_count_mismatch_raises(self):
        """Fewer values than selected images must raise, not silently
        freeze images it never set (beyond-reference guard; the reference
        zip()s silently)."""
        out, poses, depths, focal = make_synthetic_scene(n_imgs=3)
        scene = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                               verbose=False)
        with pytest.raises(AssertionError, match="focals"):
            scene.preset_focal([focal])  # msk=None selects all 3 images
        with pytest.raises(AssertionError, match="poses"):
            scene.preset_pose([poses[0], poses[1]])

    def test_norm_pw_scale_off_after_complete_preset(self):
        """A complete preset_pose pins absolute scale: norm_pw_scale ends
        False (reference optimizer.py:80-81)."""
        out, poses, depths, focal = make_synthetic_scene(n_imgs=3)
        scene = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                               verbose=False)
        assert scene.norm_pw_scale is True
        scene.preset_pose([poses[0], poses[1], poses[2]])
        assert scene.norm_pw_scale is False

    def test_modular_partial_preset_freezes_only_assigned(self):
        from dust3r_tpu.cloud_opt import ModularPointCloudOptimizer
        out, poses, depths, focal = make_synthetic_scene(n_imgs=3)
        scene = ModularPointCloudOptimizer(
            out["view1"], out["view2"], out["pred1"], out["pred2"],
            verbose=False)
        scene.preset_pose([poses[0]])  # only image 0 gets a pose
        m = np.asarray(scene.masks["im_poses"])
        assert not m[0].any()          # frozen
        assert m[1].all() and m[2].all()  # still optimizable
        assert scene.norm_pw_scale is True  # 1 known pose: scale still free
        scene.preset_pose([poses[1]], pose_msk=[1])
        m = np.asarray(scene.masks["im_poses"])
        assert not m[0].any() and not m[1].any() and m[2].all()
        assert scene.norm_pw_scale is False  # cumulative count is 2

    def test_modular_partial_focal_preset(self):
        from dust3r_tpu.cloud_opt import ModularPointCloudOptimizer
        out, poses, depths, focal = make_synthetic_scene(n_imgs=3)
        scene = ModularPointCloudOptimizer(
            out["view1"], out["view2"], out["pred1"], out["pred2"],
            verbose=False)
        scene.preset_focal([focal])  # partial: image 0 only
        m = np.asarray(scene.masks["im_focals"])
        assert not m[0].any()
        assert m[1].all() and m[2].all()
        np.testing.assert_allclose(
            np.asarray(scene.get_focals()).reshape(-1)[0], focal, rtol=1e-5)

    def test_modular_empty_preset_is_noop(self):
        """Zero known values (e.g. preset_pose(poses[msk]) with an all-False
        msk) must be a silent no-op like the reference's zip, not an
        IndexError from float64 empty-array indexing in _freeze."""
        from dust3r_tpu.cloud_opt import ModularPointCloudOptimizer
        out, poses, depths, focal = make_synthetic_scene(n_imgs=3)
        scene = ModularPointCloudOptimizer(
            out["view1"], out["view2"], out["pred1"], out["pred2"],
            verbose=False)
        scene.preset_pose(np.zeros((0, 4, 4)), pose_msk=[])
        scene.preset_focal([])
        scene.preset_principal_point(np.zeros((0, 2)))
        assert np.asarray(scene.masks["im_poses"]).all()
        assert np.asarray(scene.masks["im_focals"]).all()
        assert scene.norm_pw_scale is True

    def test_known_focals_fx_and_fy_per_image(self):
        """get_known_focals must return ONE focal per image — the fx/fy
        mean under fx_and_fy=True (reference init_im_poses.py:44
        im_focals[i].mean()), not a flat 2N vector."""
        from dust3r_tpu.cloud_opt import ModularPointCloudOptimizer
        from dust3r_tpu.cloud_opt.init_im_poses import get_known_focals
        out, poses, depths, focal = make_synthetic_scene(n_imgs=3)
        scene = ModularPointCloudOptimizer(
            out["view1"], out["view2"], out["pred1"], out["pred2"],
            fx_and_fy=True, verbose=False)
        K = np.eye(3, dtype=np.float32)
        K[0, 0], K[1, 1] = 42.0, 37.0
        K[0, 2], K[1, 2] = 16.0, 12.0
        scene.preset_intrinsics([K] * 3)
        n_known, msk, focals = get_known_focals(scene)
        assert n_known == 3
        assert focals.shape == (3,)
        np.testing.assert_allclose(focals, 39.5, rtol=1e-5)  # (42+37)/2

    def test_modular_known_poses_init_fx_and_fy(self):
        """End-to-end: init='known_poses' on an fx_and_fy Modular scene —
        the path that previously misindexed focals past image 0."""
        from dust3r_tpu.cloud_opt import ModularPointCloudOptimizer
        out, poses, depths, focal = make_synthetic_scene(n_imgs=3)
        scene = ModularPointCloudOptimizer(
            out["view1"], out["view2"], out["pred1"], out["pred2"],
            fx_and_fy=True, verbose=False)
        H, W = np.asarray(scene.imshapes[0])
        K = np.eye(3, dtype=np.float32)
        K[0, 0] = K[1, 1] = focal
        K[0, 2], K[1, 2] = W / 2, H / 2
        scene.preset_pose(list(poses))
        scene.preset_intrinsics([K] * 3)
        loss = scene.compute_global_alignment(init="known_poses", niter=50,
                                              lr=0.01)
        assert np.isfinite(loss) and loss < 0.05
        est = np.asarray(scene.get_im_poses())
        for k in range(3):
            np.testing.assert_allclose(est[k], poses[k], atol=1e-4)


class TestPairViewer:
    def test_two_image_scene(self):
        out, poses, depths, focal = make_synthetic_scene(n_imgs=2)
        scene = global_aligner(out, mode=GlobalAlignerMode.PairViewer,
                               verbose=False)
        focals = np.asarray(scene.get_focals())
        np.testing.assert_allclose(focals, focal, rtol=0.05)
        est = np.asarray(scene.get_im_poses())
        gt_rel = relpose(poses[0], poses[1])
        est_rel = relpose(est[0], est[1])
        assert angular_error_deg(gt_rel[:3, :3], est_rel[:3, :3]) < 2.0
        pts = scene.get_pts3d()
        assert len(pts) == 2
        assert np.isnan(scene.forward())


class TestModularFxFy:
    def test_fx_and_fy_presets(self):
        from dust3r_tpu.cloud_opt import ModularPointCloudOptimizer
        out, poses, depths, focal = make_synthetic_scene(n_imgs=3)
        scene = ModularPointCloudOptimizer(
            out["view1"], out["view2"], out["pred1"], out["pred2"],
            fx_and_fy=True, verbose=False)
        assert np.asarray(scene.get_focals()).shape == (3, 2)
        K = np.eye(3, dtype=np.float32)
        K[0, 0], K[1, 1] = 42.0, 37.0
        K[0, 2], K[1, 2] = 16.0, 12.0
        scene.preset_intrinsics([K] * 3)
        focals = np.asarray(scene.get_focals())
        np.testing.assert_allclose(focals[:, 0], 42.0, rtol=1e-5)
        np.testing.assert_allclose(focals[:, 1], 37.0, rtol=1e-5)
        Kout = np.asarray(scene.get_intrinsics())
        np.testing.assert_allclose(Kout[0, 0, 0], 42.0, rtol=1e-5)
        np.testing.assert_allclose(Kout[0, 1, 1], 37.0, rtol=1e-5)
        # optimization still runs with frozen intrinsics
        loss = scene.compute_global_alignment(init="mst", niter=10, lr=0.01)
        assert np.isfinite(loss)


class TestBf16Observations:
    def test_recovery_with_bf16_obs(self):
        """obs_dtype=bf16 halves aligner HBM traffic; recovery quality must
        stay within the same tolerances."""
        import jax.numpy as jnp
        out, poses, depths, focal = make_synthetic_scene()
        scene = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                               verbose=False, obs_dtype=jnp.bfloat16)
        loss = scene.compute_global_alignment(init="mst", niter=150,
                                              schedule="cosine", lr=0.01)
        assert np.isfinite(loss)
        focals = np.asarray(scene.get_focals()).reshape(-1)
        np.testing.assert_allclose(focals, focal, rtol=0.05)
        est = np.asarray(scene.get_im_poses())
        gt_rel = relpose(poses[0], poses[1])
        est_rel = relpose(est[0], est[1])
        assert angular_error_deg(gt_rel[:3, :3], est_rel[:3, :3]) < 3.0


class TestBf16ObsAccuracyDelta:
    def test_bf16_vs_fp32_obs_deltas(self):
        """Head-to-head accuracy delta between observation dtypes on the
        same scene: the quantities users consume (final loss, focals,
        relative pose angles) must agree closely. This is the evidence
        backing bf16 as the default obs_dtype (distances are computed
        fp32 either way; bf16 only stores the frozen observations)."""
        import jax.numpy as jnp

        out, poses, depths, focal = make_synthetic_scene(n_imgs=4, seed=2)
        res = {}
        for dt in (jnp.float32, jnp.bfloat16):
            scene = global_aligner(
                out, mode=GlobalAlignerMode.PointCloudOptimizer,
                verbose=False, obs_dtype=dt)
            loss = scene.compute_global_alignment(init="mst", niter=150,
                                                  schedule="cosine", lr=0.01)
            est = np.asarray(scene.get_im_poses())
            res[np.dtype(dt).name] = dict(
                loss=loss,
                focal_err=np.abs(np.asarray(scene.get_focals()).reshape(-1)
                                 - focal).max() / focal,
                pose_err=max(angular_error_deg(
                    relpose(poses[0], poses[k])[:3, :3],
                    relpose(est[0], est[k])[:3, :3]) for k in range(1, 4)))
        a, b = res["float32"], res["bfloat16"]
        # on a perfectly-consistent synthetic scene fp32 converges to a
        # near-zero loss FLOOR while bf16 floors at its observation
        # quantization (~4e-3); the user-visible quantities must match GT
        # as well as fp32 does (measured 2026-08-17: bf16 0.26%/0.04deg
        # vs fp32 0.40%/0.06deg - inside optimization noise)
        assert b["loss"] < 0.01
        assert b["focal_err"] <= a["focal_err"] + 0.005
        assert b["pose_err"] <= a["pose_err"] + 0.1


class TestInt8ObsAccuracyDelta:
    """obs_dtype='int8' halves observation storage vs bf16 — the 16 GB-
    chip bound on single-chip scene size (complete@50 = 2450 edges:
    7.7 GB bf16 vs 3.9 GB int8). Storage-side symmetric per-slot max-abs
    quantization (per coordinate plane for the preds), dequantized chunk-
    at-a-time inside the loss scan; distances stay fp32. Floor-aware
    defense in the TestBf16ObsAccuracyDelta mold: the floor is coarser
    (step = max|v|/127 of each slot's range), but user-visible
    quantities must track fp32."""

    def test_int8_vs_fp32_obs_deltas(self):
        import jax.numpy as jnp

        out, poses, depths, focal = make_synthetic_scene(n_imgs=4, seed=2)
        res = {}
        for dt in (jnp.float32, "int8"):
            scene = global_aligner(
                out, mode=GlobalAlignerMode.PointCloudOptimizer,
                verbose=False, obs_dtype=dt)
            loss = scene.compute_global_alignment(init="mst", niter=150,
                                                  schedule="cosine", lr=0.01)
            est = np.asarray(scene.get_im_poses())
            res[str(dt)] = dict(
                loss=loss,
                focal_err=np.abs(np.asarray(scene.get_focals()).reshape(-1)
                                 - focal).max() / focal,
                pose_err=max(angular_error_deg(
                    relpose(poses[0], poses[k])[:3, :3],
                    relpose(est[0], est[k])[:3, :3]) for k in range(1, 4)))
        a, b = res[str(jnp.float32)], res["int8"]
        # on a perfectly-consistent synthetic scene fp32 converges to a
        # near-zero FLOOR; int8 floors at its observation quantization
        # (~1e-2 on this scene: coarser than bf16's ~4e-3, as the
        # 8-bit-of-range step predicts). The user-visible quantities
        # must still match GT about as well as fp32 does.
        assert b["loss"] < 0.03
        assert b["focal_err"] <= a["focal_err"] + 0.01
        assert b["pose_err"] <= a["pose_err"] + 0.3

    def test_int8_consts_dequantize_within_step(self):
        """Stored int8 consts must dequantize to within one quantization
        step of the fp32 observations, slot by slot."""
        import jax.numpy as jnp
        from dust3r_tpu.cloud_opt.base_opt import _dequant

        out, *_ = make_synthetic_scene(n_imgs=3, seed=0)
        q = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                           verbose=False, obs_dtype="int8")
        f = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                           verbose=False, obs_dtype=jnp.float32)
        for k in ("group_pred_i", "group_pred_j", "group_w_i", "group_w_j"):
            deq = np.asarray(_dequant(q.consts[k], q.consts[k + "_scale"]))
            ref = np.asarray(f.consts[k], np.float32)
            step = np.asarray(q.consts[k + "_scale"])[..., None]
            assert np.all(np.abs(deq - ref) <= 0.5 * step + 1e-12), k

    @pytest.mark.slow
    def test_int8_chunked_matches_flat(self):
        """int8 storage must compose with the chunked scan: loss and
        grads identical between flat (K=1) and chunked paths."""
        import jax

        out, *_ = make_synthetic_scene(n_imgs=6, seed=1)
        ref = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                             verbose=False, obs_dtype="int8", edge_chunk=0)
        chk = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                             verbose=False, obs_dtype="int8", edge_chunk=8)
        params = dict(ref.params)
        l_ref, g_ref = jax.value_and_grad(ref.loss_fn)(params,
                                                       dict(ref.consts))
        l_chk, g_chk = jax.value_and_grad(chk.loss_fn)(params,
                                                       dict(chk.consts))
        np.testing.assert_allclose(float(l_ref), float(l_chk), rtol=1e-6)
        for k in g_ref:
            np.testing.assert_allclose(np.asarray(g_ref[k]),
                                       np.asarray(g_chk[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)


class TestEdgeChunking:
    """Above edge_chunk edges, loss_fn scans rematerialized chunks so peak
    HBM stays O(chunk * A). Chunked and unchunked paths must agree on the
    loss, its gradients, and the full alignment trajectory."""

    def test_chunked_loss_and_grads_match(self):
        import jax
        import jax.numpy as jnp
        # 6 images, complete symmetrized graph = 30 edges; chunk=8 forces
        # the scan path with a remainder (30 = 3*8 + 6)
        out, poses, depths, focal = make_synthetic_scene(n_imgs=6)
        ref = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                             verbose=False, edge_chunk=0)
        chk = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                             verbose=False, edge_chunk=8)
        params = dict(ref.params)
        l_ref, g_ref = jax.value_and_grad(ref.loss_fn)(params, dict(ref.consts))
        l_chk, g_chk = jax.value_and_grad(chk.loss_fn)(params, dict(chk.consts))
        np.testing.assert_allclose(float(l_ref), float(l_chk), rtol=1e-6)
        for k in g_ref:
            np.testing.assert_allclose(np.asarray(g_ref[k]),
                                       np.asarray(g_chk[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)

    @pytest.mark.slow
    def test_chunked_alignment_recovers(self):
        out, poses, depths, focal = make_synthetic_scene(n_imgs=6)
        scene = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                               verbose=False, edge_chunk=8)
        loss = scene.compute_global_alignment(init="mst", niter=150,
                                              schedule="cosine", lr=0.01)
        assert np.isfinite(loss)
        focals = np.asarray(scene.get_focals()).reshape(-1)
        np.testing.assert_allclose(focals, focal, rtol=0.05)
        est = np.asarray(scene.get_im_poses())
        gt_rel = relpose(poses[0], poses[1])
        est_rel = relpose(est[0], est[1])
        assert angular_error_deg(gt_rel[:3, :3], est_rel[:3, :3]) < 3.0


class TestSplitRowGroups:
    """Unbalanced graphs (oneref stars) would pad the grouped observation
    layout to O(N * G_max * A) - the hub image's group is ~E wide. Groups
    larger than group_cap split into capped rows mapped back through
    row->image indices; the math must be identical to the 1:1 layout."""

    @pytest.mark.slow
    def test_forced_split_matches_legacy(self):
        import jax
        out, *_ = make_synthetic_scene(n_imgs=5)
        ref = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                             verbose=False)
        spl = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                             verbose=False, group_cap=2)
        assert "group_img_i" not in ref.consts
        assert "group_img_i" in spl.consts
        params = dict(ref.params)
        l_ref, g_ref = jax.value_and_grad(ref.loss_fn)(params,
                                                       dict(ref.consts))
        l_spl, g_spl = jax.value_and_grad(spl.loss_fn)(params,
                                                       dict(spl.consts))
        np.testing.assert_allclose(float(l_ref), float(l_spl), rtol=1e-6)
        for k in g_ref:
            np.testing.assert_allclose(np.asarray(g_ref[k]),
                                       np.asarray(g_spl[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)

    @pytest.mark.slow
    def test_forced_split_chunked_matches(self):
        import jax
        # group_cap=2 + tiny edge_chunk: the K>1 split scan path with the
        # accumulated (not slice-stacked) world-point gradient
        out, *_ = make_synthetic_scene(n_imgs=5)
        ref = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                             verbose=False)
        chk = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                             verbose=False, group_cap=2, edge_chunk=8)
        assert chk._n_img_groups[0] > 1  # actually chunked
        params = dict(ref.params)
        l_ref, g_ref = jax.value_and_grad(ref.loss_fn)(params,
                                                       dict(ref.consts))
        l_chk, g_chk = jax.value_and_grad(chk.loss_fn)(params,
                                                       dict(chk.consts))
        np.testing.assert_allclose(float(l_ref), float(l_chk), rtol=1e-6)
        for k in g_ref:
            np.testing.assert_allclose(np.asarray(g_ref[k]),
                                       np.asarray(g_chk[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)

    @pytest.mark.slow
    def test_star_graph_autosplits_and_recovers(self):
        # oneref star, symmetrized: hub 0 sits on every edge, so the 1:1
        # grouped layout would pad every image's row to G = n-1
        n = 9
        edges = [(0, j) for j in range(1, n)] + \
                [(j, 0) for j in range(1, n)]
        out, poses, depths, focal = make_synthetic_scene(n_imgs=n,
                                                         edges=edges)
        scene = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                               verbose=False)
        assert "group_img_i" in scene.consts  # auto-engaged
        K, nc, G = scene._n_img_groups
        E = len(edges)
        # compact: padded slots bounded by ~2x the edges (plus row pads),
        # NOT n * G_max = 72
        assert K * nc * G <= 2 * E + 2 * G, (K, nc, G)
        loss = scene.compute_global_alignment(init="mst", niter=150,
                                              schedule="cosine", lr=0.01)
        assert np.isfinite(loss)
        focals = np.asarray(scene.get_focals()).reshape(-1)
        np.testing.assert_allclose(focals, focal, rtol=0.05)
        est = np.asarray(scene.get_im_poses())
        gt_rel = relpose(poses[0], poses[1])
        est_rel = relpose(est[0], est[1])
        assert angular_error_deg(gt_rel[:3, :3], est_rel[:3, :3]) < 3.0


class TestMeshShardedEdges:
    """Image-axis sharding of the grouped observations over a device
    mesh (SURVEY §5's TPU analogue of aligner scale): each device owns
    its images' edge groups, params replicated, XLA inserts the
    loss/pose-grad all-reduce. Must match the single-device path."""

    def _mesh(self):
        import jax
        from jax.sharding import Mesh
        devs = np.array(jax.devices())
        return Mesh(devs, ("edge",))

    @pytest.mark.slow
    def test_sharded_loss_and_grads_match(self):
        import jax
        out, poses, depths, focal = make_synthetic_scene(n_imgs=6)
        ref = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                             verbose=False, edge_chunk=0)
        shd = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                             verbose=False, mesh=self._mesh())
        # 6 images over 8 devices -> image axis padded to 8, 1 per shard
        K, nc, G = shd._n_img_groups
        assert (K, nc) == (1, 8)
        assert shd.consts["group_pred_i"].sharding.num_devices == 8
        params = dict(ref.params)
        l_ref, g_ref = jax.value_and_grad(ref.loss_fn)(params,
                                                       dict(ref.consts))
        l_shd, g_shd = jax.value_and_grad(shd.loss_fn)(params,
                                                       dict(shd.consts))
        np.testing.assert_allclose(float(l_ref), float(l_shd), rtol=1e-6)
        for k in g_ref:
            np.testing.assert_allclose(np.asarray(g_ref[k]),
                                       np.asarray(g_shd[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)

    def test_sharded_int8_obs_matches_single_device(self):
        """int8 observation storage must compose with the mesh path: the
        per-slot scales shard alongside their slots (same image-axis
        specs), so sharded loss/grads must equal the single-device int8
        path exactly (identical host-side quantization; padded rows
        carry zero weights)."""
        import jax
        out, *_ = make_synthetic_scene(n_imgs=6)
        ref = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                             verbose=False, edge_chunk=0, obs_dtype="int8")
        shd = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                             verbose=False, mesh=self._mesh(),
                             obs_dtype="int8")
        assert shd.consts["group_pred_i_scale"].sharding.num_devices == 8
        params = dict(ref.params)
        l_ref, g_ref = jax.value_and_grad(ref.loss_fn)(params,
                                                       dict(ref.consts))
        l_shd, g_shd = jax.value_and_grad(shd.loss_fn)(params,
                                                       dict(shd.consts))
        np.testing.assert_allclose(float(l_ref), float(l_shd), rtol=1e-6)
        for k in g_ref:
            np.testing.assert_allclose(np.asarray(g_ref[k]),
                                       np.asarray(g_shd[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)

    @pytest.mark.slow
    def test_sharded_alignment_recovers(self):
        scene = global_aligner(out := make_synthetic_scene(n_imgs=6)[0],
                               mode=GlobalAlignerMode.PointCloudOptimizer,
                               verbose=False, mesh=self._mesh())
        loss = scene.compute_global_alignment(init="mst", niter=150,
                                              schedule="cosine", lr=0.01)
        assert np.isfinite(loss)
        focals = np.asarray(scene.get_focals()).reshape(-1)
        np.testing.assert_allclose(focals, 40.0, rtol=0.05)

    @pytest.mark.slow
    def test_sharded_split_rows_match(self):
        import jax
        # split-row layout (group_cap) under the mesh: rows shard, the
        # world points replicate, XLA inserts the take/scatter psum
        out, *_ = make_synthetic_scene(n_imgs=6)
        ref = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                             verbose=False, edge_chunk=0)
        shd = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                             verbose=False, group_cap=2, mesh=self._mesh())
        assert "group_img_i" in shd.consts
        params = dict(ref.params)
        l_ref, g_ref = jax.value_and_grad(ref.loss_fn)(params,
                                                       dict(ref.consts))
        l_shd, g_shd = jax.value_and_grad(shd.loss_fn)(params,
                                                       dict(shd.consts))
        np.testing.assert_allclose(float(l_ref), float(l_shd), rtol=1e-6)
        for k in g_ref:
            np.testing.assert_allclose(np.asarray(g_ref[k]),
                                       np.asarray(g_shd[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)


class TestCompileSharing:
    def test_same_shape_scenes_share_one_program(self):
        """The scanned Adam segment is jitted on (module-level pts3d_fn,
        hashable AlignerSpec) + array shapes - a second scene with the
        same shapes must NOT trigger a new compile (VERDICT r2 weak #6:
        per-instance loss closures recompiled every scene)."""
        from dust3r_tpu.cloud_opt.commons import make_lr_schedule
        from dust3r_tpu.cloud_opt.optimizer import (_alignment_segment,
                                                    _run_alignment)

        lrs = make_lr_schedule("cosine", 4, 0.01, 1e-6)
        scenes = []
        for seed in (0, 1):
            out = make_synthetic_scene(n_imgs=3, seed=seed)[0]
            scenes.append(global_aligner(
                out, mode=GlobalAlignerMode.PointCloudOptimizer,
                verbose=False))
        _run_alignment(scenes[0].pts3d_fn, scenes[0].loss_spec,
                       dict(scenes[0].params), dict(scenes[0].masks),
                       lrs, dict(scenes[0].consts))
        n_compiled = _alignment_segment._cache_size()
        _run_alignment(scenes[1].pts3d_fn, scenes[1].loss_spec,
                       dict(scenes[1].params), dict(scenes[1].masks),
                       lrs, dict(scenes[1].consts))
        assert _alignment_segment._cache_size() == n_compiled
