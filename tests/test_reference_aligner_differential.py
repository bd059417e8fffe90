"""Executed-reference differential tests for the GLOBAL ALIGNER.

The reference's cloud_opt package (base_opt + optimizer + pair_viewer +
init_im_poses) runs from the read-only mount once two absent deps are
stubbed:

  - torchvision: the 2-op ToTensor+Normalize stub from
    test_reference_differential (only used by dust3r.utils.image).
  - roma: a minimal stub implementing exactly the four symbols the
    reference uses (RigidUnitQuat, rotmat_to_unitquat,
    rigid_points_registration, rotmat_geodesic_distance) with standard
    xyzw-Hamilton quaternion math and the weighted Umeyama closed form.
    The stub is itself validated against scipy in TestRomaStub, so the
    oracle is not contaminated by a wrong stub: on the clean synthetic
    scenes used here every registration has an exact unique solution.

The core test injects ONE random raw state (pw_poses, im_poses, log
depthmaps, log focals, pp) into BOTH aligners — the parameter layouts
match 1:1 by design — and requires the loss and every accessor to agree.
That differentially pins the whole aligner math: sim(3) pose
parametrization (quat order!), signed-log translations, pairwise scale
normalization, conf-weighted li/lj loss, depth back-projection.

Evidence class [E] in docs/CONVENTION_AUDIT.md.
"""
import os
import sys
import types

import numpy as np
import pytest

from test_reference_differential import REF, _install_torchvision_stub

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "dust3r")),
    reason="reference mount unavailable")]

torch = pytest.importorskip("torch")


# --------------------------------------------------------------------- #
# roma stub (validated in TestRomaStub below)
# --------------------------------------------------------------------- #

def _unitquat_to_rotmat(q):
    """xyzw unit quaternion -> rotation matrix (differentiable torch)."""
    x, y, z, w = q.unbind(-1)
    tx, ty, tz = 2 * x, 2 * y, 2 * z
    xx, yy, zz = tx * x, ty * y, tz * z
    xy, xz, yz = tx * y, tx * z, ty * z
    wx, wy, wz = tx * w, ty * w, tz * w
    r0 = torch.stack((1 - (yy + zz), xy - wz, xz + wy), -1)
    r1 = torch.stack((xy + wz, 1 - (xx + zz), yz - wx), -1)
    r2 = torch.stack((xz - wy, yz + wx, 1 - (xx + yy)), -1)
    return torch.stack((r0, r1, r2), -2)


def _install_roma_stub():
    if "roma" in sys.modules:
        return
    roma = types.ModuleType("roma")

    class RigidUnitQuat:
        def __init__(self, linear, translation):
            self.linear, self.translation = linear, translation

        def normalize(self):
            q = self.linear / self.linear.norm(dim=-1, keepdim=True)
            return RigidUnitQuat(q, self.translation)

        def to_homogeneous(self):
            R = _unitquat_to_rotmat(self.linear)
            shp = self.linear.shape[:-1]
            H = torch.zeros(shp + (4, 4), dtype=R.dtype, device=R.device)
            H[..., :3, :3] = R
            H[..., :3, 3] = self.translation
            H[..., 3, 3] = 1
            return H

    def rotmat_to_unitquat(R):
        from scipy.spatial.transform import Rotation
        arr = np.asarray(R.detach().cpu(), dtype=np.float64)
        single = arr.ndim == 2
        q = Rotation.from_matrix(arr.reshape(-1, 3, 3)).as_quat()  # xyzw
        out = torch.as_tensor(q, dtype=R.dtype if torch.is_tensor(R)
                              else torch.float32)
        return out[0] if single else out.reshape(arr.shape[:-2] + (4,))

    def rigid_points_registration(x, y, weights=None, compute_scaling=False):
        """(R, t[, s]) minimizing sum_i w_i ||y_i - (s R x_i + t)||^2
        (weighted Umeyama closed form)."""
        x = torch.as_tensor(x).reshape(-1, 3).double()
        y = torch.as_tensor(y).reshape(-1, 3).double()
        w = (torch.ones(len(x), dtype=torch.float64) if weights is None
             else torch.as_tensor(weights).reshape(-1).double())
        W = w.sum()
        mx = (w[:, None] * x).sum(0) / W
        my = (w[:, None] * y).sum(0) / W
        X, Y = x - mx, y - my
        C = (w[:, None] * Y).T @ X / W
        U, S, Vt = torch.linalg.svd(C)
        d = float(torch.sign(torch.det(U @ Vt)))
        D = torch.tensor([1.0, 1.0, d], dtype=torch.float64)
        R = U @ torch.diag(D) @ Vt
        if compute_scaling:
            var_x = (w * (X * X).sum(-1)).sum() / W
            s = (S * D).sum() / var_x
            t = my - s * (R @ mx)
            return R.float(), t.float(), s.float()
        t = my - R @ mx
        return R.float(), t.float()

    def rotmat_geodesic_distance(R1, R2):
        cos = ((R1 @ R2.transpose(-1, -2)).diagonal(dim1=-2, dim2=-1)
               .sum(-1) - 1) / 2
        return torch.acos(cos.clamp(-1, 1))

    roma.RigidUnitQuat = RigidUnitQuat
    roma.rotmat_to_unitquat = rotmat_to_unitquat
    roma.unitquat_to_rotmat = _unitquat_to_rotmat
    roma.rigid_points_registration = rigid_points_registration
    roma.rotmat_geodesic_distance = rotmat_geodesic_distance
    sys.modules["roma"] = roma


class TestRomaStub:
    """The stub must be right for the oracle to mean anything."""

    def test_quat_to_rotmat_matches_scipy(self):
        from scipy.spatial.transform import Rotation
        rng = np.random.RandomState(0)
        q = rng.randn(16, 4)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        ours = _unitquat_to_rotmat(torch.from_numpy(q)).numpy()
        theirs = Rotation.from_quat(q).as_matrix()  # scipy is xyzw too
        np.testing.assert_allclose(ours, theirs, atol=1e-12)

    def test_rotmat_quat_roundtrip(self):
        _install_roma_stub()
        roma = sys.modules["roma"]
        from scipy.spatial.transform import Rotation
        R = torch.from_numpy(
            Rotation.random(8, random_state=1).as_matrix()).float()
        q = roma.rotmat_to_unitquat(R)
        R2 = _unitquat_to_rotmat(q)
        np.testing.assert_allclose(R2.numpy(), R.numpy(), atol=1e-6)

    def test_registration_recovers_exact_srt(self):
        _install_roma_stub()
        roma = sys.modules["roma"]
        from scipy.spatial.transform import Rotation
        rng = np.random.RandomState(2)
        R0 = Rotation.random(random_state=3).as_matrix()
        t0 = np.array([0.3, -1.2, 2.0])
        s0 = 1.7
        x = rng.randn(100, 3)
        y = s0 * x @ R0.T + t0
        w = rng.uniform(0.5, 2, 100)
        R, T, s = roma.rigid_points_registration(
            torch.from_numpy(x).float(), torch.from_numpy(y).float(),
            weights=torch.from_numpy(w).float(), compute_scaling=True)
        np.testing.assert_allclose(R.numpy(), R0, atol=1e-5)
        np.testing.assert_allclose(T.numpy(), t0, atol=1e-5)
        assert np.isclose(float(s), s0, rtol=1e-6)


# --------------------------------------------------------------------- #
# reference cloud_opt import + scene builders
# --------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def refco():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _install_torchvision_stub()
    _install_roma_stub()
    import dust3r.cloud_opt as refco
    import dust3r.cloud_opt.init_im_poses as ref_init
    return types.SimpleNamespace(co=refco, init=ref_init)


def _torch_output(out_np):
    """Our synthetic-scene dict -> the torch layout the reference expects
    (img as (E, 3, H, W) tensors, idx as lists)."""
    E, H, W, _ = out_np["pred1"]["pts3d"].shape
    view1 = dict(idx=list(out_np["view1"]["idx"]),
                 img=torch.zeros((E, 3, H, W)))
    view2 = dict(idx=list(out_np["view2"]["idx"]),
                 img=torch.zeros((E, 3, H, W)))
    pred1 = dict(pts3d=torch.from_numpy(out_np["pred1"]["pts3d"].copy()),
                 conf=torch.from_numpy(out_np["pred1"]["conf"].copy()))
    pred2 = dict(
        pts3d_in_other_view=torch.from_numpy(
            out_np["pred2"]["pts3d_in_other_view"].copy()),
        conf=torch.from_numpy(out_np["pred2"]["conf"].copy()))
    return dict(view1=view1, view2=view2, pred1=pred1, pred2=pred2)


def _build_scenes(refco, n_imgs=4, seed=0, obs_dtype="float32"):
    """Differential scenes default to fp32 observation storage: the
    reference stores fp32, and our bf16 default carries a documented
    ~4e-3 quantization floor (test_cloud_opt.py TestBf16ObsAccuracyDelta)
    that would swamp sub-1e-3 loss comparisons. The bf16 default's floor
    gets its own check (TestBf16DefaultFloor)."""
    import jax.numpy as jnp

    from test_cloud_opt import make_synthetic_scene

    from dust3r_tpu.cloud_opt import GlobalAlignerMode, global_aligner
    out_np, poses, depths, focal = make_synthetic_scene(n_imgs=n_imgs,
                                                        seed=seed)
    ref_scene = refco.co.global_aligner(
        _torch_output(out_np), device="cpu",
        mode=refco.co.GlobalAlignerMode.PointCloudOptimizer, verbose=False)
    our_scene = global_aligner(out_np,
                               mode=GlobalAlignerMode.PointCloudOptimizer,
                               verbose=False,
                               obs_dtype=jnp.dtype(obs_dtype))
    return ref_scene, our_scene, poses, depths, focal


def _random_state(scene_shape, seed=7):
    """One random raw parameter state shared by both aligners."""
    n, E, A = scene_shape
    rng = np.random.RandomState(seed)
    pw = rng.randn(E, 8).astype(np.float32) * 0.4
    pw[:, :4] += np.array([0.1, -0.2, 0.15, 1.0], np.float32)  # sane quats
    imp = rng.randn(n, 7).astype(np.float32) * 0.4
    imp[:, :4] += np.array([0.2, 0.1, -0.1, 1.0], np.float32)
    logd = np.log(rng.uniform(1.0, 4.0, (n, A))).astype(np.float32)
    logf = (20 * np.log(rng.uniform(30, 60, (n, 1)))).astype(np.float32)
    pp = (rng.randn(n, 2) * 0.2).astype(np.float32)
    return pw, imp, logd, logf, pp


def _inject_state(ref_scene, our_scene, state):
    import jax.numpy as jnp
    pw, imp, logd, logf, pp = state
    with torch.no_grad():
        ref_scene.pw_poses.data[:] = torch.from_numpy(pw)
        ref_scene.im_poses.data[:] = torch.from_numpy(imp)
        ref_scene.im_depthmaps.data[:] = torch.from_numpy(logd)
        ref_scene.im_focals.data[:] = torch.from_numpy(logf)
        ref_scene.im_pp.data[:] = torch.from_numpy(pp)
    our_scene.params["pw_poses"] = jnp.asarray(pw)
    our_scene.params["im_poses"] = jnp.asarray(imp)
    our_scene.params["im_depthmaps"] = jnp.asarray(logd)
    our_scene.params["im_focals"] = jnp.asarray(logf)
    our_scene.params["im_pp"] = jnp.asarray(pp)


def _np(x):
    if torch.is_tensor(x):
        return x.detach().cpu().numpy()
    if isinstance(x, (list, tuple)):
        return np.stack([_np(v) for v in x])
    return np.asarray(x)


def _rel_angle_deg(R1, R2):
    cos = (np.trace(R1.T @ R2) - 1) / 2
    return np.degrees(np.arccos(np.clip(cos, -1, 1)))


# --------------------------------------------------------------------- #
# the differentials
# --------------------------------------------------------------------- #

class TestAlignerForwardEquality:
    def test_loss_and_accessors_at_injected_state(self, refco):
        ref_scene, our_scene, *_ = _build_scenes(refco)
        n, E = our_scene.n_imgs, our_scene.n_edges
        A = our_scene.max_area
        state = _random_state((n, E, A))
        _inject_state(ref_scene, our_scene, state)

        # every accessor must agree at the same raw state
        np.testing.assert_allclose(_np(our_scene.get_pw_poses()),
                                   _np(ref_scene.get_pw_poses()),
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(_np(our_scene.get_im_poses()),
                                   _np(ref_scene.get_im_poses()),
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(
            _np(our_scene.get_focals()).reshape(-1),
            _np(ref_scene.get_focals()).reshape(-1), rtol=1e-5)
        np.testing.assert_allclose(_np(our_scene.get_principal_points()),
                                   _np(ref_scene.get_principal_points()),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(_np(our_scene.get_depthmaps()),
                                   _np(ref_scene.get_depthmaps()),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(_np(our_scene.get_pts3d()),
                                   _np(ref_scene.get_pts3d()),
                                   rtol=5e-4, atol=2e-4)

        # ... and so must the loss (the optimization objective itself)
        loss_ref = float(ref_scene())
        loss_ours = float(our_scene.forward())
        assert np.isclose(loss_ours, loss_ref, rtol=5e-4), \
            (loss_ours, loss_ref)

    def test_loss_equality_second_state_and_adaptors(self, refco):
        """Different state + norm_pw_scale off, like after a full pose
        preset (reference optimizer.py:80-81)."""
        ref_scene, our_scene, *_ = _build_scenes(refco, seed=5)
        n, E = our_scene.n_imgs, our_scene.n_edges
        state = _random_state((n, E, our_scene.max_area), seed=21)
        _inject_state(ref_scene, our_scene, state)
        ref_scene.norm_pw_scale = False
        our_scene.norm_pw_scale = False
        assert np.isclose(float(our_scene.forward()), float(ref_scene()),
                          rtol=5e-4)


class TestAlignerInitEquality:
    def test_known_poses_init(self, refco):
        ref_scene, our_scene, poses, depths, focal = _build_scenes(refco)
        n = our_scene.n_imgs

        for scene in (ref_scene, our_scene):
            scene.preset_pose([poses[k] for k in range(n)])
            scene.preset_focal([focal] * n)

        refco.init.init_from_known_poses(
            ref_scene, min_conf_thr=ref_scene.min_conf_thr, niter_PnP=10)
        from dust3r_tpu.cloud_opt import init_im_poses as our_init
        our_init.init_from_known_poses(
            our_scene, min_conf_thr=our_scene.min_conf_thr, niter_PnP=10)

        # identical deterministic post-init state on clean data
        np.testing.assert_allclose(_np(our_scene.get_depthmaps()),
                                   _np(ref_scene.get_depthmaps()),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(_np(our_scene.get_pw_poses()),
                                   _np(ref_scene.get_pw_poses()),
                                   rtol=5e-3, atol=5e-3)
        loss_ref = float(ref_scene())
        loss_ours = float(our_scene.forward())
        # both are tiny on a consistent scene (not exactly 0: depths are
        # seeded from the best-conf edge's predictions, which carry the
        # fixture's per-image depth noise). Ours runs the init-time
        # registrations/quat extraction in float64 (utils/pose.py) and
        # lands BELOW the fp32-torch reference (2.3e-6 vs 7.3e-6 here);
        # require the same order of consistency, not bit equality.
        assert loss_ours < 1e-4 and loss_ref < 1e-4, (loss_ours, loss_ref)
        assert loss_ours < 10 * loss_ref + 1e-7, (loss_ours, loss_ref)

    def test_mst_init_agreement(self, refco):
        ref_scene, our_scene, poses, depths, focal = _build_scenes(refco)
        n = our_scene.n_imgs

        refco.init.init_minimum_spanning_tree(ref_scene, niter_PnP=10)
        from dust3r_tpu.cloud_opt import init_im_poses as our_init
        our_init.init_minimum_spanning_tree(our_scene, niter_PnP=10)

        # focals agree with each other and with GT
        f_ref = _np(ref_scene.get_focals()).reshape(-1)
        f_ours = _np(our_scene.get_focals()).reshape(-1)
        np.testing.assert_allclose(f_ours, f_ref, rtol=0.02)
        np.testing.assert_allclose(f_ours, focal, rtol=0.05)

        # relative camera poses agree (gauge-free comparison)
        P_ref = _np(ref_scene.get_im_poses())
        P_ours = _np(our_scene.get_im_poses())
        for k in range(1, n):
            rel_ref = np.linalg.inv(P_ref[0]) @ P_ref[k]
            rel_ours = np.linalg.inv(P_ours[0]) @ P_ours[k]
            assert _rel_angle_deg(rel_ref[:3, :3], rel_ours[:3, :3]) < 1.0
            # translation direction (scale is gauge)
            t1, t2 = rel_ref[:3, 3], rel_ours[:3, 3]
            cos = t1 @ t2 / (np.linalg.norm(t1) * np.linalg.norm(t2) + 1e-9)
            assert cos > 0.999


class TestAlignerOptimizationAgreement:
    def test_both_converge_on_clean_scene(self, refco):
        ref_scene, our_scene, *_ = _build_scenes(refco)
        loss_ref = ref_scene.compute_global_alignment(
            init="mst", niter=100, schedule="cosine", lr=0.01)
        loss_ours = our_scene.compute_global_alignment(
            init="mst", niter=100, schedule="cosine", lr=0.01)
        # different Adam implementations: require comparable convergence,
        # not identical trajectories
        assert loss_ref < 5e-3 and loss_ours < 5e-3, (loss_ref, loss_ours)
        assert loss_ours < 3 * loss_ref + 1e-4, (loss_ref, loss_ours)

    def test_bf16_obs_default_converges_to_documented_floor(self, refco):
        """The bf16 observation-storage DEFAULT (base_opt.py obs_dtype)
        cannot converge below its ~4e-3 quantization floor
        (test_cloud_opt.py TestBf16ObsAccuracyDelta); it must still land
        within a small multiple of that floor on the clean scene — a
        floor-aware bound, separate from the fp32-vs-fp32 differential."""
        _, our_scene, *_ = _build_scenes(refco, obs_dtype="bfloat16")
        loss_ours = our_scene.compute_global_alignment(
            init="mst", niter=100, schedule="cosine", lr=0.01)
        assert 1e-5 < loss_ours < 2e-2, loss_ours


class TestPairViewerAgreement:
    def test_two_view_poses_and_focals(self, refco):
        from test_cloud_opt import make_synthetic_scene

        from dust3r_tpu.cloud_opt import GlobalAlignerMode, global_aligner
        out_np, poses, depths, focal = make_synthetic_scene(n_imgs=2, seed=3)
        ref_pv = refco.co.global_aligner(
            _torch_output(out_np), device="cpu",
            mode=refco.co.GlobalAlignerMode.PairViewer, verbose=False)
        our_pv = global_aligner(out_np, mode=GlobalAlignerMode.PairViewer,
                                verbose=False)

        f_ref = _np(ref_pv.get_focals()).reshape(-1)
        f_ours = _np(our_pv.get_focals()).reshape(-1)
        np.testing.assert_allclose(f_ours, f_ref, rtol=0.02)

        P_ref = _np(ref_pv.get_im_poses())
        P_ours = _np(our_pv.get_im_poses())
        rel_ref = np.linalg.inv(P_ref[0]) @ P_ref[1]
        rel_ours = np.linalg.inv(P_ours[0]) @ P_ours[1]
        assert _rel_angle_deg(rel_ref[:3, :3], rel_ours[:3, :3]) < 1.0
        np.testing.assert_allclose(rel_ours[:3, 3], rel_ref[:3, 3],
                                   rtol=0.05, atol=0.02)
