"""Third-party convention cross-checks for quaternion/registration math.

The existing pose tests are round trips (self-consistent: a systematic
xyzw-vs-wxyz or sign confusion would round-trip cleanly). The reference
uses roma (`roma.unitquat_to_rotmat`, xyzw convention;
`roma.rigid_points_registration` — reference cloud_opt/base_opt.py:157,
init_im_poses.py:308-316); scipy's `Rotation` uses the same xyzw
convention, so exact agreement with scipy pins our conventions against an
independent implementation.
"""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from dust3r_tpu.utils.pose import (quat_to_rotmat, rotmat_to_quat,
                                   rigid_points_registration)


class TestQuatVsScipy:
    def test_quat_to_rotmat_matches_scipy(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(32, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        ours = np.asarray(quat_to_rotmat(q.astype(np.float32)))
        theirs = Rotation.from_quat(q).as_matrix()  # scipy: xyzw
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_rotmat_to_quat_matches_scipy(self):
        rng = np.random.default_rng(1)
        R = Rotation.random(32, rng).as_matrix()
        ours = np.asarray(rotmat_to_quat(R.astype(np.float64)))
        theirs = Rotation.from_matrix(R).as_quat()
        # quaternion double cover: q and -q encode the same rotation
        sign = np.sign(np.sum(ours * theirs, axis=-1, keepdims=True))
        np.testing.assert_allclose(ours * sign, theirs, atol=1e-6)

    def test_near_pi_rotations(self):
        """180-degree rotations stress the w~0 extraction branch."""
        axes = np.eye(3)
        for ax in axes:
            R = Rotation.from_rotvec(np.pi * ax).as_matrix()
            q = np.asarray(rotmat_to_quat(R))
            R2 = Rotation.from_quat(q).as_matrix()
            np.testing.assert_allclose(R2, R, atol=1e-6)


class TestRegistrationVsScipy:
    def test_rotation_matches_weighted_kabsch(self):
        """Our weighted Umeyama's rotation against scipy align_vectors
        (weighted Kabsch) on centered points; scale/translation against
        the closed form."""
        rng = np.random.default_rng(2)
        pts1 = rng.normal(size=(60, 3))
        R_gt = Rotation.random(1, rng).as_matrix()[0]
        s_gt, T_gt = 1.7, np.array([0.3, -1.2, 2.0])
        pts2 = s_gt * pts1 @ R_gt.T + T_gt + 0.01 * rng.normal(size=(60, 3))
        w = rng.uniform(0.1, 1.0, 60)

        s, R, T = (np.asarray(v) for v in
                   rigid_points_registration(pts1.astype(np.float32),
                                             pts2.astype(np.float32),
                                             weights=w.astype(np.float32)))

        wn = w / w.sum()
        mu1, mu2 = wn @ pts1, wn @ pts2
        R_scipy, _ = Rotation.align_vectors(pts2 - mu2, pts1 - mu1,
                                            weights=w)
        np.testing.assert_allclose(R, R_scipy.as_matrix(), atol=1e-4)
        assert s == pytest.approx(s_gt, rel=0.02)
        np.testing.assert_allclose(T, T_gt, atol=0.05)
        # the registration actually aligns: weighted RMSE tiny vs spread
        res = s * pts1 @ R.T + T - pts2
        assert np.sqrt((wn * (res ** 2).sum(-1)).sum()) < 0.02

    def test_reflection_guard(self):
        """Degenerate correspondences must still return a proper rotation
        (det +1), the Umeyama D-matrix correction."""
        pts1 = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1.0],
                         [-1, 0, 0], [0, -1, 0], [0, 0, -1.0]])
        pts2 = pts1 * np.array([1, 1, -1.0])  # a reflection, not a rotation
        s, R, T = (np.asarray(v) for v in
                   rigid_points_registration(pts1.astype(np.float32),
                                             pts2.astype(np.float32)))
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-5)
