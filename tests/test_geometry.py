import numpy as np
import jax.numpy as jnp
import pytest

from dust3r_tpu.utils.geometry import (
    xy_grid, geotrf, inv, closed_form_pose_inverse, depthmap_to_pts3d,
    depthmap_to_camera_coordinates, depthmap_to_absolute_camera_coordinates,
    masked_mean, masked_median, masked_quantile, normalize_pointcloud,
    get_joint_pointcloud_depth, get_joint_pointcloud_center_scale,
    find_reciprocal_matches, colmap_to_opencv_intrinsics,
    opencv_to_colmap_intrinsics,
)
from dust3r_tpu.utils.pose import (
    quat_to_rotmat, rotmat_to_quat, quat_normalize, signed_expm1,
    signed_log1p, pose_vec_to_matrix, matrix_to_pose_vec,
    rigid_points_registration, sRT_to_4x4,
)
from dust3r_tpu.post_process import estimate_focal_knowing_depth


def rand_rotmat(rng):
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


class TestGrid:
    def test_xy_grid(self):
        g = np.asarray(xy_grid(4, 3))
        assert g.shape == (3, 4, 2)
        assert g[1, 2, 0] == 2 and g[1, 2, 1] == 1

    def test_xy_grid_origin_homogeneous(self):
        g = np.asarray(xy_grid(2, 2, origin=(5, 7), homogeneous=True))
        assert g.shape == (2, 2, 3)
        assert g[0, 0, 0] == 5 and g[0, 0, 1] == 7 and g[0, 0, 2] == 1


class TestGeotrf:
    def test_rigid_4x4_on_points(self):
        rng = np.random.default_rng(0)
        R = rand_rotmat(rng)
        t = rng.standard_normal(3)
        T = np.eye(4)
        T[:3, :3], T[:3, 3] = R, t
        pts = rng.standard_normal((10, 3))
        out = np.asarray(geotrf(T, pts))
        np.testing.assert_allclose(out, pts @ R.T + t, rtol=1e-5, atol=1e-5)

    def test_batched(self):
        rng = np.random.default_rng(1)
        T = np.tile(np.eye(4), (2, 1, 1))
        T[:, :3, 3] = rng.standard_normal((2, 3))
        pts = rng.standard_normal((2, 4, 5, 3))
        out = np.asarray(geotrf(T, pts))
        expected = pts + T[:, None, None, :3, 3]
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)

    def test_projection_norm(self):
        K = np.array([[100.0, 0, 8], [0, 100.0, 6], [0, 0, 1]])
        pts = np.array([[1.0, 2.0, 4.0]])
        uv = np.asarray(geotrf(K, pts, norm=1, ncol=2))
        np.testing.assert_allclose(uv, [[100 * 1 / 4 + 8, 100 * 2 / 4 + 6]],
                                   rtol=1e-5)

    def test_3x3_on_2d_homogeneous_lift(self):
        # 2D points with a 3x3 affine: rotate+translate in homogeneous coords
        T = np.array([[0.0, -1, 2], [1, 0, 3], [0, 0, 1]])
        pts = np.array([[1.0, 0.0]])
        out = np.asarray(geotrf(T, pts))
        np.testing.assert_allclose(out, [[2.0, 4.0]], atol=1e-6)


class TestInv:
    def test_closed_form_matches_linalg(self):
        rng = np.random.default_rng(2)
        T = np.tile(np.eye(4), (3, 1, 1))
        for i in range(3):
            T[i, :3, :3] = rand_rotmat(rng)
            T[i, :3, 3] = rng.standard_normal(3)
        np.testing.assert_allclose(np.asarray(closed_form_pose_inverse(T)),
                                   np.linalg.inv(T), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(inv(T)), np.linalg.inv(T),
                                   rtol=1e-4, atol=1e-4)


class TestDepthToPts:
    def test_roundtrip_with_K(self):
        rng = np.random.default_rng(3)
        H, W = 12, 16
        depth = rng.uniform(1, 5, (H, W)).astype(np.float32)
        K = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]], np.float32)
        pts, valid = depthmap_to_camera_coordinates(depth, K)
        pts = np.asarray(pts)
        assert np.asarray(valid).all()
        # reproject
        uv = pts[..., :2] / pts[..., 2:3] * 50.0 + np.array([W / 2, H / 2])
        g = np.asarray(xy_grid(W, H))
        np.testing.assert_allclose(uv, g, atol=1e-4)

    def test_absolute_coords_pose(self):
        rng = np.random.default_rng(4)
        H, W = 6, 8
        depth = rng.uniform(1, 5, (H, W)).astype(np.float32)
        K = np.array([[20.0, 0, 4], [0, 20.0, 3], [0, 0, 1]], np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = rand_rotmat(rng)
        T[:3, 3] = [1, 2, 3]
        Xw, _ = depthmap_to_absolute_camera_coordinates(depth, K, T)
        Xc, _ = depthmap_to_camera_coordinates(depth, K)
        np.testing.assert_allclose(
            np.asarray(Xw), np.asarray(geotrf(T, Xc)), rtol=1e-4, atol=1e-4)

    def test_pseudo_focal(self):
        depth = np.ones((1, 4, 6), np.float32) * 2
        focal = np.full((1, 4, 6), 10.0, np.float32)
        pts = np.asarray(depthmap_to_pts3d(depth, focal))
        assert pts.shape == (1, 4, 6, 3)
        # center pixel ~ (0,0, depth)
        np.testing.assert_allclose(pts[0, :, :, 2], 2.0)


class TestMaskedStats:
    def test_masked_median_odd_even(self):
        x = jnp.array([[1.0, 5.0, 3.0, 100.0],
                       [2.0, 4.0, 6.0, 8.0]])
        mask = jnp.array([[True, True, True, False],
                          [True, True, True, True]])
        med = np.asarray(masked_median(x, mask, axis=-1))
        assert med[0] == 3.0  # odd count
        assert med[1] == 4.0  # even count -> lower middle (torch convention)

    def test_masked_mean(self):
        x = jnp.array([1.0, 2.0, 3.0, 1000.0])
        m = jnp.array([True, True, True, False])
        assert np.isclose(float(masked_mean(x, m)), 2.0)

    def test_masked_quantile(self):
        x = jnp.arange(10.0)
        m = jnp.ones(10, bool)
        assert np.isclose(float(masked_quantile(x, m, 0.5)), 4.5)
        np.testing.assert_allclose(float(masked_quantile(x, m, 0.25)), 2.25)


class TestNormalizePointcloud:
    def _mk(self, seed=0):
        rng = np.random.default_rng(seed)
        pts1 = rng.uniform(-2, 2, (2, 4, 6, 3)).astype(np.float32)
        pts2 = rng.uniform(-2, 2, (2, 4, 6, 3)).astype(np.float32)
        v1 = rng.uniform(size=(2, 4, 6)) > 0.3
        v2 = rng.uniform(size=(2, 4, 6)) > 0.3
        return pts1, pts2, v1, v2

    def test_avg_dis(self):
        pts1, pts2, v1, v2 = self._mk()
        n1, n2, f = normalize_pointcloud(pts1, pts2, "avg_dis", v1, v2,
                                         ret_factor=True)
        # check the factor equals masked mean distance
        d1 = np.linalg.norm(pts1, axis=-1)[v1]
        d2 = np.linalg.norm(pts2, axis=-1)[v2]
        # per-batch factor
        for b in range(2):
            db = np.concatenate([np.linalg.norm(pts1[b], axis=-1)[v1[b]],
                                 np.linalg.norm(pts2[b], axis=-1)[v2[b]]])
            np.testing.assert_allclose(float(np.asarray(f).ravel()[b]),
                                       db.mean(), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(n1),
                                   pts1 / np.asarray(f).reshape(2, 1, 1, 1),
                                   rtol=1e-5)

    def test_median_dis(self):
        pts1, pts2, v1, v2 = self._mk(1)
        n1, n2, f = normalize_pointcloud(pts1, pts2, "median_dis", v1, v2,
                                         ret_factor=True)
        assert np.asarray(f).shape == (2, 1, 1, 1)
        assert np.all(np.asarray(f) > 0)

    def test_joint_depth_and_center_scale(self):
        pts1, pts2, v1, v2 = self._mk(2)
        z = get_joint_pointcloud_depth(pts1[..., 2], pts2[..., 2], v1, v2)
        assert np.asarray(z).shape == (2,)
        c, s = get_joint_pointcloud_center_scale(pts1, pts2, v1, v2)
        assert np.asarray(c).shape == (2, 1, 1, 3)
        assert np.asarray(s).shape == (2, 1, 1, 1)

    def test_joint_stats_are_stop_gradiented(self):
        """Reference marks both joint-stat helpers @torch.no_grad(): the
        shift/scale must act as constants for Regr3D_*Inv training grads."""
        import jax

        pts1, pts2, v1, v2 = self._mk(3)

        g = jax.grad(lambda p: float(0) + jnp.sum(
            get_joint_pointcloud_depth(p[..., 2], pts2[..., 2], v1, v2)))(
            jnp.asarray(pts1))
        assert float(jnp.abs(g).max()) == 0.0

        def cs(p):
            c, s = get_joint_pointcloud_center_scale(p, pts2, v1, v2)
            return jnp.sum(c) + jnp.sum(s)

        g2 = jax.grad(cs)(jnp.asarray(pts1))
        assert float(jnp.abs(g2).max()) == 0.0


class TestQuat:
    def test_roundtrip(self):
        rng = np.random.default_rng(5)
        for _ in range(20):
            R = rand_rotmat(rng)
            q = np.asarray(rotmat_to_quat(R))
            R2 = np.asarray(quat_to_rotmat(q))
            np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_signed_maps_inverse(self):
        x = jnp.array([-3.0, -0.5, 0.0, 0.5, 3.0])
        np.testing.assert_allclose(np.asarray(signed_expm1(signed_log1p(x))),
                                   np.asarray(x), atol=1e-6)

    def test_pose_vec_roundtrip(self):
        rng = np.random.default_rng(6)
        R = rand_rotmat(rng)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = rng.standard_normal(3)
        vec = matrix_to_pose_vec(T)
        M = np.asarray(pose_vec_to_matrix(vec))
        np.testing.assert_allclose(M, T, atol=1e-5)

    def test_pose_vec_with_scale(self):
        rng = np.random.default_rng(7)
        R = rand_rotmat(rng)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = rng.standard_normal(3) * 2
        vec = np.asarray(matrix_to_pose_vec(T, scale=0.7))
        assert vec.shape == (8,)
        assert np.isclose(vec[-1], np.log(0.7), atol=1e-6)
        # reconstruct: pose_vec_to_matrix ignores scale slot; translation was
        # divided by scale
        M = np.asarray(pose_vec_to_matrix(vec[:7]))
        np.testing.assert_allclose(M[:3, 3], T[:3, 3] / 0.7, atol=1e-5)


class TestUmeyama:
    def test_exact_recovery(self):
        rng = np.random.default_rng(8)
        R = rand_rotmat(rng)
        s_true, T_true = 1.7, rng.standard_normal(3)
        pts1 = rng.standard_normal((50, 3))
        pts2 = s_true * pts1 @ R.T + T_true
        s, R_est, T_est = rigid_points_registration(pts1, pts2)
        np.testing.assert_allclose(float(s), s_true, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-5)
        np.testing.assert_allclose(np.asarray(T_est), T_true, atol=1e-4)

    def test_weighted_ignores_outliers(self):
        rng = np.random.default_rng(9)
        R = rand_rotmat(rng)
        pts1 = rng.standard_normal((40, 3))
        pts2 = 2.0 * pts1 @ R.T + 1.0
        pts2_noisy = pts2.copy()
        pts2_noisy[:5] += 100  # corrupted
        w = np.ones(40)
        w[:5] = 0
        s, R_est, T_est = rigid_points_registration(pts1, pts2_noisy, weights=w)
        np.testing.assert_allclose(float(s), 2.0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-5)

    def test_srt_to_4x4(self):
        M = np.asarray(sRT_to_4x4(2.0, np.eye(3), np.array([1.0, 2, 3])))
        np.testing.assert_allclose(M[:3, :3], 2 * np.eye(3))
        np.testing.assert_allclose(M[:3, 3], [1, 2, 3])


class TestFocal:
    def _synthetic_pointmap(self, focal, H, W, seed=0):
        rng = np.random.default_rng(seed)
        depth = rng.uniform(2, 6, (1, H, W)).astype(np.float32)
        pp = np.array([[W / 2, H / 2]], np.float32)
        grid = np.asarray(xy_grid(W, H))
        x = (grid[..., 0] - pp[0, 0]) * depth[0] / focal
        y = (grid[..., 1] - pp[0, 1]) * depth[0] / focal
        pts = np.stack([x, y, depth[0]], axis=-1)[None]
        return pts.astype(np.float32), pp

    def test_weiszfeld_recovers_focal(self):
        pts, pp = self._synthetic_pointmap(250.0, 24, 32)
        f = float(estimate_focal_knowing_depth(pts, pp, "weiszfeld")[0])
        assert abs(f - 250) / 250 < 1e-3

    def test_median_recovers_focal(self):
        pts, pp = self._synthetic_pointmap(120.0, 16, 20, seed=1)
        f = float(estimate_focal_knowing_depth(pts, pp, "median")[0])
        assert abs(f - 120) / 120 < 1e-2


class TestHostHelpers:
    def test_reciprocal_matches(self):
        rng = np.random.default_rng(10)
        P1 = rng.standard_normal((30, 3))
        perm = rng.permutation(30)
        P2 = P1[perm] + 1e-4
        recip, nn2_in_P1, n = find_reciprocal_matches(P1, P2)
        assert n == 30
        np.testing.assert_array_equal(nn2_in_P1, perm)

    def test_intrinsics_conventions(self):
        K = np.array([[10.0, 0, 5], [0, 10.0, 4], [0, 0, 1]])
        K2 = opencv_to_colmap_intrinsics(colmap_to_opencv_intrinsics(K))
        np.testing.assert_allclose(K2, K)
