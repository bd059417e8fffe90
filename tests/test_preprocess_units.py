"""Unit tests for the pure-math cores of the offline preprocess scripts
(SURVEY §2.6). The full scripts need raw dataset downloads and gated deps
(pyrender/tf/habitat-sim), but their coordinate conversions, file-format
codecs and pose interpolation are plain numpy - tested here against
closed forms and synthetic files."""
import math
import os
import os.path as osp
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


class TestCo3dConversions:
    def test_ndc_to_pinhole(self):
        from datasets_preprocess.preprocess_co3d import convert_ndc_to_pinhole

        H, W = 480, 640
        K = convert_ndc_to_pinhole([2.0, 2.5], [0.0, 0.0], (H, W))
        # rescale = min(W/2, H/2) = 240; centered pp
        assert K[0, 0] == pytest.approx(2.0 * 240)
        assert K[1, 1] == pytest.approx(2.5 * 240)
        assert K[0, 2] == pytest.approx(W / 2)
        assert K[1, 2] == pytest.approx(H / 2)
        assert K[2, 2] == 1.0

    def test_opencv_from_cameras_projection(self):
        from datasets_preprocess.preprocess_co3d import (
            opencv_from_cameras_projection)

        H, W = 480, 640
        R_out, T_cv, K = opencv_from_cameras_projection(
            np.eye(3), np.float32([1, 2, 3]), np.float32([2.0, 2.0]),
            np.float32([0.1, -0.2]), (H, W))
        # pytorch3d +X left/+Y up -> OpenCV +X right/+Y down: x,y negated
        np.testing.assert_allclose(T_cv, [-1, -2, 3])
        np.testing.assert_allclose(R_out, np.diag([-1, -1, 1]))
        assert np.allclose(R_out @ R_out.T, np.eye(3))
        # NDC pp flips sign around the pixel center
        assert K[0, 2] == pytest.approx(W / 2 - 0.1 * H / 2)
        assert K[1, 2] == pytest.approx(H / 2 + 0.2 * H / 2)
        assert K[0, 0] == K[1, 1] == pytest.approx(2.0 * H / 2)

    def test_category_list_matches_paper_recipe(self):
        """The 51-category Co3D training corpus, pinned against the
        reference recipe (preprocess_co3d.py:30-42). A silently smaller
        list would shrink the training distribution."""
        from datasets_preprocess.preprocess_co3d import (
            CATEGORIES, SINGLE_SEQUENCE_CATEGORIES)

        assert len(CATEGORIES) == 51
        assert len(set(CATEGORIES)) == 51
        for cat in ("ball", "book", "couch", "frisbee", "hotdog", "kite",
                    "remote", "sandwich", "skateboard", "suitcase"):
            assert cat in CATEGORIES
        assert SINGLE_SEQUENCE_CATEGORIES == sorted(
            set(CATEGORIES) - {"microwave", "stopsign", "tv"})
        # cross-check the full list against the reference mount if present
        ref = "/root/reference/datasets_preprocess/preprocess_co3d.py"
        if osp.exists(ref):
            import ast
            with open(ref) as f:
                tree = ast.parse(f.read())
            ref_cats = None
            for node in ast.walk(tree):
                if isinstance(node, ast.Assign) and any(
                        getattr(t, "id", "") == "CATEGORIES"
                        for t in node.targets):
                    ref_cats = ast.literal_eval(node.value)
                    break
            assert ref_cats is not None
            assert CATEGORIES == ref_cats

    def test_load_16bit_png_depth(self, tmp_path):
        """Co3D pngs hold float16 BIT PATTERNS in uint16 channels."""
        import cv2
        from datasets_preprocess.preprocess_co3d import load_16bit_png_depth

        rng = np.random.default_rng(0)
        depth = rng.uniform(0.5, 8.0, (12, 16)).astype(np.float16)
        p = str(tmp_path / "d.png")
        cv2.imwrite(p, depth.view(np.uint16))
        out = load_16bit_png_depth(p)
        assert out.dtype == np.float32
        np.testing.assert_array_equal(out, depth.astype(np.float32))


class TestBlendedMVS:
    def test_load_pfm_little_endian(self, tmp_path):
        from datasets_preprocess.preprocess_blendedmvs import load_pfm_file

        h, w = 6, 8
        data = np.arange(h * w, dtype="<f4").reshape(h, w)
        p = tmp_path / "d.pfm"
        with open(p, "wb") as f:
            f.write(b"Pf\n")
            f.write(f"{w} {h} \n".encode())
            f.write(b"-1.0\n")
            f.write(data.tobytes())
        out = load_pfm_file(str(p))
        # PFM stores bottom-up: reader flips vertically
        np.testing.assert_array_equal(out, data[::-1])

    def test_load_cam_txt(self, tmp_path):
        from datasets_preprocess.preprocess_blendedmvs import load_cam_txt

        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, 3] = [1, 2, 3]
        K = np.float32([[100, 0, 32], [0, 100, 24], [0, 0, 1]])
        p = tmp_path / "cam.txt"
        with open(p, "w") as f:
            f.write("extrinsic\n")
            for row in w2c:
                f.write(" ".join(map(str, row)) + "\n")
            f.write("\nintrinsic\n")
            for row in K:
                f.write(" ".join(map(str, row)) + "\n")
        K_out, R, t = load_cam_txt(str(p))
        np.testing.assert_allclose(K_out, K)
        np.testing.assert_allclose(R, np.eye(3))
        np.testing.assert_allclose(t, [-1, -2, -3])  # cam2world of pure shift


class TestArkitScenes:
    def test_slerp_endpoints_and_midpoint(self):
        from datasets_preprocess.preprocess_arkitscenes import slerp

        q0 = np.array([0, 0, 0, 1.0])                      # identity (xyzw)
        s, c = math.sin(math.pi / 4), math.cos(math.pi / 4)
        q1 = np.array([0, 0, s, c])                        # 90 deg about z
        np.testing.assert_allclose(slerp(q0, q1, 0.0), q0, atol=1e-12)
        np.testing.assert_allclose(slerp(q0, q1, 1.0), q1, atol=1e-12)
        mid = slerp(q0, q1, 0.5)                           # 45 deg about z
        np.testing.assert_allclose(
            mid, [0, 0, math.sin(math.pi / 8), math.cos(math.pi / 8)],
            atol=1e-9)

    def test_slerp_hemisphere(self):
        from datasets_preprocess.preprocess_arkitscenes import slerp

        q0 = np.array([0, 0, 0, 1.0])
        out = slerp(q0, -q0, 0.5)   # antipodal representation, same rotation
        np.testing.assert_allclose(np.abs(out), [0, 0, 0, 1], atol=1e-9)

    def test_rotvec_to_rotmat(self):
        from datasets_preprocess.preprocess_arkitscenes import rotvec_to_rotmat

        R = rotvec_to_rotmat([0, 0, math.pi / 2])
        np.testing.assert_allclose(
            R, [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-12)

    def test_interpolate_poses(self):
        from datasets_preprocess.preprocess_arkitscenes import (
            interpolate_poses)

        ts = [0.0, 1.0]
        pos = np.array([[0, 0, 0], [2, 0, 0]], np.float64)
        q = np.array([[0, 0, 0, 1], [0, 0, 0, 1]], np.float64)
        poses = interpolate_poses(ts, pos, q, [0.25, 1.0])
        np.testing.assert_allclose(poses[0][:3, 3], [0.5, 0, 0])
        np.testing.assert_allclose(poses[0][:3, :3], np.eye(3), atol=1e-12)
        np.testing.assert_allclose(poses[1][:3, 3], [2, 0, 0])


class TestStaticThings3D:
    def test_read_float3_roundtrip(self, tmp_path):
        from datasets_preprocess.preprocess_staticthings3d import read_float3

        arr = np.arange(2 * 3 * 4, dtype=np.float32)
        p = tmp_path / "x.float3"
        with open(p, "wb") as f:
            f.write(b"float\n3\n4\n3\n2\n")   # dims written innermost-first
            f.write(arr.tobytes())
        out = read_float3(str(p))
        assert out.shape == (2, 3, 4)
        np.testing.assert_array_equal(out.ravel(), arr)


class TestMegaDepth:
    def test_colmap_pose_identity(self):
        from datasets_preprocess.preprocess_megadepth import colmap_pose_to_w2c

        pose = colmap_pose_to_w2c([1, 0, 0, 0, 1, 2, 3])
        np.testing.assert_allclose(pose[:3, :3], np.eye(3), atol=1e-12)
        np.testing.assert_allclose(pose[:3, 3], [1, 2, 3])

    def test_colmap_pose_rotation(self):
        from datasets_preprocess.preprocess_megadepth import colmap_pose_to_w2c

        s, c = math.sin(math.pi / 4), math.cos(math.pi / 4)
        pose = colmap_pose_to_w2c([c, 0, 0, s, 0, 0, 0])  # 90 deg about z
        np.testing.assert_allclose(
            pose[:3, :3], [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-12)


class TestHabitatProjections:
    def test_perspective_project_unproject_roundtrip(self):
        from datasets_preprocess.habitat.projections import (
            PerspectiveProjection, compute_camera_intrinsics)

        H, W = 48, 64
        f, cx, cy = compute_camera_intrinsics(H, W, hfov=90)
        K = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]], np.float64)
        proj = PerspectiveProjection(K, H, W)
        u, v = np.meshgrid(np.arange(W, dtype=np.float64) + 0.5,
                           np.arange(H, dtype=np.float64) + 0.5)
        rays = proj.unproject(u, v)
        u2, v2 = proj.project(rays)
        np.testing.assert_allclose(u2, u, atol=1e-6)
        np.testing.assert_allclose(v2, v, atol=1e-6)

    def test_equirectangular_roundtrip(self):
        from datasets_preprocess.habitat.projections import (
            EquirectangularProjection)

        H, W = 32, 64
        proj = EquirectangularProjection(H, W)
        u, v = np.meshgrid(np.arange(1, W - 1, dtype=np.float64) + 0.5,
                           np.arange(1, H - 1, dtype=np.float64) + 0.5)
        rays = proj.unproject(u, v)
        n = np.linalg.norm(np.asarray(rays), axis=0 if
                           isinstance(rays, tuple) else -1)
        u2, v2 = proj.project(rays)
        np.testing.assert_allclose(u2, u, atol=1e-6)
        np.testing.assert_allclose(v2, v, atol=1e-6)
