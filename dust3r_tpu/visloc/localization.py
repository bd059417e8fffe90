"""RANSAC-PnP backends for visual localization.

Behavioral contract: /root/reference/dust3r_visloc/localization.py:30-140.
cv2 SQPnP is the always-available backend; poselib/pycolmap are optional
host deps (gated, as in the reference).
"""
from __future__ import annotations

import numpy as np

from ..utils.geometry import opencv_to_colmap_intrinsics

try:
    import poselib  # noqa: F401
    HAS_POSELIB = True
except Exception:
    HAS_POSELIB = False

try:
    import pycolmap  # noqa: F401
    from packaging import version
    HAS_PYCOLMAP = version.parse(pycolmap.__version__) >= version.parse("0.5.0")
except Exception:
    HAS_PYCOLMAP = False


def run_pnp(pts2D, pts3D, K, distortion=None, mode="cv2",
            reprojectionError=5, img_size=None):
    """Estimate the query camera pose from 2D<->3D matches.

    Returns (success, cam2world 4x4 or None).
    """
    import cv2

    assert mode in ("cv2", "poselib", "pycolmap")
    try:
        if len(pts2D) <= 4:
            return False, None
        confidence = 0.9999
        iterationsCount = 10_000

        if mode == "cv2":
            if distortion is not None:
                pts = np.copy(pts2D)
                pts = cv2.undistortPoints(pts, K, np.array(distortion),
                                          R=None, P=K)
                pts2D = pts.reshape((-1, 2))
            success, r_pose, t_pose, _ = cv2.solvePnPRansac(
                pts3D, pts2D, K, None, flags=cv2.SOLVEPNP_SQPNP,
                iterationsCount=iterationsCount,
                reprojectionError=reprojectionError, confidence=confidence)
            if not success:
                return False, None
            R = cv2.Rodrigues(r_pose)[0]  # world2cam
            RT = np.r_[np.c_[R, t_pose], [(0, 0, 0, 1)]]
            return True, np.linalg.inv(RT)

        colmap_K = opencv_to_colmap_intrinsics(K)
        fx, fy = colmap_K[0, 0], colmap_K[1, 1]
        cx, cy = colmap_K[0, 2], colmap_K[1, 2]
        width = img_size[0] if img_size is not None else int(cx * 2)
        height = img_size[1] if img_size is not None else int(cy * 2)
        pts2D = np.copy(pts2D)
        pts2D[:, 0] += 0.5
        pts2D[:, 1] += 0.5

        if mode == "poselib":
            assert HAS_POSELIB, "poselib not installed"
            if distortion is None:
                camera = {"model": "PINHOLE", "width": width, "height": height,
                          "params": [fx, fy, cx, cy]}
            else:
                camera = {"model": "OPENCV", "width": width, "height": height,
                          "params": [fx, fy, cx, cy] + list(distortion)}
            pose, _ = poselib.estimate_absolute_pose(
                pts2D, pts3D, camera,
                {"max_reproj_error": reprojectionError,
                 "max_iterations": iterationsCount,
                 "success_prob": confidence}, {})
            if pose is None:
                return False, None
            RT = np.r_[pose.Rt, [(0, 0, 0, 1)]]
            return True, np.linalg.inv(RT)

        if mode == "pycolmap":
            assert HAS_PYCOLMAP, "pycolmap >= 0.5.0 not installed"
            assert img_size is not None
            if distortion is None:
                camera_dict = {"model": "PINHOLE", "width": width,
                               "height": height, "params": [fx, fy, cx, cy]}
            else:
                camera_dict = {"model": "OPENCV", "width": width,
                               "height": height,
                               "params": [fx, fy, cx, cy] + list(distortion)}
            cam = pycolmap.Camera(model=camera_dict["model"],
                                  width=camera_dict["width"],
                                  height=camera_dict["height"],
                                  params=camera_dict["params"])
            est_opts = dict(ransac=dict(max_error=reprojectionError,
                                        min_inlier_ratio=0.01,
                                        min_num_trials=1000,
                                        max_num_trials=100000,
                                        confidence=confidence))
            ref_opts = dict(refine_focal_length=False,
                            refine_extra_params=False)
            ret = pycolmap.absolute_pose_estimation(
                pts2D, pts3D, cam, estimation_options=est_opts,
                refinement_options=ref_opts)
            if ret is None or ret.get("num_inliers", 0) <= 0:
                return False, None
            mat = ret["cam_from_world"].matrix
            mat = mat() if callable(mat) else mat
            w2c = np.r_[mat, [(0, 0, 0, 1)]]
            return True, np.linalg.inv(w2c)
    except Exception as e:  # reference behavior: any exception => failure
        print(f"error during pnp: {e}")
        return False, None
