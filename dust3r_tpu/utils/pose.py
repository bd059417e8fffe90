"""Pose parametrizations: quaternions, sim(3) helpers, signed log/exp maps.

Replaces the reference's use of the `roma` library (quat<->rotmat, rigid
point registration) with native JAX; behavioral contract from
/root/reference/dust3r/cloud_opt/commons.py:70-82 and
/root/reference/dust3r/cloud_opt/init_im_poses.py:218-229.

Quaternion convention: XYZW (same as roma), rotation acting as R(q) @ v.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def signed_log1p(x, xp=jnp):
    """xp=np gives the host float64 twin (matrix_to_pose_vec) — one body
    so the device/host forms can't drift."""
    return xp.sign(x) * xp.log1p(xp.abs(x))


def signed_expm1(x):
    return jnp.sign(x) * jnp.expm1(jnp.abs(x))


def quat_normalize(q, eps=1e-12):
    return q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q):
    """Unit quaternion (..., 4) [x,y,z,w] -> rotation matrix (..., 3, 3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def _rotmat_to_quat_impl(R, xp):
    """Shepperd-style branch-free extraction, shared by the jnp (in-graph)
    and np (host float64) paths — `xp` is the array namespace. One body so
    a candidate-table/sign-convention fix can never drift between the
    device and host twins."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # four candidates (unnormalized), keyed by which diagonal term dominates
    qw = xp.stack([1 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)  # w-major
    qx = xp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = xp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = xp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], axis=-1)

    # candidates give (w,x,y,z); reorder to (x,y,z,w)
    def wxyz_to_xyzw(q):
        return xp.concatenate([q[..., 1:], q[..., :1]], axis=-1)

    cands = xp.stack([wxyz_to_xyzw(qw), wxyz_to_xyzw(qx),
                      wxyz_to_xyzw(qy), wxyz_to_xyzw(qz)], axis=-2)  # (...,4cand,4)
    scores = xp.stack([1 + tr, 1 + m00 - m11 - m22,
                       1 - m00 + m11 - m22, 1 - m00 - m11 + m22], axis=-1)
    best = xp.argmax(scores, axis=-1)
    q = xp.take_along_axis(
        cands, xp.repeat(best[..., None, None], 4, axis=-1),
        axis=-2).squeeze(-2)
    return q / xp.maximum(xp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def rotmat_to_quat(R):
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) [x,y,z,w].

    Branch-free (jit-safe) Shepperd-style extraction: build all four
    candidate quaternions and pick the numerically best one.
    """
    if isinstance(R, np.ndarray):
        return _rotmat_to_quat_np(R)
    return _rotmat_to_quat_impl(jnp.asarray(R), jnp)


def _rotmat_to_quat_np(R):
    """Host (numpy) rotmat->quat in float64.

    Init-time pose writes go through this path: the reference's chain
    (roma/scipy) extracts quaternions in double precision, and fp32
    extraction here was measured to leave a ~3e-4 error on raw pw_poses
    rows — enough to float the post-init loss of init_from_known_poses
    two orders of magnitude above the reference's (round-5 root cause,
    scripts/debug_known_poses_init.py)."""
    return _rotmat_to_quat_impl(np.asarray(R, np.float64), np)


def pose_vec_to_matrix(vec):
    """(..., >=7) [qx qy qz qw tx ty tz (log s)] -> (..., 4, 4) cam2world.

    Translation stored through signed_log1p; mirrors the reference's pose
    parametrization (base_opt.py:150-160).
    """
    vec = jnp.asarray(vec)  # host float64 vecs (matrix_to_pose_vec) -> fp32
    q = quat_normalize(vec[..., :4])
    T = signed_expm1(vec[..., 4:7])
    R = quat_to_rotmat(q)
    top = jnp.concatenate([R, T[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=vec.dtype), vec.shape[:-1] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def matrix_to_pose_vec(M, scale=None, pose_dim=7):
    """Inverse of pose_vec_to_matrix for initialization (host-friendly).

    Returns (..., pose_dim(+1)) vector; if scale given appends log(scale) and
    divides translation by scale first (reference _set_pose, base_opt.py:162-181).

    Host-only (init/preset writes): computes in float64 numpy — see
    _rotmat_to_quat_np for why fp32 here is not enough.
    """
    M = np.asarray(M, np.float64)
    q = _rotmat_to_quat_np(M[..., :3, :3])
    T = M[..., :3, 3]
    if scale is not None:
        T = T / scale
    t = signed_log1p(T, xp=np)
    vec = np.concatenate([q, t], axis=-1)
    if scale is not None:
        logs = np.log(np.broadcast_to(np.asarray(scale, np.float64),
                                      M.shape[:-2] + (1,)))
        vec = np.concatenate([vec, logs], axis=-1)
    return vec


def sRT_to_4x4(scale, R, T, dtype=jnp.float32):
    """Build [[s*R, T], [0, 1]] (reference init_im_poses.py:232-236)."""
    R = jnp.asarray(R, dtype)
    T = jnp.asarray(T, dtype).reshape(3)
    trf = jnp.eye(4, dtype=dtype)
    trf = trf.at[:3, :3].set(R * scale)
    trf = trf.at[:3, 3].set(T)
    return trf


def rigid_points_registration(pts1, pts2, weights=None, compute_scaling=True):
    """Weighted Umeyama: find (s, R, T) minimizing ||s R pts1 + T - pts2||^2.

    pts: (N, 3); weights: (N,) nonnegative. Returns (s, R, T) with R (3,3),
    T (3,). Native replacement for roma.rigid_points_registration.

    Host-only (aligner init / MST propagation): computes in float64 numpy,
    matching the double-precision SVD of the reference chain — fp32 SVD
    here measurably degrades the post-init consistency (round-5 root
    cause, scripts/debug_known_poses_init.py).
    """
    pts1 = np.asarray(pts1, np.float64).reshape(-1, 3)
    pts2 = np.asarray(pts2, np.float64).reshape(-1, 3)
    if weights is None:
        w = np.ones(pts1.shape[0], np.float64)
    else:
        w = np.asarray(weights, np.float64).reshape(-1)
    wsum = max(float(np.sum(w)), 1e-12)
    wn = (w / wsum)[:, None]

    mu1 = np.sum(wn * pts1, axis=0)
    mu2 = np.sum(wn * pts2, axis=0)
    c1 = pts1 - mu1
    c2 = pts2 - mu2

    cov = (wn * c1).T @ c2  # (3,3): sum_i w_i c1_i c2_i^T -> transposed below
    U, S, Vt = np.linalg.svd(cov.T)  # cov.T maps pts1-space -> pts2-space
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.array([1.0, 1.0, d], np.float64)
    R = (U * D) @ Vt

    if compute_scaling:
        var1 = np.sum(wn * np.sum(c1 * c1, axis=-1, keepdims=True))
        s = np.sum(S * D) / max(float(var1), 1e-12)
    else:
        s = np.float64(1.0)
    T = mu2 - s * (R @ mu1)
    return s, R, T


def align_multiple_poses(src_poses, target_poses):
    """sim(3) aligning one set of cam2world poses onto another.

    Matches reference align_multiple_poses (init_im_poses.py:308-316): register
    camera centers plus a point eps along each z-axis.
    """
    from .geometry import get_med_dist_between_poses

    src_poses = np.asarray(src_poses, np.float64)
    target_poses = np.asarray(target_poses, np.float64)

    def center_and_z(poses):
        eps = float(get_med_dist_between_poses(poses)) / 100
        centers = poses[:, :3, 3]
        zdir = poses[:, :3, 3] + eps * poses[:, :3, 2]
        return np.concatenate([centers, zdir], axis=0)

    s, R, T = rigid_points_registration(center_and_z(src_poses), center_and_z(target_poses))
    return s, R, T
