"""Geometry core: pixel grids, rigid transforms, depth <-> pointmap conversion.

TPU-native reimplementation of the geometry toolkit of the reference
(see /root/reference/dust3r/utils/geometry.py for the behavioral contract).
Everything here is pure jax.numpy (jit/vmap/grad-safe, static shapes); a few
host-only helpers (KD-tree matching) live at the bottom and operate on numpy.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def xy_grid(W, H, origin=(0, 0), homogeneous=False, dtype=jnp.float32):
    """(H, W, 2) grid with out[j, i] = (i + ox, j + oy).

    Matches the reference convention (x = column index first):
    reference dust3r/utils/geometry.py:15-36.
    """
    x = jnp.arange(origin[0], origin[0] + W, dtype=dtype)
    y = jnp.arange(origin[1], origin[1] + H, dtype=dtype)
    gx, gy = jnp.meshgrid(x, y, indexing="xy")
    if homogeneous:
        return jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)
    return jnp.stack([gx, gy], axis=-1)


def geotrf(Trf, pts, ncol=None, norm=0):
    """Apply homogeneous transform(s) to points.

    Trf: (..., d, d) or (..., d, d+1)-style square matrix (3x3 or 4x4).
    pts: (..., 2) or (..., 3); leading batch dims of Trf broadcast against
    leading dims of pts (Trf batch dims must be a prefix of pts batch dims).

    Semantics match reference geotrf (dust3r/utils/geometry.py:39-104):
      - if pts has d coords and Trf is (d+1)x(d+1): rotate + translate
      - if pts has d coords and Trf is dxd: linear map only
      - norm != 0: project onto plane last-coord == norm
      - ncol: truncate output coordinates
    """
    Trf = jnp.asarray(Trf)
    pts = jnp.asarray(pts)
    out_shape = pts.shape[:-1]
    d = pts.shape[-1]
    ncol = ncol or d

    if Trf.ndim == 2:
        R = Trf
        batch = ()
    else:
        batch = Trf.shape[:-2]
        n_extra = pts.ndim - 1 - len(batch)
        R = Trf.reshape(batch + (1,) * n_extra + Trf.shape[-2:])

    if Trf.shape[-1] == d + 1:
        # keep ALL output rows (including the homogeneous one) so that
        # norm= can divide by the homogeneous coordinate, like the
        # reference (2D pts + 3x3 homography -> 3 coords before norm)
        res = jnp.einsum("...ij,...j->...i", R[..., :, :d], pts) + R[..., :, d]
    elif Trf.shape[-1] == d:
        res = jnp.einsum("...ij,...j->...i", R[..., :d, :d], pts)
    else:
        raise ValueError(f"incompatible shapes Trf={Trf.shape} pts={pts.shape}")

    if norm:
        res = res / res[..., -1:]
        if norm != 1:
            res = res * norm

    return res[..., :ncol].reshape(*out_shape, ncol)


def inv(mat):
    """Invert matrices (stacked ok)."""
    return jnp.linalg.inv(jnp.asarray(mat))


def closed_form_pose_inverse(T):
    """Invert (..., 4, 4) rigid transforms without a linear solve.

    For a rigid [R|t] this is [[R^T, -R^T t], [0, 1]] - cheaper and better
    conditioned on accelerator than jnp.linalg.inv.
    """
    T = jnp.asarray(T)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    new_t = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, new_t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), T.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def depthmap_to_pts3d(depth, pseudo_focal, pp=None):
    """Lift (B, H, W) depth to (B, H, W, 3) camera-frame points.

    pseudo_focal: (B,H,W) or (B,1,H,W) or (B,2,H,W). pp: (B, 2) or None
    (None => centered at ((W-1)/2, (H-1)/2), reference behavior
    dust3r/utils/geometry.py:109-159).
    """
    depth = jnp.asarray(depth)
    pseudo_focal = jnp.asarray(pseudo_focal)
    B, H, W = depth.shape
    if pseudo_focal.ndim == 3:
        fx = fy = pseudo_focal
    elif pseudo_focal.ndim == 4:
        fx = pseudo_focal[:, 0]
        fy = pseudo_focal[:, 1] if pseudo_focal.shape[1] == 2 else fx
    else:
        raise ValueError(f"bad focal shape {pseudo_focal.shape}")

    grid = xy_grid(W, H, dtype=depth.dtype)  # (H, W, 2)
    gx, gy = grid[..., 0], grid[..., 1]
    if pp is None:
        gx = gx - (W - 1) / 2
        gy = gy - (H - 1) / 2
        gx = jnp.broadcast_to(gx, (B, H, W))
        gy = jnp.broadcast_to(gy, (B, H, W))
    else:
        pp = jnp.asarray(pp)
        gx = gx[None] - pp[:, 0, None, None]
        gy = gy[None] - pp[:, 1, None, None]

    x = depth * gx / fx
    y = depth * gy / fy
    return jnp.stack([x, y, depth], axis=-1)


def depth_to_world_pts3d(depthmap, camera_intrinsics, camera_pose):
    """In-graph batched gt pointmaps: (B,H,W) depth + (B,3,3) K +
    (B,4,4) cam2world -> (B,H,W,3) world points, all f32.

    Device-side twin of depthmap_to_absolute_camera_coordinates below
    (reference dust3r/utils/geometry.py:162-213): the training step
    ships depth (1 plane) instead of gt pts3d (3 planes) and rebuilds
    the pointmaps on device - bandwidth is the scarce resource on the
    host->HBM path, the lift is a handful of fused FMAs. Rays come from
    K^{-1}(u,v,1) rather than the (u-cu)/fu shortcut so the ManyAR
    row-permuted intrinsics of transpose_to_landscape (K[[1,0,2]]) are
    handled by the same formula.
    """
    d = depthmap.astype(jnp.float32)
    B, H, W = d.shape
    gx, gy = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32), indexing="xy")
    uv1 = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # (H, W, 3)
    Kinv = jnp.linalg.inv(camera_intrinsics.astype(jnp.float32))
    rays = jnp.einsum("bij,hwj->bhwi", Kinv, uv1)
    X_cam = rays * d[..., None]
    T = camera_pose.astype(jnp.float32)
    return (jnp.einsum("bij,bhwj->bhwi", T[:, :3, :3], X_cam)
            + T[:, None, None, :3, 3])


def depthmap_to_camera_coordinates(depthmap, camera_intrinsics):
    """(H,W) depth + 3x3 K -> (H,W,3) camera points and validity mask.

    PURE NUMPY on purpose: every caller is host-side (the data loader's
    per-sample path, viz, PairViewer, visloc datasets) and a jnp version
    costs ~15 tunnel dispatches PER TRAINING SAMPLE on the real TPU,
    serialized behind the training step's device queue (measured: the
    sustained-training run collapsed to 5.6 s/step loader-bound).
    Matches reference dust3r/utils/geometry.py:162-191.
    """
    K = np.asarray(camera_intrinsics, dtype=np.float32)
    depthmap = np.asarray(depthmap)
    H, W = depthmap.shape
    fu, fv = K[0, 0], K[1, 1]
    cu, cv = K[0, 2], K[1, 2]
    gx, gy = np.meshgrid(np.arange(W, dtype=depthmap.dtype),
                         np.arange(H, dtype=depthmap.dtype), indexing="xy")
    # Degenerate intrinsics (focal 0 from a failed Weiszfeld estimate on
    # garbage predictions) produce non-finite points exactly like the
    # torch reference does — silently (torch raises no RuntimeWarning;
    # a green suite should not train people to ignore warnings).
    with np.errstate(divide="ignore", invalid="ignore"):
        x = (gx - cu) * depthmap / fu
        y = (gy - cv) * depthmap / fv
    X_cam = np.stack([x, y, depthmap], axis=-1).astype(np.float32)
    valid_mask = depthmap > 0.0
    return X_cam, valid_mask


def depthmap_to_absolute_camera_coordinates(depthmap, camera_intrinsics, camera_pose):
    """Same as above but also applies cam2world pose (reference :194-213).
    Host/numpy like its sibling above."""
    X_cam, valid_mask = depthmap_to_camera_coordinates(depthmap, camera_intrinsics)
    if camera_pose is None:
        return X_cam, valid_mask
    camera_pose = np.asarray(camera_pose, dtype=np.float32)
    R, t = camera_pose[:3, :3], camera_pose[:3, 3]
    X_world = np.einsum("ik,vuk->vui", R, X_cam) + t
    return X_world, valid_mask


def colmap_to_opencv_intrinsics(K):
    K = np.array(K, copy=True)
    K[0, 2] -= 0.5
    K[1, 2] -= 0.5
    return K


def opencv_to_colmap_intrinsics(K):
    K = np.array(K, copy=True)
    K[0, 2] += 0.5
    K[1, 2] += 0.5
    return K


# ---------------------------------------------------------------------------
# masked statistics (replacements for torch nanmean/nanmedian on masked data)
# ---------------------------------------------------------------------------

def masked_mean(x, mask, axis=None, eps=1e-8):
    """Mean of x over elements where mask, 0-safe."""
    mask = mask.astype(x.dtype)
    num = jnp.sum(x * mask, axis=axis)
    den = jnp.sum(mask, axis=axis)
    return num / jnp.maximum(den, eps)


def masked_median(x, mask, axis=-1):
    """Median of masked elements along axis (nan-median equivalent).

    Invalid entries are pushed to +inf and a quantile over the valid count is
    taken via sorting; exact for both odd/even valid counts (matches
    torch.nanmedian's lower-middle convention: for even n takes element
    (n-1)//2, i.e. the lower of the two middles).
    """
    big = jnp.asarray(jnp.inf, dtype=x.dtype)
    filled = jnp.where(mask, x, big)
    sorted_x = jnp.sort(filled, axis=axis)
    n_valid = jnp.sum(mask, axis=axis)
    # torch.nanmedian picks index (n-1)//2 of the valid prefix
    idx = jnp.maximum(n_valid - 1, 0) // 2
    return jnp.take_along_axis(sorted_x, idx[..., None].astype(jnp.int32), axis=axis).squeeze(axis)


def masked_quantile(x, mask, q, axis=-1):
    """Linear-interpolated quantile over masked elements (nanquantile equiv)."""
    big = jnp.asarray(jnp.inf, dtype=x.dtype)
    filled = jnp.where(mask, x, big)
    sorted_x = jnp.sort(filled, axis=axis)
    n_valid = jnp.sum(mask, axis=axis).astype(x.dtype)
    pos = q * jnp.maximum(n_valid - 1, 0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = (pos - lo.astype(x.dtype))[..., None]
    take = lambda i: jnp.take_along_axis(sorted_x, i[..., None], axis=axis)
    out = take(lo) * (1 - frac) + take(hi) * frac
    return out.squeeze(axis)


# ---------------------------------------------------------------------------
# pointcloud normalization (reference dust3r/utils/geometry.py:249-342)
# ---------------------------------------------------------------------------

def _flatten_pts(pts, valid):
    """(B,H,W,3)->(B,N,3) plus float mask (B,N)."""
    B = pts.shape[0]
    flat = pts.reshape(B, -1, 3)
    if valid is None:
        mask = jnp.ones(flat.shape[:2], dtype=bool)
    else:
        mask = valid.reshape(B, -1)
    return flat, mask


def normalize_pointcloud(pts1, pts2=None, norm_mode="avg_dis", valid1=None,
                         valid2=None, ret_factor=False):
    """Normalize pointmaps by a robust scale factor.

    norm_mode = '<norm>_<dis>' with norm in {avg, median, sqrt} and dis in
    {dis, log1p, warp-log1p}. Only 'avg' supports the dis transforms
    (reference semantics).
    """
    norm, dis_mode = norm_mode.split("_", 1)

    flat1, m1 = _flatten_pts(pts1, valid1)
    if pts2 is not None:
        flat2, m2 = _flatten_pts(pts2, valid2)
        all_pts = jnp.concatenate([flat1, flat2], axis=1)
        all_mask = jnp.concatenate([m1, m2], axis=1)
    else:
        all_pts = flat1
        all_mask = m1

    dis = jnp.linalg.norm(all_pts, axis=-1)

    if norm == "avg":
        if dis_mode == "dis":
            pass
        elif dis_mode == "log1p":
            dis = jnp.log1p(dis)
        elif dis_mode == "warp-log1p":
            log_dis = jnp.log1p(dis)
            # the reference computes distances on invalid-ZEROED points
            # (invalid_to_zeros), so its warp factor is 0 at invalid pixels
            # and those output points come back zeroed; reproduce that
            warp = jnp.where(all_mask, log_dis / jnp.clip(dis, 1e-8), 0.0)
            log_dis = jnp.where(all_mask, log_dis, 0.0)
            n1 = flat1.shape[1]
            w1 = warp[:, :n1].reshape(pts1.shape[:-1] + (1,))
            pts1 = pts1 * w1
            if pts2 is not None:
                w2 = warp[:, n1:].reshape(pts2.shape[:-1] + (1,))
                pts2 = pts2 * w2
            dis = log_dis
        else:
            raise ValueError(f"bad dis_mode {dis_mode}")
        norm_factor = masked_mean(dis, all_mask, axis=1)
    elif norm == "median":
        norm_factor = jax.lax.stop_gradient(masked_median(dis, all_mask, axis=1))
    elif norm == "sqrt":
        norm_factor = masked_mean(jnp.sqrt(dis), all_mask, axis=1) ** 2
    else:
        raise ValueError(f"bad norm mode {norm}")

    norm_factor = jnp.clip(norm_factor, 1e-8)
    nf = norm_factor.reshape((-1,) + (1,) * (pts1.ndim - 1))

    res = pts1 / nf
    if pts2 is not None:
        res = (res, pts2 / nf)
        if ret_factor:
            return res + (nf,)
        return res
    if ret_factor:
        return res, nf
    return res


def get_joint_pointcloud_depth(z1, z2, valid_mask1, valid_mask2=None, quantile=0.5):
    """Joint (masked) median/quantile of depth across two views (B,).

    Non-differentiable by contract: the reference wraps this in
    @torch.no_grad() (reference dust3r/utils/geometry.py), so the
    shift/scale statistics act as constants in Regr3D_*Inv losses.
    """
    B = z1.shape[0]
    _z1, m1 = z1.reshape(B, -1), (valid_mask1.reshape(B, -1) if valid_mask1 is not None
                                  else jnp.ones((B, z1[0].size), bool))
    if z2 is not None:
        _z2 = z2.reshape(B, -1)
        m2 = (valid_mask2.reshape(B, -1) if valid_mask2 is not None
              else jnp.ones_like(_z2, dtype=bool))
        _z = jnp.concatenate([_z1, _z2], axis=-1)
        m = jnp.concatenate([m1, m2], axis=-1)
    else:
        _z, m = _z1, m1
    if quantile == 0.5:
        out = masked_median(_z, m, axis=-1)
    else:
        out = masked_quantile(_z, m, quantile, axis=-1)
    return jax.lax.stop_gradient(out)


def get_joint_pointcloud_center_scale(pts1, pts2=None, valid_mask1=None,
                                      valid_mask2=None, z_only=False, center=True):
    """Median center (B,1,1,3) + median-dist scale (B,1,1,1) of joint cloud.

    Non-differentiable by contract (reference wraps in @torch.no_grad());
    see get_joint_pointcloud_depth.
    """
    flat1, m1 = _flatten_pts(pts1, valid_mask1)
    if pts2 is not None:
        flat2, m2 = _flatten_pts(pts2, valid_mask2)
        _pts = jnp.concatenate([flat1, flat2], axis=1)
        m = jnp.concatenate([m1, m2], axis=1)
    else:
        _pts, m = flat1, m1
    _center = jax.vmap(lambda p, mm: jax.vmap(lambda col: masked_median(col, mm, axis=-1))(p.T))(_pts, m)
    _center = _center[:, None, :]  # (B,1,3)
    if z_only:
        _center = _center.at[..., :2].set(0)
    ref = (_pts - _center) if center else _pts
    _norm = jnp.linalg.norm(ref, axis=-1)
    scale = masked_median(_norm, m, axis=1)
    return (jax.lax.stop_gradient(_center[:, None, :, :]),
            jax.lax.stop_gradient(scale[:, None, None, None]))


# ---------------------------------------------------------------------------
# host-side matching helpers (numpy / scipy; reference :345-366)
# ---------------------------------------------------------------------------

def find_reciprocal_matches(P1, P2):
    """Reciprocal nearest-neighbor matches between two 3D point sets (host)."""
    from scipy.spatial import cKDTree as KDTree

    P1 = np.asarray(P1)
    P2 = np.asarray(P2)
    tree1 = KDTree(P1)
    tree2 = KDTree(P2)
    _, nn1_in_P2 = tree2.query(P1, workers=8)
    _, nn2_in_P1 = tree1.query(P2, workers=8)
    reciprocal_in_P2 = nn1_in_P2[nn2_in_P1] == np.arange(len(nn2_in_P1))
    return reciprocal_in_P2, nn2_in_P1, int(reciprocal_in_P2.sum())


def get_med_dist_between_poses(poses):
    """Median pairwise camera-center distance (host)."""
    from scipy.spatial.distance import pdist

    centers = [np.asarray(p)[:3, 3] for p in poses]
    return float(np.median(pdist(centers)))
