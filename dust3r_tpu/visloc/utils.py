"""Visloc dataset utilities: AR-bucket resolution table + resize plumbing.

Behavioral contract: /root/reference/dust3r_visloc/datasets/utils.py.
`ratios_resolutions` is the canonical aspect-ratio bucket table for the
whole TPU input pipeline (SURVEY.md §2.7). Resizing is PIL-based
(torchvision-free); coordinate round-trips to the original resolution go
through 3x3 `to_orig` / `to_resize` transforms in COLMAP convention.
"""
from __future__ import annotations

import numpy as np
import PIL.Image

from ..utils.geometry import geotrf

ratios_resolutions = {
    224: {1.0: [224, 224]},
    512: {4 / 3: [512, 384], 32 / 21: [512, 336], 16 / 9: [512, 288],
          2 / 1: [512, 256], 16 / 5: [512, 160]},
}


def get_HW_resolution(H, W, maxdim, patchsize=16):
    assert maxdim in ratios_resolutions, \
        f"maxdim must be one of {list(ratios_resolutions)}"
    table = ratios_resolutions[maxdim]
    ratio = W / H
    ref_ratios = np.array(list(table.keys()))
    islandscape = W >= H
    diff = np.abs(ratio - ref_ratios) if islandscape \
        else np.abs(ratio - 1 / ref_ratios)
    res = table[ref_ratios[np.argmin(diff)]]
    if isinstance(patchsize, tuple):
        assert patchsize[0] == patchsize[1]
        patchsize = patchsize[0]
    return res[::-1] if islandscape else res  # (H, W)


def get_resize_function(maxdim, patch_size, H, W, is_mask=False):
    """Returns (resize_op on HWC numpy/PIL, to_resize 3x3, to_orig 3x3)."""
    if [max(H, W), min(H, W)] in ratios_resolutions[maxdim].values():
        return (lambda x: x), np.eye(3), np.eye(3)

    target_HW = get_HW_resolution(H, W, maxdim=maxdim, patchsize=patch_size)
    ratio = W / H
    target_ratio = target_HW[1] / target_HW[0]
    to_orig_crop = np.eye(3)
    to_rescaled_crop = np.eye(3)
    if abs(ratio - target_ratio) < np.finfo(np.float32).eps:
        crop_W, crop_H = W, H
    elif ratio - target_ratio < 0:
        crop_W = W
        crop_H = int(W / target_ratio)
        to_orig_crop[1, 2] = (H - crop_H) / 2.0
        to_rescaled_crop[1, 2] = -(H - crop_H) / 2.0
    else:
        crop_W = int(H * target_ratio)
        crop_H = H
        to_orig_crop[0, 2] = (W - crop_W) / 2.0
        to_rescaled_crop[0, 2] = -(W - crop_W) / 2.0

    def resize_op(x):
        """Center crop + resize; accepts HWC numpy (float or uint8)."""
        arr = np.asarray(x)
        Himg, Wimg = arr.shape[:2]
        t = (Himg - crop_H) // 2
        l = (Wimg - crop_W) // 2
        arr = arr[t:t + crop_H, l:l + crop_W]
        resample = PIL.Image.NEAREST if is_mask else PIL.Image.BILINEAR
        if arr.ndim == 3:
            chans = [np.asarray(PIL.Image.fromarray(arr[..., c]).resize(
                (target_HW[1], target_HW[0]), resample))
                for c in range(arr.shape[-1])]
            return np.stack(chans, axis=-1)
        return np.asarray(PIL.Image.fromarray(arr).resize(
            (target_HW[1], target_HW[0]), resample))

    to_orig_resize = np.array([[crop_W / target_HW[1], 0, 0],
                               [0, crop_H / target_HW[0], 0],
                               [0, 0, 1]])
    to_rescaled_resize = np.array([[target_HW[1] / crop_W, 0, 0],
                                   [0, target_HW[0] / crop_H, 0],
                                   [0, 0, 1]])
    return (resize_op, to_rescaled_resize @ to_rescaled_crop,
            to_orig_crop @ to_orig_resize)


def rescale_points3d(pts2d, pts3d, to_resize, HR, WR):
    """Map sparse 2D->3D correspondences into the rescaled image."""
    pts2d = pts2d.copy()
    pts2d[:, 0] += 0.5  # cv2 -> colmap convention
    pts2d[:, 1] += 0.5

    pts2d_rescaled = np.asarray(geotrf(to_resize, pts2d, norm=True))

    pts2d_rescaled_int = pts2d_rescaled.copy()
    pts2d_rescaled_int[:, 0] -= 0.5
    pts2d_rescaled_int[:, 1] -= 0.5
    pts2d_rescaled_int = pts2d_rescaled_int.round().astype(np.int64)

    valid = ((pts2d_rescaled_int[:, 0] >= 0) & (pts2d_rescaled_int[:, 0] < WR)
             & (pts2d_rescaled_int[:, 1] >= 0)
             & (pts2d_rescaled_int[:, 1] < HR))
    pts2d_rescaled_int = pts2d_rescaled_int[valid]

    pts3d_rescaled = np.full((HR, WR, 3), np.nan, dtype=np.float32)
    pts3d_rescaled[pts2d_rescaled_int[:, 1],
                   pts2d_rescaled_int[:, 0]] = pts3d[valid]
    return (pts2d_rescaled, pts2d_rescaled_int, pts3d_rescaled,
            np.isfinite(pts3d_rescaled.sum(axis=-1)))


def cam_to_world_from_kapture(kdata, timestamp, camera_id):
    import quaternion

    camera_to_world = kdata.trajectories[timestamp, camera_id].inverse()
    camera_pose = np.eye(4, dtype=np.float32)
    camera_pose[:3, :3] = quaternion.as_rotation_matrix(camera_to_world.r)
    camera_pose[:3, 3] = camera_to_world.t_raw
    return camera_pose


def plot_matches(query_rgb, map_rgb, matches_im0, matches_im1, n_viz=20,
                 save_path=None):
    """Side-by-side match overlay (reference visloc.py:127-146).

    query_rgb/map_rgb: uint8 HWC arrays or PIL images at ORIGINAL
    resolution; matches_im0/matches_im1: (N, 2) cv2-convention pixel
    coordinates in each image's original resolution. Evenly subsamples
    n_viz matches and draws jet-colored connecting lines. With save_path
    the figure is written headlessly (Agg); otherwise it is shown
    (the reference's pl.show(block=True) behavior).
    """
    import matplotlib
    if save_path is not None:
        matplotlib.use("Agg")
    from matplotlib import pyplot as pl

    img0 = np.asarray(query_rgb)
    img1 = np.asarray(map_rgb)
    num = len(matches_im0)
    if num == 0:
        return None
    n_viz = min(n_viz, num)
    idx = np.round(np.linspace(0, num - 1, n_viz)).astype(int)
    m0, m1 = matches_im0[idx], matches_im1[idx]

    H0, W0 = img0.shape[:2]
    H1, W1 = img1.shape[:2]
    img0 = np.pad(img0, ((0, max(H1 - H0, 0)), (0, 0), (0, 0)),
                  "constant", constant_values=0)
    img1 = np.pad(img1, ((0, max(H0 - H1, 0)), (0, 0), (0, 0)),
                  "constant", constant_values=0)
    img = np.concatenate((img0, img1), axis=1)
    fig = pl.figure()
    pl.imshow(img)
    cmap = pl.get_cmap("jet")
    for i in range(n_viz):
        (x0, y0), (x1, y1) = m0[i].T, m1[i].T
        pl.plot([x0, x1 + W0], [y0, y1], "-+",
                color=cmap(i / max(n_viz - 1, 1)),
                scalex=False, scaley=False)
    if save_path is not None:
        fig.savefig(save_path, bbox_inches="tight", dpi=120)
        pl.close(fig)
        return save_path
    pl.show(block=True)
    return None
