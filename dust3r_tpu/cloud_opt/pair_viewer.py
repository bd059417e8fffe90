"""PairViewer: closed-form 2-image "optimizer" (no gradient descent).

Behavioral contract: /root/reference/dust3r/cloud_opt/pair_viewer.py:18-127.
Focal via Weiszfeld, relative pose via RANSAC-PnP, anchor chosen by
confidence. All host-side - the scene is tiny by definition.
"""
from __future__ import annotations

import numpy as np

from .base_opt import BasePCOptimizer
from .commons import edge_str
from .init_im_poses import fast_pnp
from ..post_process import estimate_focal_knowing_depth
from ..utils.geometry import (inv, geotrf,
                              depthmap_to_absolute_camera_coordinates)


class PairViewer(BasePCOptimizer):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        assert self.is_symmetrized and self.n_edges == 2, \
            "PairViewer requires a symmetrized 2-image scene"
        self.has_im_poses = True

        self.focals = []
        self.pp = []
        rel_poses = []
        confs = []
        for i in range(self.n_imgs):
            s_ij = edge_str(i, 1 - i)
            conf = float(np.mean(self.conf_i[s_ij]) * np.mean(self.conf_j[s_ij]))
            if self.verbose:
                print(f"  - conf={conf:.3} for edge {i}-{1 - i}")
            confs.append(conf)

            H, W = self.imshapes[i]
            pp = np.array([W / 2, H / 2], np.float32)
            focal = float(np.asarray(estimate_focal_knowing_depth(
                np.asarray(self.pred_i[s_ij])[None], pp[None],
                focal_mode="weiszfeld")).ravel()[0])
            self.focals.append(focal)
            self.pp.append(pp)

            # pose of camera i as seen from the other view's prediction
            pts3d = np.asarray(self.pred_j[edge_str(1 - i, i)])
            msk = self.get_masks()[i]
            res = fast_pnp(pts3d, focal, msk=msk, pp=pp, niter_PnP=100)
            pose = res[1] if res is not None else np.eye(4, dtype=np.float32)
            rel_poses.append(np.asarray(pose, np.float32))

        # anchor on the more confident pair
        if confs[0] > confs[1]:
            self.im_poses_mat = np.stack([np.eye(4, dtype=np.float32),
                                          rel_poses[1]])
            self.depth = [np.asarray(self.pred_i["0_1"])[..., 2],
                          np.asarray(geotrf(inv(rel_poses[1]),
                                            self.pred_j["0_1"]))[..., 2]]
        else:
            self.im_poses_mat = np.stack([rel_poses[0],
                                          np.eye(4, dtype=np.float32)])
            self.depth = [np.asarray(geotrf(inv(rel_poses[0]),
                                            self.pred_j["1_0"]))[..., 2],
                          np.asarray(self.pred_i["1_0"])[..., 2]]

        self.focals = np.asarray(self.focals, np.float32)
        self.pp = np.stack(self.pp)
        # nothing is trainable
        self.masks = {k: m * 0 for k, m in self.masks.items()}

    # accessors -------------------------------------------------------- #

    def get_focals(self):
        return self.focals

    def get_known_focal_mask(self):
        return np.ones(self.n_imgs, bool)

    def get_principal_points(self):
        return self.pp

    def get_intrinsics(self):
        K = np.zeros((self.n_imgs, 3, 3), np.float32)
        K[:, 0, 0] = K[:, 1, 1] = self.focals
        K[:, :2, 2] = self.pp
        K[:, 2, 2] = 1
        return K

    def get_im_poses(self):
        return self.im_poses_mat

    def get_depthmaps(self, raw=False):
        return self.depth

    def depth_to_pts3d(self, params=None, consts=None):
        # signature matches BasePCOptimizer.depth_to_pts3d (base_opt.py):
        # the base pts3d_fn fallback passes consts=...; PairViewer's
        # geometry is fixed at construction so both args are unused
        import numpy as np
        K = self.get_intrinsics()
        out = np.zeros((self.n_imgs, self.max_area, 3), np.float32)
        for i, (d, Ki, pose) in enumerate(zip(self.depth, K, self.im_poses_mat)):
            pts, _ = depthmap_to_absolute_camera_coordinates(d, Ki, pose)
            out[i, :d.size] = np.asarray(pts).reshape(-1, 3)
        return out

    def _set_depthmap(self, idx, depth, force=False):
        if self.verbose:
            print("_set_depthmap is ignored in PairViewer")

    def forward(self):
        return float("nan")

    __call__ = forward
