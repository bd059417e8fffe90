"""Waymo Open Dataset loader (reference dust3r/datasets/waymo.py).

Disk layout: ROOT/waymo_pairs.npz (scenes, frames, pairs =
(scene_id, img1_id, img2_id)) + per-frame jpg, exr depth, npz cameras.
"""
from __future__ import annotations

import os.path as osp

import numpy as np

from .base.base_stereo_view_dataset import BaseStereoViewDataset
from ..utils.image import imread_cv2


class Waymo(BaseStereoViewDataset):
    """Outdoor street scenes."""

    def __init__(self, *args, ROOT, **kwargs):
        self.ROOT = ROOT
        super().__init__(*args, **kwargs)
        self._load_data()

    def _load_data(self):
        with np.load(osp.join(self.ROOT, "waymo_pairs.npz")) as data:
            self.scenes = data["scenes"]
            self.frames = data["frames"]
            self.inv_frames = {frame: i
                               for i, frame in enumerate(data["frames"])}
            self.pairs = data["pairs"]
            assert self.pairs[:, 0].max() == len(self.scenes) - 1

    def __len__(self):
        return len(self.pairs)

    def get_stats(self):
        return f"{len(self)} pairs from {len(self.scenes)} scenes"

    def _get_views(self, pair_idx, resolution, rng):
        seq, img1, img2 = self.pairs[pair_idx]
        seq_path = osp.join(self.ROOT, self.scenes[seq])

        views = []
        for view_index in [img1, img2]:
            impath = self.frames[view_index]
            image = imread_cv2(osp.join(seq_path, impath + ".jpg"))
            depthmap = imread_cv2(osp.join(seq_path, impath + ".exr"))
            camera_params = np.load(osp.join(seq_path, impath + ".npz"))

            intrinsics = np.float32(camera_params["intrinsics"])
            camera_pose = np.float32(camera_params["cam2world"])

            image, depthmap, intrinsics = self._crop_resize_if_necessary(
                image, depthmap, intrinsics, resolution, rng,
                info=(seq_path, impath))

            views.append(dict(
                img=image, depthmap=depthmap, camera_pose=camera_pose,
                camera_intrinsics=intrinsics, dataset="Waymo",
                label=osp.relpath(seq_path, self.ROOT), instance=impath))
        return views
