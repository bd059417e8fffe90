"""MegaDepth loader (reference dust3r/datasets/megadepth.py).

Disk layout: ROOT/all_metadata.npz (scenes, images, pairs with scene_id /
im1_id / im2_id / score) + per-frame jpg, exr depth, npz cameras.
Train split excludes scenes 0015/0022 (val keeps them).
"""
from __future__ import annotations

import os.path as osp

import numpy as np

from .base.base_stereo_view_dataset import BaseStereoViewDataset
from ..utils.image import imread_cv2


class MegaDepth(BaseStereoViewDataset):
    def __init__(self, *args, split, ROOT, **kwargs):
        # NOTE the reference (dust3r/datasets/megadepth.py:17-29) captures
        # `split` as a keyword-only arg that SHADOWS the base's, so its
        # self.split stays None and the documented 0015/0022 train/val
        # exclusion never fires. We forward it - implementing the
        # documented intent.
        self.ROOT = ROOT
        super().__init__(*args, split=split, **kwargs)
        self._load_data(self.split)
        if self.split is None:
            pass
        elif self.split == "train":
            self.select_scene(("0015", "0022"), opposite=True)
        elif self.split == "val":
            self.select_scene(("0015", "0022"))
        else:
            raise ValueError(f"bad split={self.split}")

    def _load_data(self, split):
        with np.load(osp.join(self.ROOT, "all_metadata.npz")) as data:
            self.all_scenes = data["scenes"]
            self.all_images = data["images"]
            self.pairs = data["pairs"]

    def __len__(self):
        return len(self.pairs)

    def get_stats(self):
        return f"{len(self)} pairs from {len(self.all_scenes)} scenes"

    def select_scene(self, scene, *instances, opposite=False):
        scenes = (scene,) if isinstance(scene, str) else tuple(scene)
        scene_id = [s.startswith(scenes) for s in self.all_scenes]
        assert any(scene_id), "no scene found"

        valid = np.isin(self.pairs["scene_id"], np.nonzero(scene_id)[0])
        if instances:
            image_id = np.nonzero([i.startswith(instances)
                                   for i in self.all_images])[0]
            assert len(image_id), "no instance found"
            if len(instances) == 2:
                valid &= (np.isin(self.pairs["im1_id"], image_id)
                          & np.isin(self.pairs["im2_id"], image_id))
            else:
                valid &= (np.isin(self.pairs["im1_id"], image_id)
                          | np.isin(self.pairs["im2_id"], image_id))
        if opposite:
            valid = ~valid
        assert valid.any()
        self.pairs = self.pairs[valid]

    def _get_views(self, pair_idx, resolution, rng):
        scene_id, im1_id, im2_id, score = self.pairs[pair_idx]
        scene, subscene = self.all_scenes[scene_id].split()
        seq_path = osp.join(self.ROOT, scene, subscene)

        views = []
        for im_id in [im1_id, im2_id]:
            img = self.all_images[im_id]
            try:
                image = imread_cv2(osp.join(seq_path, img + ".jpg"))
                depthmap = imread_cv2(osp.join(seq_path, img + ".exr"))
                camera_params = np.load(osp.join(seq_path, img + ".npz"))
            except Exception as e:
                raise OSError(f"cannot load {img}, got exception {e}")

            intrinsics = np.float32(camera_params["intrinsics"])
            camera_pose = np.float32(camera_params["cam2world"])

            image, depthmap, intrinsics = self._crop_resize_if_necessary(
                image, depthmap, intrinsics, resolution, rng,
                info=(seq_path, img))

            views.append(dict(
                img=image, depthmap=depthmap, camera_pose=camera_pose,
                camera_intrinsics=intrinsics, dataset="MegaDepth",
                label=osp.relpath(seq_path, self.ROOT), instance=img))
        return views
