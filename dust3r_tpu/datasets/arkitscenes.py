"""ARKitScenes + ScanNet++ loaders (shared all_metadata.npz pattern).

Behavioral contracts: /root/reference/dust3r/datasets/arkitscenes.py and
scannetpp.py - global metadata npz (scenes, sceneids, images, intrinsics,
trajectories, pairs), per-frame jpg + mm-scaled png depth.
"""
from __future__ import annotations

import os.path as osp

import numpy as np

from .base.base_stereo_view_dataset import BaseStereoViewDataset
from ..utils.image import imread_cv2


class _MetadataPairsDataset(BaseStereoViewDataset):
    """Common machinery: one all_metadata.npz describing every frame and the
    selected training pairs."""

    dataset_label = "?"

    def __init__(self, *args, ROOT, **kwargs):
        self.ROOT = ROOT
        super().__init__(*args, **kwargs)
        self._load_data()

    def _metadata_dir(self):
        return self.ROOT

    def _load_data(self):
        with np.load(osp.join(self._metadata_dir(), "all_metadata.npz")) as d:
            self.scenes = d["scenes"]
            self.sceneids = d["sceneids"]
            self.images = d["images"]
            self.intrinsics = d["intrinsics"].astype(np.float32)
            self.trajectories = d["trajectories"].astype(np.float32)
            self.pairs = d["pairs"][:, :2].astype(int)

    def __len__(self):
        return len(self.pairs)

    def _rgb_path(self, scene_dir, basename):
        raise NotImplementedError

    def _depth_path(self, scene_dir, basename):
        raise NotImplementedError

    def _scene_dir(self, scene_id):
        return osp.join(self._metadata_dir(), self.scenes[scene_id])

    def _get_views(self, idx, resolution, rng):
        import cv2

        views = []
        for view_idx in self.pairs[idx]:
            scene_id = self.sceneids[view_idx]
            scene_dir = self._scene_dir(scene_id)
            intrinsics = self.intrinsics[view_idx]
            camera_pose = self.trajectories[view_idx]
            basename = self.images[view_idx]

            rgb_image = imread_cv2(self._rgb_path(scene_dir, basename))
            depthmap = imread_cv2(self._depth_path(scene_dir, basename),
                                  cv2.IMREAD_UNCHANGED)
            depthmap = depthmap.astype(np.float32) / 1000
            depthmap[~np.isfinite(depthmap)] = 0

            rgb_image, depthmap, intrinsics = self._crop_resize_if_necessary(
                rgb_image, depthmap, intrinsics, resolution, rng=rng,
                info=view_idx)

            views.append(dict(
                img=rgb_image,
                depthmap=depthmap.astype(np.float32),
                camera_pose=camera_pose.astype(np.float32),
                camera_intrinsics=intrinsics.astype(np.float32),
                dataset=self.dataset_label,
                label=self.scenes[scene_id] + "_" + basename,
                instance=f"{idx}_{view_idx}",
            ))
        return views


class ARKitScenes(_MetadataPairsDataset):
    dataset_label = "arkitscenes"

    def __init__(self, *args, split, ROOT, **kwargs):
        if split == "train":
            split = "Training"
        elif split == "test":
            split = "Test"
        else:
            raise ValueError(f"bad split={split}")
        super().__init__(*args, split=split, ROOT=ROOT, **kwargs)

    def _metadata_dir(self):
        return osp.join(self.ROOT, self.split)

    def _rgb_path(self, scene_dir, basename):
        return osp.join(scene_dir, "vga_wide", basename.replace(".png", ".jpg"))

    def _depth_path(self, scene_dir, basename):
        return osp.join(scene_dir, "lowres_depth", basename)


class ScanNetpp(_MetadataPairsDataset):
    dataset_label = "ScanNet++"

    def __init__(self, *args, ROOT, **kwargs):
        super().__init__(*args, ROOT=ROOT, **kwargs)
        assert self.split == "train"

    def _rgb_path(self, scene_dir, basename):
        return osp.join(scene_dir, "images", basename + ".jpg")

    def _depth_path(self, scene_dir, basename):
        return osp.join(scene_dir, "depth", basename + ".png")
