"""Co3D_v2 dataset loader.

Behavioral contract: /root/reference/dust3r/datasets/co3d.py (npz pair
metadata, jpg images + png depth (mm/16-bit scaled by depth_max), optional
background masking with mask_bg in {True, False, 'rand'}, +-4-frame pair
jitter, zero-depth invalidation with neighbor retry).

Expected disk layout (produced by datasets_preprocess/preprocess_co3d.py):
  ROOT/selected_seqs_{split}.json
  ROOT/{category}/{sequence}/images/frame{:06d}.jpg
  ROOT/{category}/{sequence}/depths/frame{:06d}.jpg.geometric.png
  ROOT/{category}/{sequence}/masks/frame{:06d}.png
  ROOT/{category}/{sequence}/images/frame{:06d}.npz  (camera_intrinsics,
      camera_pose, maximum_depth)
"""
from __future__ import annotations

import itertools
import json
import os.path as osp
from collections import deque

import numpy as np

from .base.base_stereo_view_dataset import BaseStereoViewDataset
from ..utils.image import imread_cv2


class Co3d(BaseStereoViewDataset):
    def __init__(self, mask_bg=True, *args, ROOT, **kwargs):
        self.ROOT = ROOT
        super().__init__(*args, **kwargs)
        assert mask_bg in (True, False, "rand")
        self.mask_bg = mask_bg
        self.dataset_label = "Co3d_v2"

        # load all scenes
        with open(osp.join(self.ROOT,
                           f"selected_seqs_{self.split}.json"), "r") as f:
            self.scenes = json.load(f)
            self.scenes = {k: v for k, v in self.scenes.items() if len(v) > 0}
            self.scenes = {(k, k2): v2 for k, v in self.scenes.items()
                           for k2, v2 in v.items()}
        self.scene_list = list(self.scenes.keys())

        # each scene contributes 100 pairs from 4 cyclic groups x 25 frames
        # at ~77-degree apart viewpoints
        self.combinations = [(i, j)
                             for i, j in itertools.combinations(range(100), 2)
                             if 0 < abs(i - j) <= 30 and abs(i - j) % 5 == 0]
        self.invalidate = {scene: {} for scene in self.scene_list}

    def __len__(self):
        return len(self.scene_list) * len(self.combinations)

    def _get_metadatapath(self, obj, instance, view_idx):
        return osp.join(self.ROOT, obj, instance, "images",
                        f"frame{view_idx:06n}.npz")

    def _get_impath(self, obj, instance, view_idx):
        return osp.join(self.ROOT, obj, instance, "images",
                        f"frame{view_idx:06n}.jpg")

    def _get_depthpath(self, obj, instance, view_idx):
        return osp.join(self.ROOT, obj, instance, "depths",
                        f"frame{view_idx:06n}.jpg.geometric.png")

    def _get_maskpath(self, obj, instance, view_idx):
        return osp.join(self.ROOT, obj, instance, "masks",
                        f"frame{view_idx:06n}.png")

    def _read_depthmap(self, depthpath, input_metadata):
        import cv2

        depthmap = imread_cv2(depthpath, cv2.IMREAD_UNCHANGED)
        depthmap = (depthmap.astype(np.float32) / 65535
                    * np.nan_to_num(input_metadata["maximum_depth"]))
        return depthmap.astype(np.float32)

    def _get_views(self, idx, resolution, rng):
        import cv2

        obj, instance = self.scene_list[idx // len(self.combinations)]
        image_pool = self.scenes[obj, instance]
        im1_idx, im2_idx = self.combinations[idx % len(self.combinations)]

        # jitter the pair by +-4 frames
        last = len(image_pool) - 1
        if resolution not in self.invalidate[obj, instance]:
            self.invalidate[obj, instance][resolution] = \
                [False] * len(image_pool)

        views = []
        imgs_idxs = [max(0, min(im_idx + int(rng.integers(-4, 5)), last))
                     for im_idx in (im2_idx, im1_idx)]
        imgs_idxs = deque(imgs_idxs)
        while len(imgs_idxs) > 0:
            im_idx = imgs_idxs.popleft()
            if self.invalidate[obj, instance][resolution][im_idx]:
                # revalidate: search a valid neighbor
                ordered = [x for x in range(len(image_pool))
                           if not self.invalidate[obj, instance][resolution][x]]
                if len(ordered) == 0:
                    raise ValueError(f"All views invalid in {obj}/{instance}")
                im_idx = min(ordered, key=lambda x: abs(x - im_idx))

            view_idx = image_pool[im_idx]
            impath = self._get_impath(obj, instance, view_idx)
            depthpath = self._get_depthpath(obj, instance, view_idx)
            metadata_path = self._get_metadatapath(obj, instance, view_idx)

            input_metadata = np.load(metadata_path)
            camera_pose = input_metadata["camera_pose"].astype(np.float32)
            intrinsics = input_metadata["camera_intrinsics"].astype(np.float32)

            rgb_image = imread_cv2(impath)
            depthmap = self._read_depthmap(depthpath, input_metadata)

            if self.mask_bg:
                maskpath = self._get_maskpath(obj, instance, view_idx)
                maskmap = imread_cv2(maskpath, cv2.IMREAD_UNCHANGED)
                maskmap = (maskmap.astype(np.float32) / 255) > 0.1
                if self.mask_bg != "rand" or rng.integers(2):
                    depthmap = depthmap * maskmap

            rgb_image, depthmap, intrinsics = self._crop_resize_if_necessary(
                rgb_image, depthmap, intrinsics, resolution, rng=rng,
                info=impath)

            num_valid = (depthmap > 0.0).sum()
            if num_valid == 0:
                # invalidate and retry with a neighbor
                self.invalidate[obj, instance][resolution][im_idx] = True
                imgs_idxs.append(im_idx)
                continue

            views.append(dict(
                img=rgb_image,
                depthmap=depthmap,
                camera_pose=camera_pose,
                camera_intrinsics=intrinsics,
                dataset=self.dataset_label,
                label=osp.join(obj, instance),
                instance=osp.split(impath)[1],
            ))
        return views


class WildRGBD(Co3d):
    """WildRGB-D: same layout as Co3d with metric depth in mm
    (reference dust3r/datasets/wildrgbd.py)."""

    def __init__(self, mask_bg=True, *args, ROOT, **kwargs):
        super().__init__(mask_bg, *args, ROOT=ROOT, **kwargs)
        self.dataset_label = "WildRGBD"

    def _get_metadatapath(self, obj, instance, view_idx):
        return osp.join(self.ROOT, obj, instance, "metadata",
                        f"{view_idx:0>5d}.npz")

    def _get_impath(self, obj, instance, view_idx):
        return osp.join(self.ROOT, obj, instance, "rgb",
                        f"{view_idx:0>5d}.jpg")

    def _get_depthpath(self, obj, instance, view_idx):
        return osp.join(self.ROOT, obj, instance, "depth",
                        f"{view_idx:0>5d}.png")

    def _get_maskpath(self, obj, instance, view_idx):
        return osp.join(self.ROOT, obj, instance, "masks",
                        f"{view_idx:0>5d}.png")

    def _read_depthmap(self, depthpath, input_metadata):
        import cv2

        depthmap = imread_cv2(depthpath, cv2.IMREAD_UNCHANGED)
        return depthmap.astype(np.float32) / 1000.0
