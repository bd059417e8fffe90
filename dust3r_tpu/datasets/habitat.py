"""Habitat loader (reference dust3r/datasets/habitat.py).

Disk layout: ROOT/Habitat_{size}_scenes_{split}.txt listing scene keys;
per-view <key>_<i>.jpeg + <key>_<i>_depth.exr +
<key>_<i>_camera_params.json. View 0 is connected with all other views;
broken views (non-finite pose) are skipped by advancing to the next index.
"""
from __future__ import annotations

import json
import os.path as osp

import numpy as np
from PIL import Image

from .base.base_stereo_view_dataset import BaseStereoViewDataset


class Habitat(BaseStereoViewDataset):
    def __init__(self, size, *args, ROOT, **kwargs):
        self.ROOT = ROOT
        super().__init__(*args, **kwargs)
        assert self.split is not None
        with open(osp.join(self.ROOT,
                           f"Habitat_{size}_scenes_{self.split}.txt")) as f:
            self.scenes = f.read().splitlines()
        self.instances = list(range(1, 5))

    def filter_scene(self, label, instance=None):
        if instance:
            subscene, instance = instance.split("_")
            label += "/" + subscene
            self.instances = [int(instance) - 1]
        valid = np.bool_([scene.startswith(label) for scene in self.scenes])
        assert sum(valid), f"no scene was selected for {label=} {instance=}"
        self.scenes = [s for i, s in enumerate(self.scenes) if valid[i]]

    def _get_views(self, idx, resolution, rng):
        scene = self.scenes[idx]
        data_path, key = osp.split(osp.join(self.ROOT, scene))
        views = []
        two_random_views = [0, rng.choice(self.instances)]
        for view_index in two_random_views:
            # use the next view if this one is broken
            for ii in range(view_index, view_index + 5):
                image, depthmap, intrinsics, camera_pose = \
                    self._load_one_view(data_path, key, ii % 5, resolution, rng)
                if np.isfinite(camera_pose).all():
                    break
            views.append(dict(
                img=image, depthmap=depthmap, camera_pose=camera_pose,
                camera_intrinsics=intrinsics, dataset="Habitat",
                label=osp.relpath(data_path, self.ROOT),
                instance=f"{key}_{view_index}"))
        return views

    def _load_one_view(self, data_path, key, view_index, resolution, rng):
        from ..utils.image import imread_cv2

        view_index += 1  # file indices start at 1
        impath = osp.join(data_path, f"{key}_{view_index}.jpeg")
        image = Image.open(impath)

        depthmap = imread_cv2(
            osp.join(data_path, f"{key}_{view_index}_depth.exr"))

        with open(osp.join(data_path,
                           f"{key}_{view_index}_camera_params.json")) as f:
            camera_params = json.load(f)

        intrinsics = np.float32(camera_params["camera_intrinsics"])
        camera_pose = np.eye(4, dtype=np.float32)
        camera_pose[:3, :3] = camera_params["R_cam2world"]
        camera_pose[:3, 3] = camera_params["t_cam2world"]

        image, depthmap, intrinsics = self._crop_resize_if_necessary(
            image, depthmap, intrinsics, resolution, rng, info=impath)
        return image, depthmap, intrinsics, camera_pose
