"""Habitat (pre-rendered crossview pairs) loader.

Behavioral contract: /root/reference/dust3r/datasets/habitat.py — each
scene key names a rendered 5-view fan where view 1 overlaps every other
view; a sample pairs view 1 with one random view of 2..5; views whose
stored pose is non-finite (renderer failures) are skipped by walking to
the next view cyclically.

Disk layout (produced by datasets_preprocess/preprocess_habitat.py):
  ROOT/Habitat_{size}_scenes_{split}.txt   one scene key per line
  <scene dir>/<key>_{v}.jpeg               rgb, v in 1..5
  <scene dir>/<key>_{v}_depth.exr          metric depth
  <scene dir>/<key>_{v}_camera_params.json intrinsics + R/t cam2world
"""
from __future__ import annotations

import json
import os.path as osp

import numpy as np
from PIL import Image

from .base.base_stereo_view_dataset import BaseStereoViewDataset

_N_VIEWS = 5  # views per rendered fan; the hub view (file index 1) sees all


class Habitat(BaseStereoViewDataset):
    LAYOUT = dict(
        img="{key}_{v}.jpeg",
        depth="{key}_{v}_depth.exr",
        cam="{key}_{v}_camera_params.json",
    )

    def __init__(self, size, *args, ROOT, **kwargs):
        self.ROOT = ROOT
        super().__init__(*args, **kwargs)
        assert self.split is not None
        index_file = osp.join(ROOT, f"Habitat_{size}_scenes_{self.split}.txt")
        with open(index_file) as f:
            self.scenes = f.read().splitlines()
        # candidate partners for the hub view: 0-based view slots 1..4
        self.instances = list(range(1, _N_VIEWS))

    def filter_scene(self, label, instance=None):
        """Restrict to scenes under `label`; an instance string
        "<subscene>_<view>" additionally pins the partner view."""
        if instance:
            subscene, view = instance.split("_")
            label = f"{label}/{subscene}"
            self.instances = [int(view) - 1]
        kept = [s for s in self.scenes if s.startswith(label)]
        assert kept, f"no scene was selected for {label=} {instance=}"
        self.scenes = kept

    def _frame_path(self, kind, scene_dir, key, slot):
        # slot is 0-based; files are numbered from 1
        return osp.join(scene_dir,
                        self.LAYOUT[kind].format(key=key, v=slot + 1))

    def _read_frame(self, scene_dir, key, slot, resolution, rng):
        """One rendered view -> (view dict, finite-pose flag)."""
        from ..utils.image import imread_cv2

        impath = self._frame_path("img", scene_dir, key, slot)
        image = Image.open(impath)
        depthmap = imread_cv2(self._frame_path("depth", scene_dir, key, slot))
        with open(self._frame_path("cam", scene_dir, key, slot)) as f:
            cam = json.load(f)

        intrinsics = np.float32(cam["camera_intrinsics"])
        camera_pose = np.eye(4, dtype=np.float32)
        camera_pose[:3, :3] = cam["R_cam2world"]
        camera_pose[:3, 3] = cam["t_cam2world"]

        image, depthmap, intrinsics = self._crop_resize_if_necessary(
            image, depthmap, intrinsics, resolution, rng, info=impath)
        view = dict(
            img=image,
            depthmap=depthmap,
            camera_pose=camera_pose,  # cam2world
            camera_intrinsics=intrinsics,
            dataset="Habitat",
            label=osp.relpath(scene_dir, self.ROOT),
            instance=f"{key}_{slot}",
        )
        return view, bool(np.isfinite(camera_pose).all())

    def _get_views(self, idx, resolution, rng):
        scene_dir, key = osp.split(osp.join(self.ROOT, self.scenes[idx]))
        pair = (0, rng.choice(self.instances))  # hub + one random partner
        views = []
        for slot in pair:
            # walk forward (cyclically) past any broken renders
            for step in range(_N_VIEWS):
                view, ok = self._read_frame(
                    scene_dir, key, (slot + step) % _N_VIEWS, resolution, rng)
                if ok:
                    break
            # the reference records the REQUESTED slot, not the resolved one
            view["instance"] = f"{key}_{slot}"
            views.append(view)
        return views
