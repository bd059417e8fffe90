"""Waymo Open Dataset loader.

Behavioral contract: /root/reference/dust3r/datasets/waymo.py - one global
`waymo_pairs.npz` holds the scene-name and frame-name string tables plus
an integer pair table (scene_id, frame1_id, frame2_id) indexing into them;
per-frame files are <scene>/<frame>.{jpg,exr,npz} with a 4x4 cam2world.
"""
from __future__ import annotations

import os.path as osp

import numpy as np

from .base.pair_table_dataset import PairTableDataset
from ..utils.image import imread_cv2


class Waymo(PairTableDataset):
    """Outdoor driving scenes."""

    dataset_label = "Waymo"

    def __init__(self, *args, ROOT, **kwargs):
        self.ROOT = ROOT
        super().__init__(*args, **kwargs)
        with np.load(osp.join(ROOT, "waymo_pairs.npz")) as tables:
            self.scenes = tables["scenes"]
            self.frames = tables["frames"]
            self.pairs = tables["pairs"]
        assert self.pairs[:, 0].max() == len(self.scenes) - 1

    @property
    def n_scenes(self):
        return len(self.scenes)

    def _locate(self, row, rng):
        scene_id, f1, f2 = row
        return str(self.scenes[scene_id]), [str(self.frames[f1]),
                                            str(self.frames[f2])]

    def _read_frame(self, label, frame, rng):
        stem = osp.join(self.ROOT, label, frame)
        cam = np.load(stem + ".npz")
        return dict(
            img=imread_cv2(stem + ".jpg"),
            depthmap=imread_cv2(stem + ".exr"),
            camera_pose=np.float32(cam["cam2world"]),
            camera_intrinsics=np.float32(cam["intrinsics"]),
            instance=frame,
        )
