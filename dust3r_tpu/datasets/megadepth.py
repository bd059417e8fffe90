"""MegaDepth loader.

Behavioral contract: /root/reference/dust3r/datasets/megadepth.py - one
global `all_metadata.npz` with scene/image string tables and a structured
pair table (scene_id, im1_id, im2_id, score); scene strings are
"<landmark> <subscene>" resolving to nested directories; scenes 0015 and
0022 form the val split (held out of train).

NOTE the reference captures `split` as a keyword-only arg that SHADOWS the
base's (megadepth.py:17-29), so its self.split stays None and the
documented exclusion never fires; we forward it, implementing the
documented intent.
"""
from __future__ import annotations

import os.path as osp

import numpy as np

from .base.pair_table_dataset import PairTableDataset
from ..utils.image import imread_cv2

_VAL_SCENES = ("0015", "0022")


class MegaDepth(PairTableDataset):
    dataset_label = "MegaDepth"

    def __init__(self, *args, split, ROOT, **kwargs):
        self.ROOT = ROOT
        super().__init__(*args, split=split, **kwargs)
        with np.load(osp.join(ROOT, "all_metadata.npz")) as tables:
            self.all_scenes = tables["scenes"]
            self.all_images = tables["images"]
            self.pairs = tables["pairs"]
        if self.split is None:
            pass
        elif self.split == "train":
            self.select_scene(_VAL_SCENES, opposite=True)
        elif self.split == "val":
            self.select_scene(_VAL_SCENES)
        else:
            raise ValueError(f"bad split={self.split}")

    @property
    def n_scenes(self):
        return len(self.all_scenes)

    def get_stats(self):
        return f"{len(self)} pairs from {self.n_scenes} scenes"

    def select_scene(self, scene, *instances, opposite=False):
        """Restrict the pair table to scenes (and optionally images) whose
        names start with the given prefixes; opposite=True inverts."""
        prefixes = (scene,) if isinstance(scene, str) else tuple(scene)
        scene_hit = [s.startswith(prefixes) for s in self.all_scenes]
        assert any(scene_hit), "no scene found"
        keep = np.isin(self.pairs["scene_id"], np.nonzero(scene_hit)[0])
        if instances:
            image_ids = np.nonzero([im.startswith(instances)
                                    for im in self.all_images])[0]
            assert len(image_ids), "no instance found"
            hit1 = np.isin(self.pairs["im1_id"], image_ids)
            hit2 = np.isin(self.pairs["im2_id"], image_ids)
            # two instance prefixes pin both endpoints; one pins either
            keep &= (hit1 & hit2) if len(instances) == 2 else (hit1 | hit2)
        if opposite:
            keep = ~keep
        assert keep.any()
        self.pairs = self.pairs[keep]

    def _locate(self, row, rng):
        scene_id, im1, im2, _score = row
        landmark, subscene = self.all_scenes[scene_id].split()
        return osp.join(landmark, subscene), [int(im1), int(im2)]

    def _read_frame(self, label, frame, rng):
        name = self.all_images[frame]
        stem = osp.join(self.ROOT, label, name)
        try:
            img = imread_cv2(stem + ".jpg")
            depth = imread_cv2(stem + ".exr")
            cam = np.load(stem + ".npz")
        except Exception as e:
            raise OSError(f"cannot load {name}, got exception {e}")
        return dict(
            img=img,
            depthmap=depth,
            camera_pose=np.float32(cam["cam2world"]),
            camera_intrinsics=np.float32(cam["intrinsics"]),
            instance=name,
        )
