"""BlendedMVS loader.

Behavioral contract: /root/reference/dust3r/datasets/blendedmvs.py - the
pair table is `blendedmvs_pairs.npy` (structured: seq_high/seq_low ids,
two frame numbers, an overlap score); sequences hash to directories named
by the 24-hex-digit concatenation of the two ids; train/val split by
seq_low mod 10 (val keeps every 10th scene). Cameras come as separate
R/t arrays rather than a 4x4.
"""
from __future__ import annotations

import os.path as osp

import numpy as np

from .base.pair_table_dataset import PairTableDataset
from ..utils.image import imread_cv2

_SPLIT_MOD = 10  # seq_low % 10 == 0 -> val scene, else train


class BlendedMVS(PairTableDataset):
    """Outdoor multi-view stereo scenes."""

    dataset_label = "BlendedMVS"

    def __init__(self, *args, ROOT, split=None, **kwargs):
        self.ROOT = ROOT
        super().__init__(*args, **kwargs)
        table = np.load(osp.join(ROOT, "blendedmvs_pairs.npy"))
        if split is not None:
            in_val = (table["seq_low"] % _SPLIT_MOD) == 0
            keep = {"train": ~in_val, "val": in_val}
            if split not in keep:
                raise ValueError(f"bad split={split}")
            table = table[keep[split]]
        self.pairs = table

    @property
    def n_scenes(self):
        return len(np.unique(self.pairs["seq_low"]))

    def _locate(self, row, rng):
        seqh, seql, img1, img2, _score = row
        return f"{seqh:08x}{seql:016x}", [int(img1), int(img2)]

    def _read_frame(self, label, frame, rng):
        stem = osp.join(self.ROOT, label, f"{frame:08n}")
        cam = np.load(stem + ".npz")
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = cam["R_cam2world"]
        pose[:3, 3] = cam["t_cam2world"]
        return dict(
            img=imread_cv2(stem + ".jpg"),
            depthmap=imread_cv2(stem + ".exr"),
            camera_pose=pose,
            camera_intrinsics=np.float32(cam["intrinsics"]),
            instance=f"{frame:08n}",
        )
