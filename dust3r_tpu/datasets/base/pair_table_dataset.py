"""Shared skeleton for pair-table datasets.

Four of the runtime loaders (BlendedMVS, MegaDepth, Waymo,
StaticThings3D - reference dust3r/datasets/{blendedmvs,megadepth,waymo,
staticthings3d}.py) are structurally identical: an offline preprocess
script left a global table of image pairs on disk, and serving a sample
means resolving one table row to two frame files (rgb + EXR depth + npz
camera), reading them, and pushing both through the base crop/resize
pipeline. This base class owns that skeleton once; subclasses only
describe their table and file naming.

Subclass contract:
  * set `self.pairs` (indexable table of pair rows) during __init__
  * `dataset_label` - the `dataset` field stamped on every view
  * `_locate(row, rng)` -> (label, [frame, frame]): resolve one table row
    to the sequence label (also the view `label` field) and two opaque
    frame descriptors. Per-PAIR random choices belong here.
  * `_read_frame(label, frame, rng)` -> dict with img, depthmap,
    camera_pose, camera_intrinsics, instance (raw, full resolution).
    Per-FRAME random choices belong here.
"""
from __future__ import annotations

from .base_stereo_view_dataset import BaseStereoViewDataset


class PairTableDataset(BaseStereoViewDataset):
    dataset_label: str = None

    @property
    def n_scenes(self):
        """For get_stats; subclasses with a scene table override."""
        return None

    def __len__(self):
        return len(self.pairs)

    def get_stats(self):
        n = self.n_scenes
        scenes = f" from {n} scenes" if n is not None else ""
        return f"{len(self)} pairs{scenes}"

    def _get_views(self, pair_idx, resolution, rng):
        label, frames = self._locate(self.pairs[pair_idx], rng)
        views = []
        for frame in frames:
            raw = self._read_frame(label, frame, rng)
            img, depth, K = self._crop_resize_if_necessary(
                raw["img"], raw["depthmap"], raw["camera_intrinsics"],
                resolution, rng, info=(label, raw["instance"]))
            views.append(dict(
                img=img,
                depthmap=depth,
                camera_pose=raw["camera_pose"],  # cam2world
                camera_intrinsics=K,
                dataset=self.dataset_label,
                label=label,
                instance=raw["instance"],
            ))
        return views
