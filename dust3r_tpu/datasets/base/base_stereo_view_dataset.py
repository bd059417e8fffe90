"""Base class for stereo-view training datasets.

Behavioral contract:
/root/reference/dust3r/datasets/base/base_stereo_view_dataset.py:17-221.
Subclasses implement `_get_views(idx, resolution, rng)` returning two view
dicts with {img (PIL), depthmap, camera_pose (c2w), camera_intrinsics,
dataset, label, instance}; the base computes pts3d + valid_mask, applies
the image transform (NHWC float32 - the TPU layout), transposes portrait
views to landscape storage and records RNG state for reproducibility.
"""
from __future__ import annotations

import numpy as np
import PIL.Image

from .easy_dataset import EasyDataset
from ..utils.transforms import ImgNorm
from ..utils import cropping
from ...utils.geometry import depthmap_to_absolute_camera_coordinates

_VIEW_VALUE_DTYPES = (np.float32, bool, np.bool_, np.int32, np.int64,
                      np.uint8)


class BaseStereoViewDataset(EasyDataset):
    def __init__(self, *, split=None, resolution=None, transform=ImgNorm,
                 aug_crop=False, seed=None):
        self.num_views = 2
        self.split = split
        self._set_resolutions(resolution)
        if isinstance(transform, str):
            from ..utils.transforms import TRANSFORM_DSL_NAMES
            transform = TRANSFORM_DSL_NAMES[transform]
        self.transform = transform
        self.aug_crop = aug_crop
        self.seed = seed

    def __len__(self):
        return len(self.scenes)

    def get_stats(self):
        return f"{len(self)} pairs"

    def __repr__(self):
        res = "[" + ";".join(f"{w}x{h}" for w, h in self._resolutions) + "]"
        return (f"{type(self).__name__}({self.get_stats()}, split={self.split}, "
                f"seed={self.seed}, resolutions={res})")

    def _get_views(self, idx, resolution, rng):
        raise NotImplementedError

    # -- per-item pipeline ------------------------------------------------

    def _item_rng(self, idx):
        """Per-item generator: seeded datasets are reproducible per index;
        unseeded ones keep one worker-local stream."""
        if self.seed:
            self._rng = np.random.default_rng(seed=self.seed + idx)
        elif not hasattr(self, "_rng"):
            entropy = np.random.SeedSequence().entropy % (2 ** 63)
            self._rng = np.random.default_rng(seed=int(entropy))
        return self._rng

    def _finalize_view(self, view, view_idx):
        """Transform the image, derive pts3d/valid_mask, validate dtypes."""
        assert not ({"pts3d", "valid_mask"} & view.keys()), \
            "pts3d/valid_mask are computed here from depth+K+pose"

        pil = view["img"]
        view["true_shape"] = np.int32((pil.size[1], pil.size[0]))  # (H, W)
        view["img"] = self.transform(pil)  # (H, W, 3) float32

        assert "camera_intrinsics" in view
        if "camera_pose" in view:
            assert np.isfinite(view["camera_pose"]).all(), \
                f"NaN in camera pose for view {view_name(view)}"
        else:
            view["camera_pose"] = np.full((4, 4), np.nan, np.float32)
        pose = view["camera_pose"]
        assert np.isfinite(view["depthmap"]).all(), \
            f"NaN in depthmap for view {view_name(view)}"

        pts3d, valid = depthmap_to_absolute_camera_coordinates(
            view["depthmap"], view["camera_intrinsics"], pose)
        pts3d = np.asarray(pts3d)
        view["pts3d"] = pts3d
        view["valid_mask"] = np.asarray(valid) & np.isfinite(pts3d).all(-1)

        for key, val in view.items():
            good, err = is_good_type(key, val)
            assert good, f"{err} with {key}={val} for {view_name(view)}"

    def __getitem__(self, idx):
        if isinstance(idx, tuple):
            idx, ar_idx = idx
        else:
            assert len(self._resolutions) == 1
            ar_idx = 0

        rng = self._item_rng(idx)
        views = self._get_views(idx, self._resolutions[ar_idx], rng)
        assert len(views) == self.num_views

        for v, view in enumerate(views):
            view["idx"] = (idx, ar_idx, v)
            self._finalize_view(view, v)

        for view in views:
            transpose_to_landscape(view)
            view["rng"] = int.from_bytes(rng.bytes(4), "big")
        return views

    def _set_resolutions(self, resolutions):
        assert resolutions is not None, "undefined resolution"
        if not isinstance(resolutions, list):
            resolutions = [resolutions]
        parsed = [(r, r) if isinstance(r, int) else tuple(r)
                  for r in resolutions]
        for width, height in parsed:
            assert isinstance(width, int) and isinstance(height, int)
            assert width >= height, "landscape-ordered (W, H) expected"
        self._resolutions = parsed

    def _crop_resize_if_necessary(self, image, depthmap, intrinsics,
                                  resolution, rng=None, info=None):
        """Principal-point-centered crop -> Lanczos rescale (+aug_crop
        jitter) -> intrinsics-consistent final crop."""
        if not isinstance(image, PIL.Image.Image):
            image = PIL.Image.fromarray(image)

        # 1) largest crop centered on the principal point
        pp = intrinsics[:2, 2].round().astype(int)
        margin = np.minimum(pp, np.array(image.size) - pp)
        center_box = (*(pp - margin), *(pp + margin))
        image, depthmap, intrinsics = cropping.crop_image_depthmap(
            image, depthmap, intrinsics, center_box)

        # 2) pick the target orientation (portrait flips it; near-square
        #    inputs coin-flip so both orientations are trained)
        assert resolution[0] >= resolution[1]
        aspect = image.size[1] / image.size[0]  # H / W
        if aspect > 1.1:
            resolution = resolution[::-1]
        elif 0.9 < aspect < 1.1 and resolution[0] != resolution[1]:
            if rng.integers(2):
                resolution = resolution[::-1]

        # 3) rescale (with optional crop-augmentation headroom)
        target_resolution = np.array(resolution)
        if self.aug_crop > 1:
            target_resolution += rng.integers(0, self.aug_crop)
        image, depthmap, intrinsics = cropping.rescale_image_depthmap(
            image, depthmap, intrinsics, target_resolution)

        # 4) final crop placed so the output intrinsics stay consistent
        intrinsics2 = cropping.camera_matrix_of_crop(
            intrinsics, image.size, resolution, offset_factor=0.5)
        crop_bbox = cropping.bbox_from_intrinsics_in_out(
            intrinsics, intrinsics2, resolution)
        return cropping.crop_image_depthmap(
            image, depthmap, intrinsics, crop_bbox)


def is_good_type(key, v):
    if isinstance(v, (str, int, tuple)):
        return True, None
    if v.dtype not in _VIEW_VALUE_DTYPES:
        return False, f"bad dtype={v.dtype}"
    return True, None


def view_name(view, batch_index=None):
    def sel(x):
        return x[batch_index] if batch_index not in (None, slice(None)) else x
    return f"{sel(view['dataset'])}/{sel(view['label'])}/{sel(view['instance'])}"


def transpose_to_landscape(view):
    """Store portrait views transposed so batches are shape-uniform
    (exactly the reference's storage scheme,
    base_stereo_view_dataset.py:200-219). `true_shape` keeps the real
    orientation; the training loop attaches per-sample `is_portrait`
    flags (training.add_manyar_flags) and the model processes flagged
    samples at TRUE orientation via its static ManyAR path
    (models/model.py encode/_head_manyar - reference
    dust3r/patch_embed.py:32-70, utils/misc.py:54-100).

    NHWC layout: img is (H, W, 3).
    """
    height, width = view["true_shape"]
    if width < height:
        for key in ("img", "valid_mask", "depthmap", "pts3d"):
            view[key] = view[key].swapaxes(0, 1)
        view["camera_intrinsics"] = view["camera_intrinsics"][[1, 0, 2]]
