"""Joint image/depth/intrinsics rescale + crop (host-side, PIL/cv2).

Behavioral contract: /root/reference/dust3r/datasets/utils/cropping.py
(Lanczos downscale / bicubic upscale for RGB, NEAREST for depth, principal
point bookkeeping through the colmap<->opencv half-pixel convention).
"""
from __future__ import annotations

import os

import numpy as np
import PIL.Image

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

from ...utils.geometry import (colmap_to_opencv_intrinsics,
                               opencv_to_colmap_intrinsics)

try:
    LANCZOS = PIL.Image.Resampling.LANCZOS
    BICUBIC = PIL.Image.Resampling.BICUBIC
except AttributeError:  # older PIL
    LANCZOS = PIL.Image.LANCZOS
    BICUBIC = PIL.Image.BICUBIC


def _to_pil(image):
    if isinstance(image, PIL.Image.Image):
        return image
    return PIL.Image.fromarray(image)


def rescale_image_depthmap(image, depthmap, camera_intrinsics,
                           output_resolution, force=True):
    """Rescale so the image covers output_resolution (keeps aspect).

    `image` may be a single PIL/array or a tuple/list of same-size images
    (all resized jointly, reference ImageList semantics)."""
    import cv2

    multi = isinstance(image, (tuple, list))
    images = [_to_pil(im) for im in (image if multi else [image])]
    assert all(im.size == images[0].size for im in images)
    input_resolution = np.array(images[0].size)  # (W, H)
    output_resolution = np.array(output_resolution)
    if depthmap is not None:
        assert tuple(depthmap.shape[:2]) == images[0].size[::-1]

    scale_final = max(output_resolution / images[0].size) + 1e-8
    if scale_final >= 1 and not force:
        return (tuple(images) if multi else images[0]), depthmap, \
            camera_intrinsics
    output_resolution = np.floor(input_resolution * scale_final).astype(int)

    resample = LANCZOS if scale_final < 1 else BICUBIC
    images = [im.resize(tuple(output_resolution), resample=resample)
              for im in images]
    if depthmap is not None:
        depthmap = cv2.resize(depthmap, tuple(output_resolution),
                              fx=scale_final, fy=scale_final,
                              interpolation=cv2.INTER_NEAREST)

    camera_intrinsics = camera_matrix_of_crop(
        camera_intrinsics, input_resolution, output_resolution,
        scaling=scale_final)
    return (tuple(images) if multi else images[0]), depthmap, \
        camera_intrinsics


def camera_matrix_of_crop(input_camera_matrix, input_resolution,
                          output_resolution, scaling=1, offset_factor=0.5,
                          offset=None):
    margins = np.asarray(input_resolution) * scaling - output_resolution
    assert np.all(margins >= 0.0)
    if offset is None:
        offset = offset_factor * margins

    K = opencv_to_colmap_intrinsics(np.asarray(input_camera_matrix))
    K[:2, :] *= scaling
    K[:2, 2] -= offset
    return colmap_to_opencv_intrinsics(K)


def crop_image_depthmap(image, depthmap, camera_intrinsics, crop_bbox):
    image = _to_pil(image)
    l, t, r, b = crop_bbox
    image = image.crop((l, t, r, b))
    depthmap = depthmap[t:b, l:r]
    camera_intrinsics = np.array(camera_intrinsics)
    camera_intrinsics[0, 2] -= l
    camera_intrinsics[1, 2] -= t
    return image, depthmap, camera_intrinsics


def bbox_from_intrinsics_in_out(input_camera_matrix, output_camera_matrix,
                                output_resolution):
    out_width, out_height = output_resolution
    l, t = np.int32(np.round(input_camera_matrix[:2, 2]
                             - output_camera_matrix[:2, 2]))
    return (l, t, l + out_width, t + out_height)
