"""Host-side image loading & preprocessing.

Reproduces the reference preprocessing contract
(/root/reference/dust3r/utils/image.py:74-128): EXIF transpose, RGB, resize
(224: short side then center square crop; 512: long side then
patch-multiple center crop; square inputs cropped 3:4 unless square_ok),
normalize with mean/std 0.5.

Output arrays are NHWC float32 (TPU-native layout); `true_shape` is the
(H, W) of the stored array.
"""
from __future__ import annotations

import os

import numpy as np
import PIL.Image
from PIL.ImageOps import exif_transpose

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")


def _try_enable_heif() -> bool:
    try:
        import pillow_heif
    except ImportError:  # optional dependency, same as reference
        return False
    pillow_heif.register_heif_opener()
    return True


heif_support_enabled = _try_enable_heif()

_PLAIN_EXTS = (".jpg", ".jpeg", ".png")
_HEIF_EXTS = (".heic", ".heif")


def imread_cv2(path, options=None):
    """Open an image or depthmap with OpenCV (EXR-aware), RGB output.

    EXR decoding falls back to the built-in numpy codec (utils/exr.py)
    when cv2 is built without OpenEXR (common: the OPENCV_IO_ENABLE_OPENEXR
    opt-out era) - the reference pipeline stores all depthmaps as .exr."""
    import cv2

    flags = cv2.IMREAD_COLOR if options is None else options
    if path.lower().endswith(".exr"):
        depth = cv2.imread(path, cv2.IMREAD_ANYDEPTH)
        if depth is not None:
            return depth
        from .exr import read_exr
        return read_exr(path)
    decoded = cv2.imread(path, flags)
    if decoded is None:
        raise IOError(f"Could not load image={path} with options={flags}")
    return (cv2.cvtColor(decoded, cv2.COLOR_BGR2RGB)
            if decoded.ndim == 3 else decoded)


def img_to_arr(img):
    return imread_cv2(img) if isinstance(img, str) else img


def normalize_img(arr):
    """uint8 HWC -> float32 HWC in [-1, 1] (ImgNorm: mean=std=0.5)."""
    return (np.asarray(arr, dtype=np.float32) / 255.0 - 0.5) / 0.5


def rgb(ftensor, true_shape=None):
    """Undo ImgNorm for display: float NHWC/HWC in [-1,1] -> [0,1]."""
    if isinstance(ftensor, list):
        return [rgb(x, true_shape=true_shape) for x in ftensor]
    arr = np.asarray(ftensor)
    # accept channel-first layouts from torch-side callers
    if arr.ndim == 3 and arr.shape[0] == 3:
        arr = np.moveaxis(arr, 0, -1)
    elif arr.ndim == 4 and arr.shape[1] == 3:
        arr = np.moveaxis(arr, 1, -1)
    if true_shape is not None:
        arr = arr[: true_shape[0], : true_shape[1]]
    if arr.dtype == np.uint8:
        return (arr / np.float32(255)).clip(0, 1)
    return (arr * 0.5 + 0.5).clip(0, 1)


def _resize_long_edge(img: PIL.Image.Image, long_edge_size: int):
    longest = max(img.size)
    scale = long_edge_size / longest
    target = tuple(int(round(side * scale)) for side in img.size)
    resample = (PIL.Image.LANCZOS if longest > long_edge_size
                else PIL.Image.BICUBIC)
    return img.resize(target, resample)


def _center_crop_box(width, height, size, square_ok, patch_size):
    """Crop box (l, t, r, b) around the image center per the recipe."""
    cx, cy = width // 2, height // 2
    if size == 224:
        # largest centered square
        hw = hh = min(cx, cy)
    else:
        # largest centered patch-multiple rectangle; 3:4 if square
        hw = ((2 * cx) // patch_size) * patch_size / 2
        hh = ((2 * cy) // patch_size) * patch_size / 2
        if width == height and not square_ok:
            hh = 3 * hw / 4
    return (cx - hw, cy - hh, cx + hw, cy + hh)


def preprocess_pil(img: PIL.Image.Image, size: int, square_ok=False,
                   patch_size=16):
    """Resize+crop one PIL image per the reference recipe; returns PIL."""
    if size == 224:
        # short side lands on `size` (long edge = size * aspect)
        aspect = max(img.size) / min(img.size)
        resized = _resize_long_edge(img, round(size * aspect))
    else:
        resized = _resize_long_edge(img, size)
    box = _center_crop_box(*resized.size, size, square_ok, patch_size)
    return resized.crop(box)


def _iter_source_images(folder_or_list):
    """Yield (display_name, PIL image) pairs from a folder or mixed list."""
    if isinstance(folder_or_list, str):
        root = folder_or_list
        entries = sorted(os.listdir(root))
    elif isinstance(folder_or_list, list):
        root, entries = "", folder_or_list
    else:
        raise ValueError(f"bad folder_or_list={folder_or_list!r}")

    accepted = _PLAIN_EXTS + (_HEIF_EXTS if heif_support_enabled else ())
    for entry in entries:
        if isinstance(entry, PIL.Image.Image):
            yield "<PIL image>", entry
        elif str(entry).lower().endswith(accepted):
            yield entry, PIL.Image.open(os.path.join(root, entry))
    # non-image files are silently skipped, as in the reference


def load_images(folder_or_list, size, square_ok=False, verbose=True,
                patch_size=16):
    """Load a folder or list of image paths into model-ready view dicts.

    Each entry: {img: (1, H, W, 3) float32 in [-1, 1], true_shape:
    int32 [[H, W]], idx, instance}.
    """
    views = []
    for name, source in _iter_source_images(folder_or_list):
        upright = exif_transpose(source).convert("RGB")
        cropped = preprocess_pil(upright, size, square_ok, patch_size)
        if verbose:
            print(f" - adding {name} with resolution "
                  f"{upright.size[0]}x{upright.size[1]} --> "
                  f"{cropped.size[0]}x{cropped.size[1]}")
        width, height = cropped.size
        views.append(dict(
            img=normalize_img(np.asarray(cropped))[None],  # (1, H, W, 3)
            true_shape=np.int32([[height, width]]),
            idx=len(views),
            instance=str(len(views)),
        ))
    assert views, f"no images found at {folder_or_list}"
    if verbose:
        print(f" (Found {len(views)} images)")
    return views
