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

try:
    from pillow_heif import register_heif_opener

    register_heif_opener()
    heif_support_enabled = True
except ImportError:  # optional dependency, same as reference
    heif_support_enabled = False


def imread_cv2(path, options=None):
    """Open an image or depthmap with OpenCV (EXR-aware), RGB output.

    EXR decoding falls back to the built-in numpy codec (utils/exr.py)
    when cv2 is built without OpenEXR (common: the OPENCV_IO_ENABLE_OPENEXR
    opt-out era) - the reference pipeline stores all depthmaps as .exr."""
    import cv2

    if options is None:
        options = cv2.IMREAD_COLOR
    if path.lower().endswith(".exr"):
        img = cv2.imread(path, cv2.IMREAD_ANYDEPTH)
        if img is None:
            from .exr import read_exr
            img = read_exr(path)
        return img
    img = cv2.imread(path, options)
    if img is None:
        raise IOError(f"Could not load image={path} with {options=}")
    if img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img


def img_to_arr(img):
    if isinstance(img, str):
        img = imread_cv2(img)
    return img


def normalize_img(arr):
    """uint8 HWC -> float32 HWC in [-1, 1] (ImgNorm: mean=std=0.5)."""
    return (np.asarray(arr, dtype=np.float32) / 255.0 - 0.5) / 0.5


def rgb(ftensor, true_shape=None):
    """Undo ImgNorm for display: float NHWC/HWC in [-1,1] -> [0,1]."""
    if isinstance(ftensor, list):
        return [rgb(x, true_shape=true_shape) for x in ftensor]
    ftensor = np.asarray(ftensor)
    if ftensor.ndim == 3 and ftensor.shape[0] == 3:
        ftensor = ftensor.transpose(1, 2, 0)
    elif ftensor.ndim == 4 and ftensor.shape[1] == 3:
        ftensor = ftensor.transpose(0, 2, 3, 1)
    if true_shape is not None:
        H, W = true_shape
        ftensor = ftensor[:H, :W]
    if ftensor.dtype == np.uint8:
        img = np.float32(ftensor) / 255
    else:
        img = (ftensor * 0.5) + 0.5
    return img.clip(0, 1)


def _resize_long_edge(img: PIL.Image.Image, long_edge_size: int):
    S = max(img.size)
    interp = PIL.Image.LANCZOS if S > long_edge_size else PIL.Image.BICUBIC
    new_size = tuple(int(round(x * long_edge_size / S)) for x in img.size)
    return img.resize(new_size, interp)


def preprocess_pil(img: PIL.Image.Image, size: int, square_ok=False,
                   patch_size=16):
    """Resize+crop one PIL image per the reference recipe; returns PIL."""
    W1, H1 = img.size
    if size == 224:
        # short side to `size`, then center square crop
        img = _resize_long_edge(img, round(size * max(W1 / H1, H1 / W1)))
    else:
        img = _resize_long_edge(img, size)
    W, H = img.size
    cx, cy = W // 2, H // 2
    if size == 224:
        half = min(cx, cy)
        img = img.crop((cx - half, cy - half, cx + half, cy + half))
    else:
        halfw = ((2 * cx) // patch_size) * patch_size / 2
        halfh = ((2 * cy) // patch_size) * patch_size / 2
        if not square_ok and W == H:
            halfh = 3 * halfw / 4
        img = img.crop((cx - halfw, cy - halfh, cx + halfw, cy + halfh))
    return img


def load_images(folder_or_list, size, square_ok=False, verbose=True,
                patch_size=16):
    """Load a folder or list of image paths into model-ready view dicts.

    Each entry: {img: (1, H, W, 3) float32 in [-1, 1], true_shape:
    int32 [[H, W]], idx, instance}.
    """
    if isinstance(folder_or_list, str):
        root = folder_or_list
        content = sorted(os.listdir(folder_or_list))
    elif isinstance(folder_or_list, list):
        root, content = "", folder_or_list
    else:
        raise ValueError(f"bad folder_or_list={folder_or_list!r}")

    exts = [".jpg", ".jpeg", ".png"]
    if heif_support_enabled:
        exts += [".heic", ".heif"]

    imgs = []
    for path in content:
        if isinstance(path, PIL.Image.Image):
            img = path
        else:
            if not str(path).lower().endswith(tuple(exts)):
                continue
            img = PIL.Image.open(os.path.join(root, path))
        img = exif_transpose(img).convert("RGB")
        W1, H1 = img.size
        img = preprocess_pil(img, size, square_ok, patch_size)
        W2, H2 = img.size
        if verbose:
            print(f" - adding {path} with resolution {W1}x{H1} --> {W2}x{H2}")
        arr = normalize_img(np.asarray(img))[None]  # (1, H, W, 3)
        imgs.append(dict(img=arr, true_shape=np.int32([[H2, W2]]),
                         idx=len(imgs), instance=str(len(imgs))))
    assert imgs, f"no images found at {root}"
    if verbose:
        print(f" (Found {len(imgs)} images)")
    return imgs
