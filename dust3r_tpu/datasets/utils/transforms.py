"""Image transforms (torch-free; output NHWC float32 numpy).

Behavioral contract: /root/reference/dust3r/datasets/utils/transforms.py
(ImgNorm = ToTensor + Normalize(0.5, 0.5); ColorJitter(0.5,0.5,0.5,0.1)).
"""
from __future__ import annotations

import numpy as np
import PIL.Image
from PIL import ImageEnhance


def ImgNorm(img):
    """PIL/uint8 -> (H, W, 3) float32 in [-1, 1].

    Uses the native OpenMP core (native/fastimg.cpp) when built - ~4x
    faster than numpy on the training loader's per-sample hot path."""
    arr = np.asarray(img)
    if arr.dtype == np.uint8:
        from ...utils.fastimg import imgnorm

        return imgnorm(arr)
    return (arr.astype(np.float32) / 255.0 - 0.5) / 0.5


class ColorJitter:
    """Random brightness/contrast/saturation/hue jitter, PIL-based.

    Matches torchvision ColorJitter semantics: factors drawn uniformly
    from [max(0, 1-v), 1+v] (hue from [-h, h]), applied in random order.
    """

    def __init__(self, brightness=0.5, contrast=0.5, saturation=0.5, hue=0.1,
                 rng=None):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        self.rng = rng or np.random.default_rng()

    def __call__(self, img: PIL.Image.Image) -> PIL.Image.Image:
        rng = self.rng
        ops = []
        if self.brightness:
            f = rng.uniform(max(0, 1 - self.brightness), 1 + self.brightness)
            ops.append(lambda im: ImageEnhance.Brightness(im).enhance(f))
        if self.contrast:
            f2 = rng.uniform(max(0, 1 - self.contrast), 1 + self.contrast)
            ops.append(lambda im: ImageEnhance.Contrast(im).enhance(f2))
        if self.saturation:
            f3 = rng.uniform(max(0, 1 - self.saturation), 1 + self.saturation)
            ops.append(lambda im: ImageEnhance.Color(im).enhance(f3))
        if self.hue:
            h = rng.uniform(-self.hue, self.hue)

            def shift_hue(im, h=h):
                # cv2's SIMD HSV roundtrip: ~7x the PIL convert("HSV")
                # path that dominated the loader profile (14.5 of the
                # 73 ms/sample Co3d hot path). cv2 hue is [0, 180) per
                # turn vs PIL's [0, 256), so the shift is h*180 - the
                # same fraction of a full turn torchvision applies.
                import cv2
                hsv = cv2.cvtColor(np.asarray(im), cv2.COLOR_RGB2HSV)
                shift = int(round(h * 180)) % 180
                # widen before adding: a uint8 sum wraps mod 256 BEFORE
                # the mod-180, corrupting hues whenever hue + shift > 255
                hue = (hsv[..., 0].astype(np.int16) + shift) % 180
                hsv[..., 0] = hue.astype(np.uint8)
                return PIL.Image.fromarray(
                    cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB))
            ops.append(shift_hue)
        order = rng.permutation(len(ops))
        for i in order:
            img = ops[i](img)
        return img


def ColorJitterAndNorm(img, rng=None):
    return ImgNorm(ColorJitter(rng=rng)(img))


# Names accepted by the dataset DSL (reference train configs say e.g.
# `Co3d(..., transform=ColorJitter)`; in the reference namespace that
# name is the COMPOSED jitter+ImgNorm transform, transforms.py:12-14).
TRANSFORM_DSL_NAMES = {
    "ImgNorm": ImgNorm,
    "ColorJitter": ColorJitterAndNorm,
    "ColorJitter+ImgNorm": ColorJitterAndNorm,
}
