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

    def sample_params(self):
        """Draw (op_name, factor) list in application order. The draw
        sequence (brightness, contrast, saturation, hue, permutation) is
        fixed so the native and PIL paths consume identical RNG state."""
        rng = self.rng
        ops = []
        if self.brightness:
            ops.append(("brightness", rng.uniform(
                max(0, 1 - self.brightness), 1 + self.brightness)))
        if self.contrast:
            ops.append(("contrast", rng.uniform(
                max(0, 1 - self.contrast), 1 + self.contrast)))
        if self.saturation:
            ops.append(("saturation", rng.uniform(
                max(0, 1 - self.saturation), 1 + self.saturation)))
        if self.hue:
            ops.append(("hue", rng.uniform(-self.hue, self.hue)))
        order = rng.permutation(len(ops))
        return [ops[i] for i in order]

    @staticmethod
    def apply_pil(img, params):
        """PIL/cv2 fallback path (used when the native core is absent)."""
        for name, f in params:
            if name == "brightness":
                img = ImageEnhance.Brightness(img).enhance(f)
            elif name == "contrast":
                img = ImageEnhance.Contrast(img).enhance(f)
            elif name == "saturation":
                img = ImageEnhance.Color(img).enhance(f)
            elif name == "hue":
                # cv2's SIMD HSV roundtrip: ~7x the PIL convert("HSV")
                # path that dominated the loader profile (14.5 of the
                # 73 ms/sample Co3d hot path). cv2 hue is [0, 180) per
                # turn vs PIL's [0, 256), so the shift is f*180 - the
                # same fraction of a full turn torchvision applies.
                import cv2
                hsv = cv2.cvtColor(np.asarray(img), cv2.COLOR_RGB2HSV)
                shift = int(round(f * 180)) % 180
                # widen before adding: a uint8 sum wraps mod 256 BEFORE
                # the mod-180, corrupting hues whenever hue + shift > 255
                hue = (hsv[..., 0].astype(np.int16) + shift) % 180
                hsv[..., 0] = hue.astype(np.uint8)
                img = PIL.Image.fromarray(cv2.cvtColor(hsv,
                                                       cv2.COLOR_HSV2RGB))
        return img

    def __call__(self, img: PIL.Image.Image) -> PIL.Image.Image:
        return self.apply_pil(img, self.sample_params())


def ColorJitterAndNorm(img, rng=None):
    """Jitter + normalize. Fused single-call native path
    (native/fastimg.cpp color_jitter_norm_u8: float math, one OpenMP pass
    per op, exact-turn hue) when the library is built; PIL/cv2 otherwise.
    Equivalence pinned by tests/test_fastimg.py (few-LSB tolerance: the
    fallback quantizes to uint8 between ops, the native path doesn't)."""
    jit = ColorJitter(rng=rng)
    params = jit.sample_params()
    arr = np.asarray(img)
    if arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[-1] == 3:
        from ...utils.fastimg import color_jitter_norm

        out = color_jitter_norm(arr, [n for n, _ in params],
                                [f for _, f in params])
        _log_jitter_path(out is not None)
        if out is not None:
            return out
    return ImgNorm(ColorJitter.apply_pil(img, params))


_JITTER_PATH_LOGGED = False


def _log_jitter_path(native):
    """Record run provenance once: native-vs-PIL hue rotation differs
    slightly (exact turn fraction vs [0,180) quantization), so training
    streams are only bit-reproducible within one path."""
    global _JITTER_PATH_LOGGED
    if not _JITTER_PATH_LOGGED:
        _JITTER_PATH_LOGGED = True
        import sys

        print("[dust3r_tpu] ColorJitter path: "
              + ("native fastimg (float HSV)" if native
                 else "PIL/cv2 fallback (uint8 HSV)"), file=sys.stderr)


# Names accepted by the dataset DSL (reference train configs say e.g.
# `Co3d(..., transform=ColorJitter)`; in the reference namespace that
# name is the COMPOSED jitter+ImgNorm transform, transforms.py:12-14).
TRANSFORM_DSL_NAMES = {
    "ImgNorm": ImgNorm,
    "ColorJitter": ColorJitterAndNorm,
    "ColorJitter+ImgNorm": ColorJitterAndNorm,
}
