"""Built-in EXR codec: roundtrips, real-OpenEXR-file decode, imread fallback.

The reference pipeline stores every depthmap as .exr (written with cv2);
cv2 builds without OpenEXR are common, so utils/exr.py makes the data layer
self-sufficient.
"""
import os

import numpy as np
import pytest

from dust3r_tpu.utils.exr import read_exr, write_exr, imwrite_exr
from dust3r_tpu.utils.image import imread_cv2


@pytest.mark.parametrize("compression", ["none", "zips", "zip"])
@pytest.mark.parametrize("shape", [(37, 53), (16, 16), (33, 129, 3)])
def test_roundtrip_float(tmp_path, compression, shape):
    rng = np.random.default_rng(hash((compression, shape)) % 2**31)
    a = rng.uniform(0, 100, shape).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, a, compression=compression)
    np.testing.assert_array_equal(read_exr(p), a)


def test_roundtrip_half(tmp_path):
    a = np.random.default_rng(1).uniform(0, 10, (40, 24)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, a, half=True)
    np.testing.assert_array_equal(
        read_exr(p), a.astype(np.float16).astype(np.float32))


def test_decodes_real_openexr_file():
    """Cross-validate against a file authored by the actual OpenEXR
    library (16x16 logo from the CPython test suite, PSF-licensed)."""
    path = os.path.join(os.path.dirname(__file__), "data",
                        "openexr_sample.exr")
    img = read_exr(path)
    assert img.shape[:2] == (16, 16)
    assert np.isfinite(img).all()
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_imread_cv2_fallback(tmp_path):
    """imread_cv2 must load .exr whether or not cv2 has the codec."""
    a = np.random.default_rng(2).uniform(0.5, 5, (20, 30)).astype(np.float32)
    p = str(tmp_path / "depth.exr")
    imwrite_exr(p, a)
    out = imread_cv2(p)
    np.testing.assert_allclose(out, a, rtol=1e-6)
