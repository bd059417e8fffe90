import numpy as np

from dust3r_tpu.utils.fastimg import (available, ensure_built, imgnorm,
                                      depth_valid, resize_nearest)
from dust3r_tpu.datasets.utils.transforms import ImgNorm


class TestFastImg:
    def test_imgnorm_matches_numpy(self):
        rng = np.random.default_rng(0)
        arr = rng.integers(0, 255, (64, 48, 3), dtype=np.uint8)
        ref = (arr.astype(np.float32) / 255.0 - 0.5) / 0.5
        np.testing.assert_allclose(imgnorm(arr), ref, atol=3e-7)
        np.testing.assert_allclose(ImgNorm(arr), ref, atol=3e-7)

    def test_depth_valid(self):
        d = np.array([[1.0, 0.0], [-1.0, np.nan]], np.float32)
        np.testing.assert_array_equal(depth_valid(d),
                                      [[True, False], [False, False]])

    def test_resize_nearest(self):
        rng = np.random.default_rng(1)
        d = rng.uniform(0, 5, (40, 60)).astype(np.float32)
        out = resize_nearest(d, 20, 30)
        assert out.shape == (20, 30)
        # exact subsample when halving
        np.testing.assert_array_equal(out, d[::2, ::2])

    def test_build_available(self):
        # in this environment g++ exists, so the native path must build
        assert ensure_built() is not None
        assert available()
