"""Host data-loader microbench: samples/s/core on the Co3d hot path
(VERDICT r3 item 9).

The sustained TPU training run measured 1.25 s/batch loader time on a
ONE-core host; the production claim is that a multi-core host reaches the
174 ms/step device-compute floor. This bench measures the per-sample cost
(with a per-phase breakdown) so that claim is an extrapolation from a
number, not an assertion:

    cores_needed = ceil(ms_per_sample * batch_size / 174 ms)

assuming the threaded loader scales ~linearly across cores (each sample
is independent: jpg decode + crop/resize + ColorJitter + numpy geometry).

Run: python scripts/bench_loader.py   (pure host; forces JAX off)
"""
import json
import os
import os.path as osp
import sys
import tempfile
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import cv2  # noqa: E402


from co3d_fixture import make_co3d_fixture  # noqa: E402 - shared fixture


def make_fixture(root, H=384, W=512, n_frames=100):
    """Co3d fixture at realistic (512-bucket) image sizes."""
    make_co3d_fixture(root, H=H, W=W, n_frames=n_frames)


def bench_dataset(root, n_samples=40, resolution=(512, 384), transform=None):
    from dust3r_tpu.datasets.co3d import Co3d

    kw = dict(split="train", ROOT=root, resolution=resolution,
              aug_crop=16, mask_bg="rand", seed=3)
    if transform is not None:
        kw["transform"] = transform
    ds = Co3d(**kw)
    _ = ds[0]  # warm caches (metadata, lib loads)
    t0 = time.perf_counter()
    for i in range(n_samples):
        views = ds[i % len(ds)]
        assert len(views) == 2
    dt = time.perf_counter() - t0
    return dt / n_samples * 1e3  # ms per SAMPLE (= one 2-view pair)


def bench_phases(root, n=30, H=384, W=512):
    """Standalone per-phase costs of the hot path (one view)."""
    import PIL.Image
    from dust3r_tpu.datasets.utils.transforms import (ColorJitterAndNorm,
                                                      ColorJitter, ImgNorm)
    from dust3r_tpu.utils.geometry import (
        depthmap_to_absolute_camera_coordinates)

    img_path = osp.join(root, "apple", "seq0", "images", "frame000000.jpg")
    depth_path = osp.join(root, "apple", "seq0", "depths",
                          "frame000000.jpg.geometric.png")
    out = {}

    t0 = time.perf_counter()
    for _ in range(n):
        img = PIL.Image.open(img_path)
        img.load()
    out["jpg_decode"] = (time.perf_counter() - t0) / n * 1e3

    img = PIL.Image.open(img_path).convert("RGB")
    t0 = time.perf_counter()
    for _ in range(n):
        img.resize((W // 2 + 8, H // 2 + 8), PIL.Image.LANCZOS)
    out["lanczos_halve"] = (time.perf_counter() - t0) / n * 1e3

    t0 = time.perf_counter()
    for _ in range(n):
        cv2.imread(depth_path, cv2.IMREAD_UNCHANGED)
    out["depth_png_decode"] = (time.perf_counter() - t0) / n * 1e3

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for _ in range(n):
        ColorJitterAndNorm(img, rng=rng)
    out["jitter_norm_fused"] = (time.perf_counter() - t0) / n * 1e3

    t0 = time.perf_counter()
    for _ in range(n):
        ImgNorm(ColorJitter.apply_pil(img, [("brightness", 1.2),
                                            ("contrast", 0.8),
                                            ("saturation", 1.3),
                                            ("hue", 0.05)]))
    out["jitter_norm_pil_fallback"] = (time.perf_counter() - t0) / n * 1e3

    depth = rng.uniform(1, 4, (H, W)).astype(np.float32)
    K = np.float32([[400, 0, W / 2], [0, 400, H / 2], [0, 0, 1]])
    pose = np.eye(4, dtype=np.float32)
    t0 = time.perf_counter()
    for _ in range(n):
        depthmap_to_absolute_camera_coordinates(depth, K, pose)
    out["pts3d_geometry"] = (time.perf_counter() - t0) / n * 1e3
    return out


def main():
    from dust3r_tpu.utils import fastimg

    print(f"host cores: {os.cpu_count()}; "
          f"native fastimg: {fastimg.available()}", file=sys.stderr)
    with tempfile.TemporaryDirectory() as tmp:
        make_fixture(tmp)
        phases = bench_phases(tmp)
        ms_sample = bench_dataset(tmp)
        res = {
            "ms_per_sample_full_path": round(ms_sample, 2),
            "samples_per_sec_per_core": round(1e3 / ms_sample, 2),
            "phase_ms": {k: round(v, 2) for k, v in phases.items()},
            "host_cores": os.cpu_count(),
            "native_fastimg": fastimg.available(),
        }
        # extrapolation to the measured 174 ms/step device floor
        # (224_linear B=16 stage-1 training; PROGRESS.md round 2)
        for tag, bs, floor_ms in (("224lin_B16", 16, 174.0),
                                  ("512dpt_B4", 4, 309.0)):
            need = ms_sample * bs / floor_ms
            res[f"cores_to_hide_loader_{tag}"] = round(need, 1)
        print(json.dumps(res))


if __name__ == "__main__":
    main()
