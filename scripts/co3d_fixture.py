"""Shared synthetic Co3d on-disk fixture for the live script drivers
(scripts/verify_r4.py, scripts/bench_loader.py).

Reproduces the loader's expected layout (dust3r_tpu/datasets/co3d.py:
selected_seqs_train.json + images/*.jpg + depths/*.jpg.geometric.png
uint16 + masks/*.png + per-frame npz with K / c2w pose / maximum_depth)
so there is exactly ONE place that encodes it for the script drivers; the
test-suite fixture lives with the tests (tests/test_co3d_loader.py) so
tests never import from scripts/.
"""
import json
import os
import os.path as osp

import cv2
import numpy as np


def make_co3d_fixture(root, H=96, W=128, focal=None, n_frames=100,
                      seqs=(("apple", "seq0"), ("apple", "seq1")), seed=0):
    """Write a synthetic Co3d tree under `root`; returns `root`."""
    rng = np.random.default_rng(seed)
    if focal is None:
        focal = 400.0 if max(H, W) >= 256 else 100.0
    selected = {}
    for cat, seq in seqs:
        frames = list(range(n_frames))
        selected.setdefault(cat, {})[seq] = frames
        base = osp.join(root, cat, seq)
        for sub in ("images", "depths", "masks"):
            os.makedirs(osp.join(base, sub), exist_ok=True)
        for fn in frames:
            img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            cv2.imwrite(osp.join(base, "images", f"frame{fn:06d}.jpg"), img)
            depth = rng.uniform(1, 4, (H, W)).astype(np.float32)
            max_depth = float(depth.max())
            cv2.imwrite(osp.join(base, "depths",
                                 f"frame{fn:06d}.jpg.geometric.png"),
                        (depth / max_depth * 65535).astype(np.uint16))
            cv2.imwrite(osp.join(base, "masks", f"frame{fn:06d}.png"),
                        (rng.uniform(size=(H, W)) > 0.2).astype(
                            np.uint8) * 255)
            K = np.float32([[focal, 0, W / 2], [0, focal, H / 2],
                            [0, 0, 1]])
            pose = np.eye(4, dtype=np.float32)
            pose[:3, 3] = rng.standard_normal(3)
            np.savez(osp.join(base, "images", f"frame{fn:06d}.npz"),
                     camera_intrinsics=K, camera_pose=pose,
                     maximum_depth=max_depth)
    with open(osp.join(root, "selected_seqs_train.json"), "w") as f:
        json.dump(selected, f)
    return root
