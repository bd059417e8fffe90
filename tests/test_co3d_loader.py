"""End-to-end Co3d loader test on a synthetic on-disk dataset tree.

Builds the exact disk layout the preprocess script produces (jpg images,
16-bit scaled depth pngs, masks, per-frame npz cameras, selected_seqs json)
and runs the full Co3d -> BaseStereoViewDataset -> DataLoader path.
"""
import json
import os
import os.path as osp

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dust3r_tpu.datasets.co3d import Co3d
from dust3r_tpu.datasets import get_data_loader


@pytest.fixture(scope="module")
def co3d_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("co3d"))
    rng = np.random.default_rng(0)
    H, W = 96, 128
    focal = 100.0

    selected = {}
    for cat, seq in [("apple", "seq0"), ("apple", "seq1")]:
        frames = list(range(100))  # loader pairs expect a pool of 100
        selected.setdefault(cat, {})[seq] = frames
        base = osp.join(root, cat, seq)
        os.makedirs(osp.join(base, "images"), exist_ok=True)
        os.makedirs(osp.join(base, "depths"), exist_ok=True)
        os.makedirs(osp.join(base, "masks"), exist_ok=True)
        for fn in frames:
            img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            cv2.imwrite(osp.join(base, "images", f"frame{fn:06d}.jpg"), img)
            depth = rng.uniform(1, 4, (H, W)).astype(np.float32)
            max_depth = float(depth.max())
            d16 = (depth / max_depth * 65535).astype(np.uint16)
            cv2.imwrite(osp.join(base, "depths",
                                 f"frame{fn:06d}.jpg.geometric.png"), d16)
            mask = (rng.uniform(size=(H, W)) > 0.2).astype(np.uint8) * 255
            cv2.imwrite(osp.join(base, "masks", f"frame{fn:06d}.png"), mask)
            K = np.float32([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]])
            pose = np.eye(4, dtype=np.float32)
            pose[:3, 3] = rng.standard_normal(3)
            np.savez(osp.join(base, "images", f"frame{fn:06d}.npz"),
                     camera_intrinsics=K, camera_pose=pose,
                     maximum_depth=max_depth)
    with open(osp.join(root, "selected_seqs_train.json"), "w") as f:
        json.dump(selected, f)
    return root


class TestCo3dLoader:
    def test_getitem(self, co3d_root):
        ds = Co3d(split="train", ROOT=co3d_root, resolution=(64, 48),
                  mask_bg=True, seed=7)
        assert len(ds) > 0
        views = ds[0]
        assert len(views) == 2
        for v in views:
            assert v["img"].shape == (48, 64, 3)
            assert v["depthmap"].shape == (48, 64)
            assert v["valid_mask"].dtype == bool
            assert v["dataset"] == "Co3d_v2"
            # bg-masked depth has invalid pixels
            assert not v["valid_mask"].all()
            assert np.isfinite(v["pts3d"]).all()

    def test_mask_bg_rand_and_loader(self, co3d_root):
        ds = Co3d(split="train", ROOT=co3d_root, resolution=(64, 48),
                  mask_bg="rand", seed=3)
        loader = get_data_loader(ds, batch_size=2, num_workers=0)
        loader.set_epoch(0)
        v1, v2 = next(iter(loader))
        assert v1["img"].shape == (2, 48, 64, 3)
        assert v1["pts3d"].shape == (2, 48, 64, 3)
        assert list(v1["dataset"]) == ["Co3d_v2", "Co3d_v2"]

    def test_depth_scaling_roundtrip(self, co3d_root):
        """Depth pngs are 16-bit scaled by maximum_depth - verify decode."""
        ds = Co3d(split="train", ROOT=co3d_root, resolution=(64, 48),
                  mask_bg=False, seed=5)
        views = ds[1]
        for v in views:
            d = v["depthmap"][v["valid_mask"]]
            assert d.min() > 0.5 and d.max() < 4.5  # original range [1, 4]


@pytest.fixture(scope="module")
def wildrgbd_root(tmp_path_factory):
    """WildRGB-D layout: obj/instance/{rgb,depth,masks,metadata}/xxxxx.*,
    metric depth in millimeters (reference dust3r/datasets/wildrgbd.py)."""
    root = str(tmp_path_factory.mktemp("wildrgbd"))
    rng = np.random.default_rng(1)
    H, W = 96, 128
    selected = {"cat": {"scene0": list(range(100))}}
    base = osp.join(root, "cat", "scene0")
    for sub in ("rgb", "depth", "masks", "metadata"):
        os.makedirs(osp.join(base, sub), exist_ok=True)
    K = np.float32([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]])
    for fn in range(100):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        cv2.imwrite(osp.join(base, "rgb", f"{fn:0>5d}.jpg"), img)
        depth_mm = rng.uniform(1000, 4000, (H, W)).astype(np.uint16)
        cv2.imwrite(osp.join(base, "depth", f"{fn:0>5d}.png"), depth_mm)
        mask = (rng.uniform(size=(H, W)) > 0.2).astype(np.uint8) * 255
        cv2.imwrite(osp.join(base, "masks", f"{fn:0>5d}.png"), mask)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = rng.standard_normal(3)
        np.savez(osp.join(base, "metadata", f"{fn:0>5d}.npz"),
                 camera_intrinsics=K, camera_pose=pose,
                 maximum_depth=4.0)
    with open(osp.join(root, "selected_seqs_train.json"), "w") as f:
        json.dump(selected, f)
    return root


class TestWildRGBDLoader:
    def test_getitem_metric_depth(self, wildrgbd_root):
        from dust3r_tpu.datasets import WildRGBD
        ds = WildRGBD(split="train", ROOT=wildrgbd_root,
                      resolution=(64, 48), mask_bg=True, seed=9)
        assert len(ds) > 0
        views = ds[0]
        assert len(views) == 2
        for v in views:
            assert v["dataset"] == "WildRGBD"
            d = v["depthmap"][v["valid_mask"]]
            # mm -> meters conversion: original range [1, 4] m
            assert d.size and d.min() > 0.5 and d.max() < 4.5
            assert np.isfinite(v["pts3d"]).all()
