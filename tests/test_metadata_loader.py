"""End-to-end test of the all_metadata.npz loader family (ScanNetpp /
ARKitScenes share this machinery) on a synthetic on-disk tree."""
import os
import os.path as osp

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dust3r_tpu.datasets.arkitscenes import ScanNetpp


@pytest.fixture(scope="module")
def scannetpp_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scannetpp"))
    rng = np.random.default_rng(1)
    H, W = 96, 128
    scenes = ["sceneA", "sceneB"]
    images, sceneids, intrinsics, trajectories = [], [], [], []
    n_per_scene = 6
    for sid, scene in enumerate(scenes):
        os.makedirs(osp.join(root, scene, "images"), exist_ok=True)
        os.makedirs(osp.join(root, scene, "depth"), exist_ok=True)
        for k in range(n_per_scene):
            name = f"frame_{k:04d}"
            img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            cv2.imwrite(osp.join(root, scene, "images", name + ".jpg"), img)
            depth_mm = rng.integers(500, 4000, (H, W)).astype(np.uint16)
            cv2.imwrite(osp.join(root, scene, "depth", name + ".png"),
                        depth_mm)
            K = np.float32([[90, 0, W / 2], [0, 90, H / 2], [0, 0, 1]])
            pose = np.eye(4, dtype=np.float32)
            pose[:3, 3] = rng.standard_normal(3)
            images.append(name)
            sceneids.append(sid)
            intrinsics.append(K)
            trajectories.append(pose)
    pairs = np.array([[0, 1, 0.9], [2, 3, 0.8], [6, 7, 0.7], [8, 9, 0.6]])
    np.savez(osp.join(root, "all_metadata.npz"),
             scenes=np.array(scenes), sceneids=np.array(sceneids),
             images=np.array(images),
             intrinsics=np.stack(intrinsics),
             trajectories=np.stack(trajectories), pairs=pairs)
    return root


class TestScanNetppLoader:
    def test_getitem(self, scannetpp_root):
        ds = ScanNetpp(split="train", ROOT=scannetpp_root,
                       resolution=(64, 48), seed=11)
        assert len(ds) == 4
        views = ds[2]  # cross into sceneB (indices 6, 7)
        assert len(views) == 2
        for v in views:
            assert v["img"].shape == (48, 64, 3)
            assert v["dataset"] == "ScanNet++"
            assert v["label"].startswith("sceneB")
            # mm -> meters conversion
            d = v["depthmap"][v["valid_mask"]]
            assert 0.4 < d.min() and d.max() < 4.1
            assert np.isfinite(v["pts3d"]).all()
