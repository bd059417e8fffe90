"""End-to-end tests for the five EXR-depth dataset loaders on synthetic
on-disk trees matching each preprocess script's output layout (reference
formats: dust3r/datasets/{blendedmvs,megadepth,staticthings3d,waymo,
habitat}.py)."""
import json
import os
import os.path as osp

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dust3r_tpu.utils.exr import write_exr

H, W = 96, 128
FOCAL = 100.0


def _write_frame(base, stem, rng, img_ext=".jpg", npz_keys=("intrinsics",
                                                            "cam2world")):
    img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    cv2.imwrite(osp.join(base, stem + img_ext), img)
    depth = rng.uniform(1, 4, (H, W)).astype(np.float32)
    write_exr(osp.join(base, stem + ".exr"), depth)
    K = np.float32([[FOCAL, 0, W / 2], [0, FOCAL, H / 2], [0, 0, 1]])
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = rng.standard_normal(3)
    if npz_keys == ("intrinsics", "cam2world"):
        np.savez(osp.join(base, stem + ".npz"), intrinsics=K, cam2world=pose)
    else:  # blendedmvs convention
        np.savez(osp.join(base, stem + ".npz"), intrinsics=K,
                 R_cam2world=pose[:3, :3], t_cam2world=pose[:3, 3])
    return K, pose


def _check_views(views, name):
    assert len(views) == 2
    for v in views:
        assert v["img"].shape == (48, 64, 3)
        assert v["depthmap"].shape == (48, 64)
        assert v["dataset"] == name
        d = v["depthmap"][v["valid_mask"]]
        assert d.size and d.min() > 0.5 and d.max() < 4.5
        assert np.isfinite(v["pts3d"]).all()


def test_blendedmvs(tmp_path):
    from dust3r_tpu.datasets.blendedmvs import BlendedMVS
    rng = np.random.default_rng(0)
    root = str(tmp_path)
    pairs = np.array([(0, 1, 0, 1, 0.8), (0, 1, 1, 2, 0.7)],
                     dtype=[("seq_high", "u4"), ("seq_low", "u8"),
                            ("img1", "u2"), ("img2", "u2"),
                            ("score", "f4")])
    np.save(osp.join(root, "blendedmvs_pairs.npy"), pairs)
    seq_dir = osp.join(root, f"{0:08x}{1:016x}")
    os.makedirs(seq_dir)
    for i in range(3):
        _write_frame(seq_dir, f"{i:08n}", rng,
                     npz_keys=("intrinsics", "R|t"))
    ds = BlendedMVS(ROOT=root, split="train", resolution=(64, 48), seed=11)
    assert len(ds) == 2
    _check_views(ds[0], "BlendedMVS")


def test_megadepth(tmp_path):
    from dust3r_tpu.datasets.megadepth import MegaDepth
    rng = np.random.default_rng(1)
    root = str(tmp_path)
    scenes = np.array(["0001 0", "0015 0"])
    images = np.array(["im0", "im1", "im2", "im3"])
    pairs = np.array([(0, 0, 1, 0.9), (0, 1, 2, 0.8), (1, 3, 3, 0.7)],
                     dtype=[("scene_id", "i4"), ("im1_id", "i4"),
                            ("im2_id", "i4"), ("score", "f4")])
    np.savez(osp.join(root, "all_metadata.npz"),
             scenes=scenes, images=images, pairs=pairs)
    for scene in scenes:
        d = osp.join(root, *scene.split())
        os.makedirs(d)
        for im in images:
            _write_frame(d, im, rng)
    ds = MegaDepth(ROOT=root, split="train", resolution=(64, 48), seed=5)
    assert len(ds) == 2  # scene 0015 is held out of train
    _check_views(ds[0], "MegaDepth")
    ds_val = MegaDepth(ROOT=root, split="val", resolution=(64, 48), seed=5)
    assert len(ds_val) == 1


def test_staticthings3d(tmp_path):
    from dust3r_tpu.datasets.staticthings3d import StaticThings3D
    rng = np.random.default_rng(2)
    root = str(tmp_path)
    pairs = np.array([(b"A/0000", 4, b"l", 6, b"r", 7)],
                     dtype=[("scene", "S7"), ("seq", "i4"),
                            ("cam1", "S1"), ("im1", "i4"),
                            ("cam2", "S1"), ("im2", "i4")])
    np.save(osp.join(root, "staticthings_pairs.npy"), pairs)
    for cam in ("left", "right"):
        d = osp.join(root, "TRAIN", "A/0000", "0004", cam)
        os.makedirs(d)
        for i in (6, 7):
            K, pose = _write_frame(d, f"{i:04n}", rng, img_ext="_clean.jpg")
            img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            cv2.imwrite(osp.join(d, f"{i:04n}_final.jpg"), img)
    ds = StaticThings3D(ROOT=root, mask_bg="rand", resolution=(64, 48),
                        seed=3)
    assert len(ds) == 1
    _check_views(ds[0], "StaticThings3D")


def test_waymo(tmp_path):
    from dust3r_tpu.datasets.waymo import Waymo
    rng = np.random.default_rng(3)
    root = str(tmp_path)
    scenes = np.array(["seg0"])
    frames = np.array(["f0", "f1"])
    np.savez(osp.join(root, "waymo_pairs.npz"), scenes=scenes,
             frames=frames, pairs=np.array([[0, 0, 1]]))
    d = osp.join(root, "seg0")
    os.makedirs(d)
    for f in frames:
        _write_frame(d, f, rng)
    ds = Waymo(ROOT=root, resolution=(64, 48), seed=4)
    assert len(ds) == 1
    _check_views(ds[0], "Waymo")


def test_habitat(tmp_path):
    from dust3r_tpu.datasets.habitat import Habitat
    rng = np.random.default_rng(4)
    root = str(tmp_path)
    scene_key = osp.join("sceneA", "00000")
    os.makedirs(osp.join(root, "sceneA"))
    K = [[FOCAL, 0, W / 2], [0, FOCAL, H / 2], [0, 0, 1]]
    for i in range(1, 6):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        cv2.imwrite(osp.join(root, f"{scene_key}_{i}.jpeg"), img)
        depth = rng.uniform(1, 4, (H, W)).astype(np.float32)
        write_exr(osp.join(root, f"{scene_key}_{i}_depth.exr"), depth)
        pose = np.eye(4)
        pose[:3, 3] = rng.standard_normal(3)
        with open(osp.join(root,
                           f"{scene_key}_{i}_camera_params.json"), "w") as f:
            json.dump(dict(camera_intrinsics=K,
                           R_cam2world=pose[:3, :3].tolist(),
                           t_cam2world=pose[:3, 3].tolist()), f)
    with open(osp.join(root, "Habitat_10_scenes_train.txt"), "w") as f:
        f.write(scene_key + "\n")
    ds = Habitat(10, split="train", ROOT=root, resolution=(64, 48), seed=6)
    assert len(ds) == 1
    _check_views(ds[0], "Habitat")
