#!/usr/bin/env python3
"""Offline MegaDepth preprocessing: COLMAP sparse models -> loader format.

Behavioral contract: /root/reference/datasets_preprocess/
preprocess_megadepth.py (manhattan sparse model parsing, undistorted
optimal intrinsics, h5 depth decode, 800x600 downscale, jpg + exr + npz).
"""
import argparse
import collections
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

from dust3r_tpu.utils.parallel import parallel_threads
from dust3r_tpu.utils.exr import imwrite_exr
from dust3r_tpu.utils.pose import quat_to_rotmat
from dust3r_tpu.datasets.utils import cropping


def get_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--megadepth_dir", required=True)
    parser.add_argument("--precomputed_pairs", required=True)
    parser.add_argument("--output_dir", default="data/megadepth_processed")
    return parser


def colmap_pose_to_w2c(image_pose):
    """COLMAP images.txt pose (qw qx qy qz tx ty tz) -> world2cam 4x4."""
    qvec = np.asarray(image_pose[:4], np.float64)
    qvec = qvec / np.linalg.norm(qvec)
    w, x, y, z = qvec
    R = np.asarray(quat_to_rotmat(np.array([x, y, z, w])))
    pose = np.eye(4)
    pose[:3, :3] = R
    pose[:3, 3] = image_pose[4:7]
    return pose


def load_sparse_model(root, scene_id, subscene):
    """Parse cameras.txt + images.txt of the manhattan sparse model."""
    sparse = osp.join(root, scene_id, "sparse", "manhattan", subscene)
    with open(osp.join(sparse, "cameras.txt")) as f:
        raw = f.readlines()[3:]
    camera_intrinsics = {}
    for camera in raw:
        camera = camera.split(" ")
        width, height, focal, cx, cy, k0 = [float(e) for e in camera[2:]]
        K = np.eye(3)
        K[0, 0] = K[1, 1] = focal
        K[0, 2], K[1, 2] = cx, cy
        camera_intrinsics[int(camera[0])] = (
            (int(width), int(height)), K, (k0, 0, 0, 0))

    with open(osp.join(sparse, "images.txt")) as f:
        raw = f.read().splitlines()[4:]
    poses = {}
    cam_ids = []
    for image, points in zip(raw[0::2], raw[1::2]):
        image = image.split(" ")
        image_id = image[-1]
        cam_ids.append(int(image[-2]))
        poses[image_id] = colmap_pose_to_w2c(
            [float(e) for e in image[1:-2]])
    intrinsics = {im_id: camera_intrinsics[cam]
                  for im_id, cam in zip(poses, cam_ids)}
    return poses, intrinsics


def resize_one_image(root, tag, K_pre_rectif, pose_w2cam, out_dir):
    import cv2
    import h5py

    if osp.isfile(osp.join(out_dir, tag + ".npz")):
        return
    img = cv2.cvtColor(cv2.imread(osp.join(root, "imgs", tag),
                                  cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
    with h5py.File(osp.join(root, "depths",
                            osp.splitext(tag)[0] + ".h5"), "r") as hd5:
        depthmap = np.asarray(hd5["depth"])

    # undistort the intrinsics (optimal new camera matrix, centered pp)
    imsize_pre, K_pre, distortion = K_pre_rectif
    imsize_post = img.shape[1::-1]
    K_post = cv2.getOptimalNewCameraMatrix(
        K_pre, np.asarray(distortion), imsize_pre, alpha=0,
        newImgSize=imsize_post, centerPrincipalPoint=True)[0]

    H, W = img.shape[:2]
    resolution_out = sorted((800, 600))[::+1 if W < H else -1]
    img_out, depth_out, K_out = cropping.rescale_image_depthmap(
        img, depthmap, K_post, resolution_out, force=False)

    img_out.save(osp.join(out_dir, tag + ".jpg"), quality=90)
    imwrite_exr(osp.join(out_dir, tag + ".exr"), depth_out)
    cam2world = np.linalg.inv(pose_w2cam)
    np.savez(osp.join(out_dir, tag + ".npz"), intrinsics=K_out,
             cam2world=cam2world)


def main(db_root, pairs_path, output_dir):
    os.makedirs(output_dir, exist_ok=True)
    data = np.load(pairs_path, allow_pickle=True)
    scenes = data["scenes"]
    images = data["images"]
    pairs = data["pairs"]

    todo = collections.defaultdict(set)
    for scene, im1, im2, score in pairs:
        todo[scene].add(im1)
        todo[scene].add(im2)

    for scene, im_idxs in todo.items():
        scene, subscene = scenes[scene].split()
        out_dir = osp.join(output_dir, scene, subscene)
        os.makedirs(out_dir, exist_ok=True)
        poses_w2c, intrinsics = load_sparse_model(db_root, scene, subscene)
        in_dir = osp.join(db_root, scene, "dense" + subscene)
        func_args = [(in_dir, img, intrinsics[img], poses_w2c[img], out_dir)
                     for img in [images[i] for i in im_idxs]]
        parallel_threads(resize_one_image, func_args, star_args=True,
                         front_num=0, leave=False)

    np.savez(osp.join(output_dir, "all_metadata.npz"), scenes=scenes,
             images=images, pairs=pairs)
    print("Done! prepared all pairs in", output_dir)


if __name__ == "__main__":
    args = get_parser().parse_args()
    main(args.megadepth_dir, args.precomputed_pairs, args.output_dir)
