#!/usr/bin/env python3
"""Offline Waymo Open Dataset preprocessing: tfrecords -> loader format.

Behavioral contract: /root/reference/datasets_preprocess/preprocess_waymo.py
(TFRecord frame extraction via the waymo_open_dataset package (optional
host dep, needs tensorflow), LIDAR projections -> sparse depth in EXR,
512 long-edge crops, vehicle->camera axes transformation). Two stages:
extract_frames (tf) then make_crops (numpy/cv2 only).
"""
import argparse
import json
import os
import os.path as osp
import shutil
import sys

import numpy as np
import PIL.Image

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

from dust3r_tpu.utils.geometry import geotrf, inv
from dust3r_tpu.utils.image import imread_cv2
from dust3r_tpu.utils.parallel import parallel_processes as parallel_map
from dust3r_tpu.datasets.utils import cropping

AXES_TRANSFORMATION = np.array([  # waymo vehicle frame -> opencv camera
    [0, -1, 0, 0],
    [0, 0, -1, 0],
    [1, 0, 0, 0],
    [0, 0, 0, 1]])


def get_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--waymo_dir", required=True)
    parser.add_argument("--precomputed_pairs", required=True)
    parser.add_argument("--output_dir", default="data/waymo_processed")
    parser.add_argument("--workers", type=int, default=1)
    return parser


def _list_sequences(db_root):
    res = sorted(f for f in os.listdir(db_root) if f.endswith(".tfrecord"))
    print(f">> found {len(res)} sequences in {db_root}")
    return res


def extract_frames_one_seq(filename):
    """Decode one tfrecord: calibration + per-frame per-camera views."""
    import tensorflow.compat.v1 as tf
    from waymo_open_dataset import dataset_pb2 as open_dataset
    from waymo_open_dataset.utils import frame_utils

    dataset = tf.data.TFRecordDataset(filename, compression_type="")
    calib = None
    frames = []
    for data in dataset:
        frame = open_dataset.Frame()
        frame.ParseFromString(bytearray(data.numpy()))
        content = frame_utils.parse_range_image_and_camera_projection(frame)
        range_images, camera_projections, _, range_image_top_pose = content

        views = {}
        frames.append((frame.context.name, views))
        if calib is None:
            calib = [(cam.name, dict(width=cam.width, height=cam.height,
                                     intrinsics=list(cam.intrinsic),
                                     extrinsics=list(cam.extrinsic.transform)))
                     for cam in frame.context.camera_calibrations]

        points, cp_points = frame_utils.convert_range_image_to_point_cloud(
            frame, range_images, camera_projections, range_image_top_pose)
        points_all = np.concatenate(points, axis=0)
        cp_points_all = np.concatenate(cp_points, axis=0)

        for image in frame.images:
            mask = cp_points_all[..., 0] == image.name
            cp_msk = cp_points_all[mask].astype(np.float32)
            pose = np.asarray(image.pose.transform).reshape(4, 4)
            rgb = np.asarray(tf.image.decode_jpeg(image.image))
            pix = cp_msk[..., 1:3].round().astype(np.int16)
            views[image.name] = dict(img=rgb, pose=pose, pixels=pix,
                                     pts3d=points_all[mask],
                                     timestamp=image.pose_timestamp)
    return calib, frames


def process_one_seq(db_root, output_dir, seq):
    out_dir = osp.join(output_dir, seq)
    os.makedirs(out_dir, exist_ok=True)
    calib_path = osp.join(out_dir, "calib.json")
    if osp.isfile(calib_path):
        return
    try:
        calib, frames = extract_frames_one_seq(osp.join(db_root, seq))
    except RuntimeError:
        print(f"/!\\ Error with sequence {seq} /!\\", file=sys.stderr)
        return
    for f, (frame_name, views) in enumerate(frames):
        for cam_idx, view in views.items():
            img = PIL.Image.fromarray(view.pop("img"))
            img.save(osp.join(out_dir, f"{f:05d}_{cam_idx}.jpg"))
            np.savez(osp.join(out_dir, f"{f:05d}_{cam_idx}.npz"), **view)
    with open(calib_path, "w") as f:
        json.dump(calib, f)


def extract_frames(db_root, output_dir, workers=8):
    sequences = _list_sequences(db_root)
    output_dir = osp.join(output_dir, "tmp")
    func_args = [(db_root, output_dir, seq) for seq in sequences]
    parallel_map(process_one_seq, func_args, star_args=True, workers=workers)


def crop_one_seq(input_dir, output_dir, seq, resolution=512):
    import cv2

    seq_dir = osp.join(input_dir, seq)
    out_dir = osp.join(output_dir, seq)
    if osp.isfile(osp.join(out_dir, "00100_1.jpg")):
        return
    os.makedirs(out_dir, exist_ok=True)

    try:
        with open(osp.join(seq_dir, "calib.json")) as f:
            calib = json.load(f)
    except IOError:
        print(f"/!\\ Missing calib.json in sequence {seq} /!\\",
              file=sys.stderr)
        return

    cam_K, cam_distortion, cam_res, cam_to_car = {}, {}, {}, {}
    for cam_idx, cam_info in calib:
        cam_idx = str(cam_idx)
        cam_res[cam_idx] = (cam_info["width"], cam_info["height"])
        f1, f2, cx, cy, k1, k2, p1, p2, k3 = cam_info["intrinsics"]
        cam_K[cam_idx] = np.asarray([(f1, 0, cx), (0, f2, cy), (0, 0, 1)])
        cam_distortion[cam_idx] = np.asarray([k1, k2, p1, p2, k3])
        cam_to_car[cam_idx] = np.asarray(
            cam_info["extrinsics"]).reshape(4, 4)

    frames = sorted(f[:-3] for f in os.listdir(seq_dir)
                    if f.endswith(".jpg"))
    for frame in frames:
        cam_idx = frame[-2]
        assert cam_idx in "12345", f"bad cam_idx={cam_idx} in {frame}"
        data = np.load(osp.join(seq_dir, frame + "npz"))
        car_to_world = data["pose"]
        W, H = cam_res[cam_idx]

        pos2d = data["pixels"].round().astype(np.int32)
        pts3d = np.asarray(geotrf(
            AXES_TRANSFORMATION @ np.asarray(inv(cam_to_car[cam_idx])),
            data["pts3d"]))

        image = imread_cv2(osp.join(seq_dir, frame + "jpg"))
        output_resolution = (resolution, 1) if W > H else (1, resolution)
        image, _, K2 = cropping.rescale_image_depthmap(
            image, None, cam_K[cam_idx], output_resolution)
        image.save(osp.join(out_dir, frame + "jpg"), quality=80)

        W, H = image.size
        depthmap = np.zeros((H, W), dtype=np.float32)
        pos2d = np.asarray(geotrf(K2 @ np.linalg.inv(cam_K[cam_idx]),
                                  pos2d.astype(np.float64))
                           ).round().astype(np.int32)
        x, y = pos2d.T
        depthmap[y.clip(0, H - 1), x.clip(0, W - 1)] = pts3d[:, 2]
        cv2.imwrite(osp.join(out_dir, frame + "exr"), depthmap)

        cam2world = car_to_world @ cam_to_car[cam_idx] @ \
            np.linalg.inv(AXES_TRANSFORMATION)
        np.savez(osp.join(out_dir, frame + "npz"), intrinsics=K2,
                 cam2world=cam2world, distortion=cam_distortion[cam_idx])


def make_crops(output_dir, workers=16):
    tmp_dir = osp.join(output_dir, "tmp")
    sequences = _list_sequences(tmp_dir)
    func_args = [(tmp_dir, output_dir, seq) for seq in sequences]
    parallel_map(crop_one_seq, func_args, star_args=True, workers=workers,
                 front_num=0)


def main(waymo_root, pairs_path, output_dir, workers=1):
    extract_frames(waymo_root, output_dir, workers=workers)
    make_crops(output_dir, workers=workers)

    with np.load(pairs_path) as data:
        scenes = data["scenes"]
        frames = data["frames"]
        pairs = data["pairs"]
    for scene_id, im1_id, im2_id in pairs:
        for im_id in (im1_id, im2_id):
            path = osp.join(output_dir, scenes[scene_id],
                            frames[im_id] + ".jpg")
            assert osp.isfile(path), f"Missing a file at {path}"
    np.savez(osp.join(output_dir, "waymo_pairs.npz"), scenes=scenes,
             frames=frames, pairs=pairs)
    shutil.rmtree(osp.join(output_dir, "tmp"))
    print("Done! all data generated at", output_dir)


if __name__ == "__main__":
    args = get_parser().parse_args()
    main(args.waymo_dir, args.precomputed_pairs, args.output_dir,
         workers=args.workers)
