"""COLMAP-backed visloc datasets (Aachen, Cambridge).

Behavioral contract: /root/reference/dust3r_visloc/datasets/base_colmap.py:
COLMAP text parsing (cameras/images/points3D - pure python here, no
dependency), kapture query records (gated optional import), pairsfile
retrieval lists, per-view dicts with rgb_rescaled, sparse pts3d_rescaled
and 3x3 `to_orig` coordinate transforms.

Views carry NHWC float arrays (TPU layout) instead of CHW tensors.
"""
from __future__ import annotations

import collections
import os
import pickle

import numpy as np
import PIL.Image

from .base_dataset import BaseVislocDataset
from ..utils import get_resize_function, rescale_points3d
from ...datasets.utils.transforms import ImgNorm
from ...utils.geometry import colmap_to_opencv_intrinsics
from ...utils.pose import quat_to_rotmat

KaptureSensor = collections.namedtuple("Sensor",
                                       "sensor_params camera_params")


def kapture_to_opencv_intrinsics(sensor):
    """COLMAP/kapture camera params -> (K opencv, distortion, (w, h))."""
    sensor_type = sensor.sensor_params[0]
    p = sensor.camera_params
    if sensor_type == "SIMPLE_PINHOLE":
        w, h, f, cx, cy = p
        fx = fy = f
        k1 = k2 = p1 = p2 = 0
    elif sensor_type == "PINHOLE":
        w, h, fx, fy, cx, cy = p
        k1 = k2 = p1 = p2 = 0
    elif sensor_type == "SIMPLE_RADIAL":
        w, h, f, cx, cy, k1 = p
        fx = fy = f
        k2 = p1 = p2 = 0
    elif sensor_type == "RADIAL":
        w, h, f, cx, cy, k1, k2 = p
        fx = fy = f
        p1 = p2 = 0
    elif sensor_type == "OPENCV":
        w, h, fx, fy, cx, cy, k1, k2, p1, p2 = p
    else:
        raise NotImplementedError(f"Sensor type {sensor_type} not supported")

    K = np.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    K = colmap_to_opencv_intrinsics(K)
    dist = np.asarray([k1, k2, p1, p2], np.float32)
    return K, dist, (w, h)


def K_from_colmap(elems):
    sensor = KaptureSensor(elems, tuple(map(float, elems[1:])))
    K, dist, (w, h) = kapture_to_opencv_intrinsics(sensor)
    return dict(resolution=(w, h), intrinsics=K, distortion=dist)


def pose_from_qwxyz_txyz(elems):
    """COLMAP images.txt pose (world2cam, wxyz quat) -> cam2world."""
    qw, qx, qy, qz, tx, ty, tz = map(float, elems)
    pose = np.eye(4)
    pose[:3, :3] = np.asarray(quat_to_rotmat(
        np.array([qx, qy, qz, qw], np.float64)))
    pose[:3, 3] = (tx, ty, tz)
    return np.linalg.inv(pose)


def read_colmap_text_model(sfm_dir):
    """Parse cameras.txt / images.txt / points3D.txt (pure python)."""
    with open(os.path.join(sfm_dir, "cameras.txt")) as f:
        raw = [l for l in f.read().splitlines() if not l.startswith("#")]
    intrinsics = {}
    for camera in raw:
        camera = camera.split(" ")
        intrinsics[int(camera[0])] = K_from_colmap(camera[1:])

    with open(os.path.join(sfm_dir, "images.txt")) as f:
        raw = [l for l in f.read().splitlines() if not l.startswith("#")]
    img_infos = {}
    for image, points in zip(raw[0::2], raw[1::2]):
        image = image.split(" ")
        points = points.split(" ")
        img_name = image[-1]
        pts2d = {int(i): (float(x), float(y))
                 for i, x, y in zip(points[2::3], points[0::3], points[1::3])
                 if i != "-1"}
        img_infos[img_name] = dict(intrinsics[int(image[-2])],
                                   path=img_name,
                                   camera_pose=pose_from_qwxyz_txyz(image[1:-2]),
                                   sparse_pts2d=pts2d)

    with open(os.path.join(sfm_dir, "points3D.txt")) as f:
        raw = [l for l in f.read().splitlines() if not l.startswith("#")]
    points3D = {}
    for point in raw:
        point = point.split()
        points3D[int(point[0])] = tuple(map(float, point[1:4]))
    return img_infos, points3D


def get_ordered_pairs_from_file(pairsfile_path):
    """Parse a retrieval pairsfile: 'query map [score]' lines ->
    {query: [(map, score), ...]} sorted by score descending."""
    pairs = collections.defaultdict(list)
    with open(pairsfile_path) as f:
        for line in f:
            parts = line.strip().split()
            if len(parts) < 2:
                continue
            q, m = parts[0], parts[1]
            score = float(parts[2]) if len(parts) > 2 else 0.0
            pairs[q].append((m, score))
    return {q: sorted(v, key=lambda x: -x[1]) for q, v in pairs.items()}


class BaseVislocColmapDataset(BaseVislocDataset):
    def __init__(self, image_path, map_path, query_path, pairsfile_path,
                 topk=1, cache_sfm=False):
        super().__init__()
        self.topk = topk
        self.num_views = self.topk + 1
        self.image_path = image_path
        self.cache_sfm = cache_sfm
        self._load_sfm(map_path)

        from kapture.io.csv import kapture_from_dir  # optional dep

        kdata_query = kapture_from_dir(query_path)
        assert kdata_query.records_camera is not None
        searchindex = {kdata_query.records_camera[(t, s)]: (t, s)
                       for t, s in kdata_query.records_camera.key_pairs()}
        self.query_data = {"kdata": kdata_query, "searchindex": searchindex}
        self.pairs = get_ordered_pairs_from_file(pairsfile_path)
        self.scenes = kdata_query.records_camera.data_list()

    def _load_sfm(self, sfm_dir):
        cache = os.path.join(sfm_dir, "dust3r_tpu_cache.pkl")
        if self.cache_sfm and os.path.isfile(cache):
            with open(cache, "rb") as f:
                data = pickle.load(f)
            self.img_infos = data["img_infos"]
            self.points3D = data["points3D"]
            return
        self.img_infos, self.points3D = read_colmap_text_model(sfm_dir)
        if self.cache_sfm:
            with open(cache, "wb") as f:
                pickle.dump(dict(img_infos=self.img_infos,
                                 points3D=self.points3D), f)

    def __len__(self):
        return len(self.scenes)

    def _get_view_query(self, imgname):
        from kapture.core import CameraType

        kdata = self.query_data["kdata"]
        timestamp, camera_id = self.query_data["searchindex"][imgname]
        params = kdata.sensors[camera_id].camera_params
        ctype = kdata.sensors[camera_id].camera_type
        if ctype == CameraType.SIMPLE_PINHOLE:
            W, H, f, cx, cy = params
            k1 = 0
            fx = fy = f
        elif ctype == CameraType.SIMPLE_RADIAL:
            W, H, f, cx, cy, k1 = params
            fx = fy = f
        else:
            raise NotImplementedError(f"camera type {ctype}")
        W, H = int(W), int(H)
        K = colmap_to_opencv_intrinsics(
            np.float32([(fx, 0, cx), (0, fy, cy), (0, 0, 1)]))
        distortion = [k1, 0, 0, 0]

        from ..utils import cam_to_world_from_kapture
        if kdata.trajectories is not None and \
                (timestamp, camera_id) in kdata.trajectories:
            cam_to_world = cam_to_world_from_kapture(kdata, timestamp,
                                                     camera_id)
        else:
            cam_to_world = np.eye(4, dtype=np.float32)

        rgb_image = PIL.Image.open(
            os.path.join(self.image_path, imgname)).convert("RGB")
        resize_func, _, to_orig = get_resize_function(
            self.maxdim, self.patch_size, H, W)
        rgb_rescaled = resize_func(ImgNorm(rgb_image))  # HWC float

        return {"intrinsics": K, "distortion": distortion,
                "cam_to_world": cam_to_world, "rgb": rgb_image,
                "rgb_rescaled": rgb_rescaled, "to_orig": to_orig,
                "idx": 0, "image_name": imgname}

    def _get_view_map(self, imgname, idx):
        infos = self.img_infos[imgname]
        rgb_image = PIL.Image.open(
            os.path.join(self.image_path, infos["path"])).convert("RGB")
        W, H = rgb_image.size
        K = colmap_to_opencv_intrinsics(infos["intrinsics"])

        pts2d_map = infos["sparse_pts2d"]
        sparse_pos2d = np.float32(list(pts2d_map.values())).reshape(-1, 2)
        sparse_pts3d = np.float32([self.points3D[i]
                                   for i in pts2d_map]).reshape(-1, 3)

        sparse_pos2d_cv2 = sparse_pos2d.copy()
        sparse_pos2d_cv2[:, 0] -= 0.5
        sparse_pos2d_cv2[:, 1] -= 0.5
        pos_int = sparse_pos2d_cv2.round().astype(np.int64)
        valid = ((pos_int[:, 0] >= 0) & (pos_int[:, 0] < W)
                 & (pos_int[:, 1] >= 0) & (pos_int[:, 1] < H))
        pos_int = pos_int[valid]
        pts3d = np.full((H, W, 3), np.nan, np.float32)
        pts3d[pos_int[:, 1], pos_int[:, 0]] = sparse_pts3d[valid]

        resize_func, to_resize, to_orig = get_resize_function(
            self.maxdim, self.patch_size, H, W)
        rgb_rescaled = resize_func(ImgNorm(rgb_image))
        HR, WR = rgb_rescaled.shape[:2]
        _, _, pts3d_rescaled, valid_rescaled = rescale_points3d(
            sparse_pos2d_cv2, sparse_pts3d, to_resize, HR, WR)

        return {"intrinsics": K, "distortion": infos["distortion"],
                "cam_to_world": infos["camera_pose"], "rgb": rgb_image,
                "pts3d": pts3d,
                "valid": np.isfinite(pts3d.sum(axis=-1)),
                "rgb_rescaled": rgb_rescaled,
                "pts3d_rescaled": pts3d_rescaled,
                "valid_rescaled": valid_rescaled,
                "to_orig": to_orig, "idx": idx, "image_name": imgname}

    def __getitem__(self, idx):
        assert self.maxdim is not None and self.patch_size is not None
        query_image = self.scenes[idx]
        map_images = [p[0] for p in self.pairs[query_image][:self.topk]]
        views = [self._get_view_query(query_image)]
        for n, map_image in enumerate(map_images):
            views.append(self._get_view_map(map_image, n + 1))
        return views
