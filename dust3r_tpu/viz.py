"""Visualization: trimesh scene building, camera frusta, sky segmentation.

Behavioral contract: /root/reference/dust3r/viz.py:119-381 and the GLB
export helpers of dust3r/demo.py:66-107. Host-side only; trimesh is an
optional dependency (gated import, like the reference's optional viz deps).
"""
from __future__ import annotations

import numpy as np
import PIL.Image

from .utils.image import img_to_arr, rgb  # noqa: F401
from .utils.geometry import (geotrf, get_med_dist_between_poses,
                             depthmap_to_absolute_camera_coordinates)


def _trimesh():
    try:
        import trimesh
        return trimesh
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "trimesh is required for 3D visualization/GLB export; "
            "install it to use SceneViz") from e


OPENGL = np.array([[1, 0, 0, 0],
                   [0, -1, 0, 0],
                   [0, 0, -1, 0],
                   [0, 0, 0, 1]])

CAM_COLORS = [(255, 0, 0), (0, 0, 255), (0, 255, 0), (255, 0, 255),
              (255, 204, 0), (0, 204, 204), (128, 255, 255), (255, 128, 255),
              (255, 255, 128), (0, 0, 0), (128, 128, 128)]


def uint8(colors):
    colors = np.asarray(colors)
    if np.issubdtype(colors.dtype, np.floating):
        colors = colors * 255
    assert 0 <= colors.min() and colors.max() < 256
    return np.uint8(colors)


def auto_cam_size(im_poses):
    return 0.1 * get_med_dist_between_poses(im_poses)


def _rotz(deg):
    c, s = np.cos(np.deg2rad(deg)), np.sin(np.deg2rad(deg))
    m = np.eye(4)
    m[:2, :2] = [[c, -s], [s, c]]
    return m


def _roty(deg):
    c, s = np.cos(np.deg2rad(deg)), np.sin(np.deg2rad(deg))
    m = np.eye(4)
    m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
    return m


def pts3d_to_trimesh(img, pts3d, valid=None):
    """Pointmap -> per-pixel-quad mesh dict (2 double-sided tris/pixel)."""
    H, W, THREE = img.shape
    assert THREE == 3 and img.shape == pts3d.shape

    vertices = np.asarray(pts3d).reshape(-1, 3)
    idx = np.arange(len(vertices)).reshape(H, W)
    tl = idx[:-1, :-1].ravel()
    tr = idx[:-1, 1:].ravel()
    bl = idx[1:, :-1].ravel()
    br = idx[1:, 1:].ravel()
    faces = np.concatenate([
        np.c_[tl, tr, bl], np.c_[bl, tr, tl],   # front + back
        np.c_[tr, bl, br], np.c_[br, bl, tr],
    ], axis=0)
    face_colors = np.concatenate([
        img[:-1, :-1].reshape(-1, 3), img[:-1, :-1].reshape(-1, 3),
        img[1:, 1:].reshape(-1, 3), img[1:, 1:].reshape(-1, 3),
    ], axis=0)

    if valid is not None:
        assert valid.shape == (H, W)
        ok = valid.ravel()[faces].all(axis=-1)
        faces = faces[ok]
        face_colors = face_colors[ok]
    return dict(vertices=vertices, face_colors=face_colors, faces=faces)


def cat_meshes(meshes):
    vertices, faces, colors = zip(*[(m["vertices"], m["faces"],
                                     m["face_colors"]) for m in meshes])
    offsets = np.cumsum([0] + [len(v) for v in vertices])
    faces = [f + off for f, off in zip(faces, offsets)]
    return dict(vertices=np.concatenate(vertices),
                face_colors=np.concatenate(colors),
                faces=np.concatenate(faces))


def add_scene_cam(scene, pose_c2w, edge_color, image=None, focal=None,
                  imsize=None, screen_width=0.03, marker=None):
    """Add a textured camera frustum mesh to a trimesh scene."""
    trimesh = _trimesh()

    if image is not None:
        image = np.asarray(image)
        H, W, THREE = image.shape
        if image.dtype != np.uint8:
            image = np.uint8(255 * image)
    elif imsize is not None:
        W, H = imsize
    elif focal is not None:
        H = W = focal / 1.1
    else:
        H = W = 1

    if isinstance(focal, np.ndarray):
        focal = float(focal.reshape(-1)[0])
    if not focal:
        focal = min(H, W) * 1.1

    height = max(screen_width / 10, focal * screen_width / H)
    width = screen_width * 0.5 ** 0.5
    rot45 = _rotz(45)
    rot45[2, 3] = -height  # cone tip at optical center
    aspect_ratio = np.eye(4)
    aspect_ratio[0, 0] = W / H
    transform = np.asarray(pose_c2w) @ OPENGL @ aspect_ratio @ rot45
    cam = trimesh.creation.cone(width, height, sections=4)

    if image is not None:
        vertices = np.asarray(geotrf(transform, cam.vertices[[4, 5, 1, 3]]))
        faces = np.array([[0, 1, 2], [0, 2, 3], [2, 1, 0], [3, 2, 0]])
        img_mesh = trimesh.Trimesh(vertices=vertices, faces=faces)
        uv = np.float32([[0, 0], [1, 0], [1, 1], [0, 1]])
        img_mesh.visual = trimesh.visual.TextureVisuals(
            uv, image=PIL.Image.fromarray(image))
        scene.add_geometry(img_mesh)

    # wireframe-ish frustum from 3 slightly offset cones
    rot2 = _rotz(2)
    vertices = np.r_[cam.vertices, 0.95 * cam.vertices,
                     np.asarray(geotrf(rot2, cam.vertices))]
    vertices = np.asarray(geotrf(transform, vertices))
    faces = []
    n = len(cam.vertices)
    for face in cam.faces:
        if 0 in face:
            continue
        a, b, c = face
        a2, b2, c2 = face + n
        a3, b3, c3 = face + 2 * n
        faces += [(a, b, b2), (a, a2, c), (c2, b, c),
                  (a, b, b3), (a, a3, c), (c3, b, c)]
    faces += [(c, b, a) for a, b, c in faces]  # no culling

    frustum = trimesh.Trimesh(vertices=vertices, faces=faces)
    frustum.visual.face_colors[:, :3] = edge_color
    scene.add_geometry(frustum)

    if marker == "o":
        m = trimesh.creation.icosphere(3, radius=screen_width / 4)
        m.vertices += np.asarray(pose_c2w)[:3, 3]
        m.visual.face_colors[:, :3] = edge_color
        scene.add_geometry(m)


class SceneViz:
    def __init__(self):
        self.scene = _trimesh().Scene()

    def add_pointcloud(self, pts3d, color=(0, 0, 0), mask=None, denoise=False):
        trimesh = _trimesh()
        pts3d = [np.asarray(p) for p in pts3d] \
            if isinstance(pts3d, list) else [np.asarray(pts3d).reshape(-1, 3)]
        if mask is not None and not isinstance(mask, list):
            mask = [np.asarray(mask).ravel()]
        if mask is None:
            mask = [slice(None)] * len(pts3d)
        pts = np.concatenate([np.asarray(p).reshape(-1, 3)[np.asarray(m).ravel()
                              if not isinstance(m, slice) else m]
                              for p, m in zip(pts3d, mask)])
        pct = trimesh.PointCloud(pts)

        if isinstance(color, (list, np.ndarray)) and not (
                isinstance(color, (tuple, list)) and len(color) == 3
                and np.isscalar(color[0])):
            cols = color if isinstance(color, list) else [color]
            col = np.concatenate([np.asarray(c).reshape(-1, 3)[
                np.asarray(m).ravel() if not isinstance(m, slice) else m]
                for c, m in zip(cols, mask)])
            pct.visual.vertex_colors = uint8(col.reshape(-1, 3))
        else:
            pct.visual.vertex_colors = np.broadcast_to(uint8(color), pts.shape)

        if denoise:
            centroid = np.median(pct.vertices, axis=0)
            dist = np.linalg.norm(pct.vertices - centroid, axis=-1)
            ok = dist < np.quantile(dist, 0.99)
            pct = trimesh.PointCloud(pct.vertices[ok],
                                     color=pct.visual.vertex_colors[ok])
        self.scene.add_geometry(pct)
        return self

    def add_rgbd(self, image, depth, intrinsics=None, cam2world=None,
                 zfar=np.inf, mask=None):
        image = img_to_arr(image)
        if intrinsics is None:
            H, W, _ = image.shape
            focal = max(H, W)
            intrinsics = np.float32([[focal, 0, W / 2], [0, focal, H / 2],
                                     [0, 0, 1]])
        pts3d, mask2 = depthmap_to_absolute_camera_coordinates(
            depth, intrinsics, cam2world)
        mask2 = np.asarray(mask2) & (np.asarray(depth) < zfar)
        if mask is not None:
            mask2 &= mask
        return self.add_pointcloud(np.asarray(pts3d), image, mask=mask2)

    def add_camera(self, pose_c2w, focal=None, color=(0, 0, 0), image=None,
                   imsize=None, cam_size=0.03):
        image = img_to_arr(image) if image is not None else None
        if isinstance(focal, np.ndarray) and focal.shape == (3, 3):
            intrinsics = focal
            focal = (intrinsics[0, 0] * intrinsics[1, 1]) ** 0.5
            if imsize is None:
                imsize = (2 * intrinsics[0, 2], 2 * intrinsics[1, 2])
        add_scene_cam(self.scene, np.asarray(pose_c2w), color, image, focal,
                      imsize=imsize, screen_width=cam_size)
        return self

    def add_cameras(self, poses, focals=None, images=None, imsizes=None,
                    colors=None, **kw):
        def get(arr, i):
            return None if arr is None else arr[i]
        for i, pose_c2w in enumerate(poses):
            self.add_camera(pose_c2w, get(focals, i), image=get(images, i),
                            color=get(colors, i), imsize=get(imsizes, i), **kw)
        return self

    def show(self, point_size=2, **kw):
        return self.scene.show(line_settings={"point_size": point_size})


def show_raw_pointcloud(pts3d, colors, point_size=2):
    viz = SceneViz()
    viz.add_pointcloud(pts3d, colors)
    viz.show(point_size=point_size)


def cat(a, b):
    """Concatenate two (H, W, C) maps along rows (reference viz.py:322)."""
    return np.concatenate((np.asarray(a).reshape(-1, a.shape[-1]),
                           np.asarray(b).reshape(-1, b.shape[-1])))


def show_duster_pairs(view1, view2, pred1, pred2, conf_range=(1, 30)):
    """Interactive per-pair debug viewer (reference viz.py:90-113).

    Steps through every pair in a raw inference output: left column shows
    the two input images, right column their confidence maps (fixed
    display range so confidences compare across pairs), and an optional
    prompt opens the raw two-view pointcloud.
    """
    import matplotlib.pyplot as pl
    pl.ion()

    n_pairs = len(view1["instance"])
    for e in range(n_pairs):
        imgs = [rgb(v["img"][e]) for v in (view1, view2)]
        confs = [np.asarray(p["conf"][e]).squeeze() for p in (pred1, pred2)]
        score = confs[0].mean() * confs[1].mean()
        print(f">> Showing pair #{e} "
              f"{view1['idx'][e]}-{view2['idx'][e]} {score=:g}")
        pl.clf()
        for row, (im, cf) in enumerate(zip(imgs, confs)):
            pl.subplot(2, 2, 2 * row + 1).imshow(im)
            pl.subplot(2, 2, 2 * row + 2).imshow(cf, vmin=conf_range[0],
                                                 vmax=conf_range[1])
        pl.subplots_adjust(0, 0, 1, 1, 0, 0)
        if input("show pointcloud? (y/n) ") == "y":
            pts = [np.asarray(pred1["pts3d"][e]),
                   np.asarray(pred2["pts3d_in_other_view"][e])]
            show_raw_pointcloud(cat(*pts), cat(*imgs), point_size=5)


def show_raw_pointcloud_with_cams(imgs, pts3d, mask, focals, cams2world,
                                  point_size=2, cam_size=0.05, cam_color=None):
    viz = SceneViz()
    viz.add_pointcloud(list(pts3d), list(imgs), list(mask))
    for i, pose_c2w in enumerate(cams2world):
        color = (cam_color[i] if isinstance(cam_color, list)
                 else cam_color or CAM_COLORS[i % len(CAM_COLORS)])
        add_scene_cam(viz.scene, pose_c2w, color,
                      imgs[i] if i < len(imgs) else None, focals[i],
                      screen_width=cam_size)
    viz.show(point_size=point_size)


def segment_sky(image):
    """Heuristic HSV sky mask (reference viz.py:345-381)."""
    import cv2
    from scipy import ndimage

    image = np.asarray(image)
    if np.issubdtype(image.dtype, np.floating):
        image = np.uint8(255 * image.clip(0, 1))
    hsv = cv2.cvtColor(image, cv2.COLOR_BGR2HSV)

    lower_blue = np.array([0, 0, 100])
    upper_blue = np.array([30, 255, 255])
    mask = cv2.inRange(hsv, lower_blue, upper_blue).view(bool)

    mask |= (hsv[:, :, 1] < 10) & (hsv[:, :, 2] > 150)
    mask |= (hsv[:, :, 1] < 30) & (hsv[:, :, 2] > 180)
    mask |= (hsv[:, :, 1] < 50) & (hsv[:, :, 2] > 220)

    kernel = np.ones((5, 5), np.uint8)
    mask2 = ndimage.binary_opening(mask, structure=kernel)

    _, labels, stats, _ = cv2.connectedComponentsWithStats(
        mask2.view(np.uint8), connectivity=8)
    cc_sizes = stats[1:, cv2.CC_STAT_AREA]
    order = cc_sizes.argsort()[::-1]
    selection = []
    i = 0
    while i < len(order) and cc_sizes[order[i]] > cc_sizes[order[0]] / 2:
        selection.append(1 + order[i])
        i += 1
    return np.isin(labels, selection).reshape(labels.shape)
