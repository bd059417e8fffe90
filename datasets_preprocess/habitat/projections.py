"""3D/2D projection models for sampling virtual cameras from envmaps.

Behavioral contract: /root/reference/datasets_preprocess/habitat/
habitat_renderer/projections.py (equirectangular + perspective + rotated
projections, OpenCV axes with (0,0) top-left pixel centers).
"""
import numpy as np


class EquirectangularProjection:
    """+X right, +Y down, +Z out; top-left pixel center at (0, 0)."""

    def __init__(self, height, width):
        self.height = height
        self.width = width
        self.u_scaling = (2 * np.pi) / self.width
        self.v_scaling = np.pi / self.height

    def unproject(self, u, v):
        longitude = self.u_scaling * u - np.pi
        minus_latitude = self.v_scaling * v - np.pi / 2
        cos_lat = np.cos(minus_latitude)
        x = np.sin(longitude) * cos_lat
        z = np.cos(longitude) * cos_lat
        y = np.sin(minus_latitude)
        return np.stack([x, y, z], axis=-1)

    def project(self, rays):
        rays = rays / np.linalg.norm(rays, axis=-1, keepdims=True)
        x, y, z = rays[..., 0], rays[..., 1], rays[..., 2]
        longitude = np.arctan2(x, z)
        minus_latitude = np.arcsin(y)
        u = (longitude + np.pi) / self.u_scaling
        v = (minus_latitude + np.pi / 2) / self.v_scaling
        return u, v


class PerspectiveProjection:
    def __init__(self, K, height, width):
        self.height = height
        self.width = width
        self.K = K
        self.Kinv = np.linalg.inv(K)

    def project(self, rays):
        uvh = np.einsum("ik,...k->...i", self.K, rays)
        uv = uvh[..., :2] / uvh[..., 2, None]
        return uv[..., 0], uv[..., 1]

    def unproject(self, u, v):
        uvh = np.stack((u, v, np.ones_like(u)), axis=-1)
        return np.einsum("ik,...k->...i", self.Kinv, uvh)


class RotatedProjection:
    def __init__(self, base_projection, R_to_base_projection):
        self.base_projection = base_projection
        self.R_to_base_projection = R_to_base_projection

    @property
    def width(self):
        return self.base_projection.width

    @property
    def height(self):
        return self.base_projection.height

    def project(self, rays):
        if self.R_to_base_projection is not None:
            rays = np.einsum("ik,...k->...i", self.R_to_base_projection, rays)
        return self.base_projection.project(rays)

    def unproject(self, u, v):
        rays = self.base_projection.unproject(u, v)
        if self.R_to_base_projection is not None:
            rays = np.einsum("ik,...k->...i", self.R_to_base_projection.T,
                             rays)
        return rays


def get_projection_rays(projection, noise_level=0):
    """2D map of 3D rays for the projection, with optional pixel jitter."""
    grid_u, grid_v = np.meshgrid(0.5 + np.arange(projection.width),
                                 0.5 + np.arange(projection.height))
    if noise_level > 0:
        grid_u += np.clip(0, noise_level * np.random.uniform(
            -0.5, 0.5, size=grid_u.shape), projection.width)
        grid_v += np.clip(0, noise_level * np.random.uniform(
            -0.5, 0.5, size=grid_v.shape), projection.height)
    return projection.unproject(grid_u, grid_v)


def compute_camera_intrinsics(height, width, hfov):
    f = width / 2 / np.tan(hfov / 2 * np.pi / 180)
    return f, width / 2, height / 2


def colmap_to_opencv_intrinsics(K):
    K = K.copy()
    K[0, 2] -= 0.5
    K[1, 2] -= 0.5
    return K


def opencv_to_colmap_intrinsics(K):
    K = K.copy()
    K[0, 2] += 0.5
    K[1, 2] += 0.5
    return K


class RemapProjection:
    """Remap data between projections with optional anti-alias jittering
    (reference projections_conversions.py)."""

    def __init__(self, input_projection, output_projection,
                 pixel_jittering_iterations=0, jittering_noise_level=0):
        assert jittering_noise_level >= 0
        assert pixel_jittering_iterations >= 0
        maps = []
        self.output_rays = get_projection_rays(output_projection)
        map_u, map_v = input_projection.project(self.output_rays)
        maps.append((np.float32(map_u), np.float32(map_v)))
        for _ in range(pixel_jittering_iterations):
            rays = get_projection_rays(output_projection,
                                       jittering_noise_level)
            map_u, map_v = input_projection.project(rays)
            maps.append((np.float32(map_u), np.float32(map_v)))
        self.maps = maps

    def convert(self, img, interpolation=None, borderMode=None,
                single_map=False):
        import cv2

        interpolation = cv2.INTER_LINEAR if interpolation is None \
            else interpolation
        borderMode = cv2.BORDER_WRAP if borderMode is None else borderMode
        remapped = []
        for map_u, map_v in self.maps:
            remapped.append(cv2.remap(img, map_u, map_v,
                                      interpolation=interpolation,
                                      borderMode=borderMode))
            if single_map:
                break
        if len(remapped) == 1:
            return remapped[0]
        return np.asarray(np.mean(remapped, axis=0), dtype=img.dtype)
