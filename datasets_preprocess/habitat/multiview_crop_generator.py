"""Generate perspective crops from habitat environment maps.

Behavioral contract: /root/reference/datasets_preprocess/habitat/
habitat_renderer/multiview_crop_generator.py. The habitat-sim renderer is
an optional host dependency (gated import).
"""
import collections
import os

import numpy as np

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

from . import projections

ViewpointData = collections.namedtuple(
    "ViewpointData", ["colormap", "distancemap", "pointmap", "position"])


class HabitatMultiviewCrops:
    def __init__(self, scene, navmesh, scene_dataset_config_file,
                 equirectangular_resolution=(400, 800),
                 crop_resolution=(240, 320), pixel_jittering_iterations=5,
                 jittering_noise_level=1.0):
        from .habitat_sim_envmaps_renderer import \
            HabitatEnvironmentMapRenderer  # optional dep (habitat-sim)

        self.crop_resolution = crop_resolution
        self.pixel_jittering_iterations = pixel_jittering_iterations
        self.jittering_noise_level = jittering_noise_level

        self.lowres_envmap_renderer = HabitatEnvironmentMapRenderer(
            scene=scene, navmesh=navmesh,
            scene_dataset_config_file=scene_dataset_config_file,
            equirectangular_resolution=equirectangular_resolution,
            render_depth=True, render_equirectangular=True)
        self.R_cam_to_world = np.asarray(
            self.lowres_envmap_renderer.R_cam_to_world())
        self.up_direction = np.asarray(
            self.lowres_envmap_renderer.up_direction())

        self.envmap_height, self.envmap_width = \
            self.lowres_envmap_renderer.equirectangular_resolution
        base = projections.EquirectangularProjection(self.envmap_height,
                                                     self.envmap_width)
        self.envmap_projection = projections.RotatedProjection(
            base, self.R_cam_to_world.T)
        self.envmap_rays = projections.get_projection_rays(
            self.envmap_projection)

    def compute_pointmap(self, distancemap, position):
        return self.envmap_rays * distancemap[:, :, None] + position

    def render_viewpoint_data(self, position):
        data = self.lowres_envmap_renderer.render_viewpoint(
            np.asarray(position))
        colormap = data["observations"]["color_equirectangular"][..., :3]
        distancemap = data["observations"]["depth_equirectangular"]
        pointmap = self.compute_pointmap(distancemap, position)
        return ViewpointData(colormap=colormap, distancemap=distancemap,
                             pointmap=pointmap, position=position)

    def extract_cropped_camera(self, projection, color_image, distancemap,
                               pointmap, voxelmap=None):
        import cv2

        remapper = projections.RemapProjection(
            input_projection=self.envmap_projection,
            output_projection=projection,
            pixel_jittering_iterations=self.pixel_jittering_iterations,
            jittering_noise_level=self.jittering_noise_level)
        color = remapper.convert(color_image,
                                 interpolation=cv2.INTER_LINEAR,
                                 borderMode=cv2.BORDER_WRAP,
                                 single_map=False)
        dist = remapper.convert(distancemap,
                                interpolation=cv2.INTER_NEAREST,
                                borderMode=cv2.BORDER_WRAP, single_map=True)
        pts = remapper.convert(pointmap, interpolation=cv2.INTER_NEAREST,
                               borderMode=cv2.BORDER_WRAP, single_map=True)
        vox = (None if voxelmap is None else remapper.convert(
            voxelmap, interpolation=cv2.INTER_NEAREST,
            borderMode=cv2.BORDER_WRAP, single_map=True))
        # distance (along the ray) -> depth (z)
        depth = np.asarray(dist / np.linalg.norm(remapper.output_rays,
                                                 axis=-1), dtype=dist.dtype)
        return color, depth, pts, vox


def perspective_projection_to_dict(persp_projection, position):
    return dict(
        camera_intrinsics=projections.colmap_to_opencv_intrinsics(
            persp_projection.base_projection.K).tolist(),
        size=(persp_projection.base_projection.width,
              persp_projection.base_projection.height),
        R_cam2world=persp_projection.R_to_base_projection.T.tolist(),
        t_cam2world=position)


def dict_to_perspective_projection(camera_params):
    K = projections.opencv_to_colmap_intrinsics(
        np.asarray(camera_params["camera_intrinsics"]))
    size = camera_params["size"]
    R_cam2world = np.asarray(camera_params["R_cam2world"])
    projection = projections.PerspectiveProjection(K, height=size[1],
                                                   width=size[0])
    projection = projections.RotatedProjection(
        projection, R_to_base_projection=R_cam2world.T)
    return projection, camera_params["t_cam2world"]
