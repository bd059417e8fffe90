"""Render equirectangular environment maps with habitat-sim (optional dep).

Behavioral contract: /root/reference/datasets_preprocess/habitat/
habitat_renderer/habitat_sim_envmaps_renderer.py (equirectangular color +
depth sensors, cubemap-derived depth rescaled to ray distance, navmesh
loading/recompute, lazy per-process simulator init).
"""
import math

import numpy as np

from . import projections

CUBEMAP_FACE_LABELS = ["left", "front", "right", "back", "up", "down"]
CUBEMAP_FACE_ORIENTATIONS_ROTVEC = [
    [0, math.pi / 2, 0],
    [0, 0, 0],
    [0, -math.pi / 2, 0],
    [0, math.pi, 0],
    [math.pi / 2, 0, 0],
    [-math.pi / 2, 0, 0],
]


class NoNaviguableSpaceError(RuntimeError):
    pass


class HabitatEnvironmentMapRenderer:
    def __init__(self, scene, navmesh, scene_dataset_config_file,
                 render_equirectangular=False,
                 equirectangular_resolution=(512, 1024),
                 render_cubemap=False, cubemap_resolution=(512, 512),
                 render_depth=False, gpu_id=0):
        self.scene = scene
        self.navmesh = navmesh
        self.scene_dataset_config_file = scene_dataset_config_file
        self.gpu_id = gpu_id
        self.render_equirectangular = render_equirectangular
        self.equirectangular_resolution = equirectangular_resolution
        self.equirectangular_projection = \
            projections.EquirectangularProjection(*equirectangular_resolution)
        rays = projections.get_projection_rays(
            self.equirectangular_projection)
        rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
        # habitat depth comes from internal cubemap warping: rescale to
        # ray distance
        self.equirectangular_depth_scale_factors = \
            1.0 / np.max(np.abs(rays), axis=-1)
        self.render_cubemap = render_cubemap
        self.cubemap_resolution = cubemap_resolution
        self.render_depth = render_depth
        self.seed = None
        self._lazy_initialization()

    def _lazy_initialization(self):
        import habitat_sim  # optional host dependency

        if self.seed is not None:
            return
        np.random.seed()
        self.seed = np.random.randint(2 ** 32 - 1)
        sim_cfg = habitat_sim.SimulatorConfiguration()
        sim_cfg.scene_id = self.scene
        if self.scene_dataset_config_file:
            sim_cfg.scene_dataset_config_file = \
                self.scene_dataset_config_file
        sim_cfg.random_seed = self.seed
        sim_cfg.load_semantic_mesh = False
        sim_cfg.gpu_device_id = self.gpu_id

        sensors = []
        if self.render_cubemap:
            for face_id, orientation in \
                    enumerate(CUBEMAP_FACE_ORIENTATIONS_ROTVEC):
                for kind, stype in [("color", habitat_sim.SensorType.COLOR)] \
                        + ([("depth", habitat_sim.SensorType.DEPTH)]
                           if self.render_depth else []):
                    spec = habitat_sim.CameraSensorSpec()
                    spec.uuid = \
                        f"{kind}_cubemap_{CUBEMAP_FACE_LABELS[face_id]}"
                    spec.sensor_type = stype
                    spec.resolution = self.cubemap_resolution
                    spec.hfov = 90
                    spec.position = [0.0, 0.0, 0.0]
                    spec.orientation = orientation
                    sensors.append(spec)
        if self.render_equirectangular:
            spec = habitat_sim.bindings.EquirectangularSensorSpec()
            spec.uuid = "color_equirectangular"
            spec.resolution = self.equirectangular_resolution
            spec.position = [0.0, 0.0, 0.0]
            sensors.append(spec)
            if self.render_depth:
                spec = habitat_sim.bindings.EquirectangularSensorSpec()
                spec.uuid = "depth_equirectangular"
                spec.sensor_type = habitat_sim.SensorType.DEPTH
                spec.resolution = self.equirectangular_resolution
                spec.position = [0.0, 0.0, 0.0]
                sensors.append(spec)

        agent_cfg = habitat_sim.agent.AgentConfiguration(
            sensor_specifications=sensors)
        self.sim = habitat_sim.Simulator(
            habitat_sim.Configuration(sim_cfg, [agent_cfg]))
        if self.navmesh:
            self.sim.pathfinder.load_nav_mesh(self.navmesh)
        if not self.sim.pathfinder.is_loaded:
            settings = habitat_sim.NavMeshSettings()
            settings.set_defaults()
            self.sim.recompute_navmesh(self.sim.pathfinder, settings, True)
        if not self.sim.pathfinder.is_loaded:
            raise NoNaviguableSpaceError(
                f"No naviguable location (scene: {self.scene})")
        self.agent = self.sim.initialize_agent(agent_id=0)

    def close(self):
        if hasattr(self, "sim"):
            self.sim.close()

    def __del__(self):
        self.close()

    def render_viewpoint(self, viewpoint_position):
        import habitat_sim

        agent_state = habitat_sim.AgentState()
        agent_state.position = viewpoint_position
        self.agent.set_state(agent_state)
        obs = self.sim.get_sensor_observations(agent_ids=0)
        if "depth_equirectangular" in obs:
            obs["depth_equirectangular"] *= \
                self.equirectangular_depth_scale_factors
        return dict(observations=obs, position=viewpoint_position)

    def up_direction(self):
        import habitat_sim

        return np.asarray(habitat_sim.geo.UP).tolist()

    def R_cam_to_world(self):
        import habitat_sim

        return np.stack((habitat_sim.geo.RIGHT, -habitat_sim.geo.UP,
                         habitat_sim.geo.FRONT), axis=0).tolist()
