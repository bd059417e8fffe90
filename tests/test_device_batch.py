"""Host->device batch-transfer discipline (training._host_view and the
in-graph gt pointmap lift): the training step ships depth (1 plane)
instead of gt pts3d (3 planes) and rebuilds the pointmaps on device
(utils/geometry.depth_to_world_pts3d), and packs every scalar metric
into one vector so the loop does ONE host pull per step.
"""
import numpy as np
import jax
import jax.numpy as jnp

from dust3r_tpu.losses import L21, ConfLoss, Regr3D
from dust3r_tpu.models.model import AsymmetricCroCo3DStereo
from dust3r_tpu.training import (TrainSpec, _batch_to_device, _host_view,
                                 build_train_step, init_train_state,
                                 loss_of_one_batch)
from dust3r_tpu.utils.geometry import (
    depth_to_world_pts3d, depthmap_to_absolute_camera_coordinates)

TINY = dict(img_size=(32, 32), patch_size=16, enc_embed_dim=64, enc_depth=2,
            enc_num_heads=2, dec_embed_dim=48, dec_depth=2, dec_num_heads=2,
            attn_impl="ref")


def geom_views(B=2, H=32, W=32, seed=0, portrait=False):
    """Views with consistent depth+K+pose AND the host-computed pts3d."""
    rng = np.random.default_rng(seed)

    def view(s):
        K = np.float32([[40.0 + s, 0, W / 2], [0, 38.0 - s, H / 2],
                        [0, 0, 1]])
        pose = np.eye(4, dtype=np.float32)
        ang = 0.2 * (s + 1)
        pose[:3, :3] = np.float32([[np.cos(ang), 0, np.sin(ang)],
                                   [0, 1, 0],
                                   [-np.sin(ang), 0, np.cos(ang)]])
        pose[:3, 3] = rng.standard_normal(3) * 0.2
        Ks, poses, depths, pts, masks = [], [], [], [], []
        for _ in range(B):
            depth = rng.uniform(0.5, 4, (H, W)).astype(np.float32)
            Kb = K.copy()
            if portrait:
                # transpose_to_landscape stores portrait samples with
                # swapped axes and row-permuted K (K[[1,0,2]])
                p, _ = depthmap_to_absolute_camera_coordinates(
                    depth, Kb, pose)
                depth, p = depth.T, p.swapaxes(0, 1)
                Kb = Kb[[1, 0, 2]]
            else:
                p, _ = depthmap_to_absolute_camera_coordinates(
                    depth, Kb, pose)
            Ks.append(Kb), poses.append(pose), depths.append(depth)
            pts.append(p), masks.append(depth > 0)
        return dict(
            img=rng.standard_normal((B, depths[0].shape[0],
                                     depths[0].shape[1], 3))
            .astype(np.float32),
            depthmap=np.stack(depths), camera_intrinsics=np.stack(Ks),
            camera_pose=np.stack(poses), pts3d=np.stack(pts),
            valid_mask=np.stack(masks))

    return view(0), view(1)


class TestDepthToWorldPts3d:
    def test_matches_host_path(self):
        v1, _ = geom_views()
        dev = depth_to_world_pts3d(jnp.asarray(v1["depthmap"]),
                                   jnp.asarray(v1["camera_intrinsics"]),
                                   jnp.asarray(v1["camera_pose"]))
        np.testing.assert_allclose(np.asarray(dev), v1["pts3d"],
                                   rtol=1e-5, atol=1e-5)

    def test_matches_host_path_portrait_K(self):
        """Row-permuted intrinsics (transpose_to_landscape storage)."""
        v1, _ = geom_views(portrait=True)
        dev = depth_to_world_pts3d(jnp.asarray(v1["depthmap"]),
                                   jnp.asarray(v1["camera_intrinsics"]),
                                   jnp.asarray(v1["camera_pose"]))
        np.testing.assert_allclose(np.asarray(dev), v1["pts3d"],
                                   rtol=1e-5, atol=1e-5)


class TestHostView:
    def test_drops_pts3d_when_depth_present(self):
        v1, _ = geom_views()
        out = _host_view(v1)
        assert "pts3d" not in out and "depthmap" in out
        assert "camera_intrinsics" in out and "camera_pose" in out

    def test_ships_pts3d_without_depth(self):
        v1, _ = geom_views()
        v1.pop("depthmap")
        out = _host_view(v1)
        assert "pts3d" in out and "depthmap" not in out

    def test_img_dtype_cast(self):
        v1, _ = geom_views()
        out = _host_view(v1, img_dtype=jnp.bfloat16)
        assert out["img"].dtype == jnp.bfloat16
        assert _host_view(v1)["img"].dtype == np.float32


class TestTrainStepDepthShipping:
    def _loss_of(self, batch_builder):
        model = AsymmetricCroCo3DStereo(**TINY)
        v1, v2 = geom_views()
        batch = (batch_builder(v1), batch_builder(v2))
        params = model.init(jax.random.PRNGKey(0),
                            batch[0]["img"], batch[1]["img"])
        crit = ConfLoss(Regr3D(L21), alpha=0.2)
        (loss, _), _ = jax.jit(
            lambda p, b: loss_of_one_batch(model, p, crit, b))(params, batch)
        return float(loss)

    def test_depth_shipped_loss_matches_pts3d_shipped(self):
        def with_depth(v):
            return _batch_to_device(v)  # drops pts3d, ships depth

        def with_pts3d(v):
            v = dict(v)
            v.pop("depthmap")
            return _batch_to_device(v)

        l_depth = self._loss_of(with_depth)
        l_pts = self._loss_of(with_pts3d)
        np.testing.assert_allclose(l_depth, l_pts, rtol=1e-5)

    def test_packed_metrics_match_dict(self):
        model = AsymmetricCroCo3DStereo(**TINY)
        v1, v2 = geom_views()
        batch = (_batch_to_device(v1), _batch_to_device(v2))
        params = model.init(jax.random.PRNGKey(0),
                            batch[0]["img"], batch[1]["img"])
        spec = TrainSpec(lr=1e-3, warmup_epochs=0, epochs=1, amp=False)
        step = build_train_step(model, ConfLoss(Regr3D(L21), alpha=0.2),
                                spec)
        state = init_train_state(params, spec)
        state, metrics = step(state, batch, jnp.asarray(0.0))
        names = step.packed_names
        assert "loss" in names and "grad_norm" in names
        packed = np.asarray(metrics["_packed"])
        assert packed.shape == (len(names),)
        for k, v in zip(names, packed):
            np.testing.assert_allclose(v, float(metrics[k]), rtol=1e-6)
