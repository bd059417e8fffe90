"""Shared builders for the 2-process multihost test: both the worker
processes and the parent's single-process reference construct EXACTLY
this model, spec, and global batch (fixed seeds), so losses must agree
to numerical tolerance.
"""
import numpy as np

GLOBAL_BATCH = 4
N_DATA = 4  # data-axis width of the mesh (2 processes x 2 local devices)

TINY = dict(img_size=(32, 32), patch_size=16, enc_embed_dim=64, enc_depth=2,
            enc_num_heads=2, dec_embed_dim=48, dec_depth=2, dec_num_heads=2,
            attn_impl="ref")


def make_global_batch(B=GLOBAL_BATCH, H=32, W=32, seed=0):
    from dust3r_tpu.utils.geometry import (
        depthmap_to_absolute_camera_coordinates)

    rng = np.random.default_rng(seed)

    def view(s):
        K = np.float32([[40.0 + s, 0, W / 2], [0, 38.0 - s, H / 2],
                        [0, 0, 1]])
        pose = np.eye(4, dtype=np.float32)
        ang = 0.15 * (s + 1)
        pose[:3, :3] = np.float32([[np.cos(ang), 0, np.sin(ang)],
                                   [0, 1, 0],
                                   [-np.sin(ang), 0, np.cos(ang)]])
        depths, pts = [], []
        for _ in range(B):
            d = rng.uniform(0.5, 4, (H, W)).astype(np.float32)
            p, _ = depthmap_to_absolute_camera_coordinates(d, K, pose)
            depths.append(d), pts.append(p)
        return dict(img=rng.standard_normal((B, H, W, 3)).astype(np.float32),
                    pts3d=np.stack(pts).astype(np.float32),
                    valid_mask=np.stack([d > 0 for d in depths]),
                    camera_pose=np.broadcast_to(pose, (B, 4, 4)).copy())

    return (view(0), view(1))


def build_step(mesh):
    import jax

    from dust3r_tpu.losses import L21, ConfLoss, Regr3D
    from dust3r_tpu.models.model import AsymmetricCroCo3DStereo
    from dust3r_tpu.training import TrainSpec, build_train_step

    model = AsymmetricCroCo3DStereo(**TINY)
    probe = np.zeros((1, 32, 32, 3), np.float32)
    params = model.init(jax.random.PRNGKey(0), probe, probe)
    spec = TrainSpec(lr=1e-3, warmup_epochs=0, epochs=1, amp=False)
    step = build_train_step(model, ConfLoss(Regr3D(L21), alpha=0.2), spec,
                            mesh=mesh)
    return step, spec, model, params
