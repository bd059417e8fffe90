"""Focal estimation from pointmaps (median / Weiszfeld-IRLS).

Behavioral contract: /root/reference/dust3r/post_process.py:12-60.
Pure-JAX, jittable (static shapes, fixed 10 IRLS iterations via lax.fori_loop).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .utils.geometry import xy_grid, masked_median

FOCAL_BASE_TAN = 2 * np.tan(np.deg2rad(60) / 2)  # 60 deg FOV base


def estimate_focal_knowing_depth(pts3d, pp, focal_mode="median",
                                 min_focal=0.0, max_focal=np.inf):
    """Estimate a single focal per image from a (B, H, W, 3) pointmap.

    pp: (B, 2) principal points in pixels. Returns (B,) focals, clipped
    around the 60-degree-FOV base focal.
    """
    pts3d = jnp.asarray(pts3d)
    B, H, W, _ = pts3d.shape
    pp = jnp.asarray(pp).reshape(-1, 1, 2)

    pixels = xy_grid(W, H, dtype=pts3d.dtype).reshape(1, -1, 2) - pp  # (B, HW, 2)
    pts = pts3d.reshape(B, -1, 3)

    if focal_mode == "median":
        u, v = pixels[..., 0], pixels[..., 1]
        x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
        fx_votes = (u * z) / x
        fy_votes = (v * z) / y
        f_votes = jnp.concatenate([fx_votes, fy_votes], axis=-1)
        focal = masked_median(f_votes, jnp.isfinite(f_votes), axis=-1)
        focal = jax.lax.stop_gradient(focal)
    elif focal_mode == "weiszfeld":
        xy_over_z = pts[..., :2] / pts[..., 2:3]
        xy_over_z = jnp.nan_to_num(xy_over_z, nan=0.0, posinf=0.0, neginf=0.0)
        dot_xy_px = jnp.sum(xy_over_z * pixels, axis=-1)  # (B, HW)
        dot_xy_xy = jnp.sum(xy_over_z * xy_over_z, axis=-1)
        focal = jnp.mean(dot_xy_px, axis=1) / jnp.mean(dot_xy_xy, axis=1)

        def body(_, focal):
            dis = jnp.linalg.norm(pixels - focal[:, None, None] * xy_over_z, axis=-1)
            w = 1.0 / jnp.clip(dis, 1e-8)
            return jnp.mean(w * dot_xy_px, axis=1) / jnp.mean(w * dot_xy_xy, axis=1)

        focal = jax.lax.fori_loop(0, 10, body, focal)
    else:
        raise ValueError(f"bad focal_mode {focal_mode}")

    focal_base = max(H, W) / FOCAL_BASE_TAN
    return jnp.clip(focal, min_focal * focal_base, max_focal * focal_base)
