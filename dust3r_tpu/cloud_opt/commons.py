"""Shared pieces of the global aligner: edge bookkeeping, confidence
transforms, weighted distances, LR schedules.

Behavioral contract: /root/reference/dust3r/cloud_opt/commons.py:12-90.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def edge_str(i, j):
    return f"{i}_{j}"


def compute_edge_scores(edges, conf_i, conf_j):
    """{(i, j): mean(conf_i_edge) * mean(conf_j_edge)} for MST weighting."""
    return {(i, j): float(np.mean(conf_i[e]) * np.mean(conf_j[e]))
            for e, (i, j) in enumerate(edges)}


def get_imshapes(edges, pred_i, pred_j):
    n_imgs = max(max(e) for e in edges) + 1
    imshapes = [None] * n_imgs
    for e, (i, j) in enumerate(edges):
        shape_i = tuple(pred_i[e].shape[0:2])
        shape_j = tuple(pred_j[e].shape[0:2])
        if imshapes[i] is not None:
            assert imshapes[i] == shape_i, f"incorrect shape for image {i}"
        if imshapes[j] is not None:
            assert imshapes[j] == shape_j, f"incorrect shape for image {j}"
        imshapes[i] = shape_i
        imshapes[j] = shape_j
    return imshapes


def get_conf_trf(mode):
    if mode == "log":
        return jnp.log
    if mode == "sqrt":
        return jnp.sqrt
    if mode == "m1":
        return lambda x: x - 1
    if mode in ("id", "none"):
        return lambda x: x
    raise ValueError(f"bad conf mode {mode}")


def get_conf_trf_np(mode):
    """Host-numpy twin of get_conf_trf: scene construction transforms one
    array per edge, and doing that on device costs a dispatch round trip
    each (minutes of build time on tunneled chips at 600 edges)."""
    import numpy as np

    if mode == "log":
        return np.log
    if mode == "sqrt":
        return np.sqrt
    if mode == "m1":
        return lambda x: x - 1
    if mode in ("id", "none"):
        return lambda x: x
    raise ValueError(f"bad conf mode {mode}")


def l2_dist(a, b, weight):
    return jnp.sum(jnp.square(a - b), axis=-1) * weight


def l1_dist(a, b, weight):
    # grad-safe euclidean norm: jnp.linalg.norm has NaN gradient at exactly
    # zero distance (which occurs after a near-perfect MST init); clamping
    # the squared norm keeps the gradient finite (and zero) there.
    sq = jnp.sum(jnp.square(a - b), axis=-1)
    return jnp.sqrt(jnp.maximum(sq, 1e-16)) * weight


ALL_DISTS = dict(l1=l1_dist, l2=l2_dist)


def planar_dist(mode, d2):
    """Per-pixel distance from the squared distance, for the planar loss
    path where the coordinate axis is unrolled (base_opt._grouped_term): the
    three squared diffs are accumulated plane-by-plane and only the final
    scalarization differs per mode. Same grad-safe clamp as l1_dist."""
    if mode == "l1":
        return jnp.sqrt(jnp.maximum(d2, 1e-16))
    if mode == "l2":
        return d2
    raise ValueError(f"bad dist mode {mode}")


def cosine_schedule(t, lr_start, lr_end):
    return lr_end + (lr_start - lr_end) * (1 + np.cos(t * np.pi)) / 2


def linear_schedule(t, lr_start, lr_end):
    return lr_start + (lr_end - lr_start) * t


def make_lr_schedule(schedule, niter, lr_base, lr_min):
    """Precomputed per-iteration LR array (host) for the scan loop."""
    t = np.arange(niter) / niter
    if schedule == "cosine":
        lrs = cosine_schedule(t, lr_base, lr_min)
    elif schedule == "linear":
        lrs = linear_schedule(t, lr_base, lr_min)
    else:
        raise ValueError(f"bad lr schedule {schedule}")
    return jnp.asarray(lrs, dtype=jnp.float32)
