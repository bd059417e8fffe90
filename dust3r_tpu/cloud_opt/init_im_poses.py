"""Initialization of the global aligner: MST propagation + RANSAC-PnP.

Behavioral contract: /root/reference/dust3r/cloud_opt/init_im_poses.py.
This is the host-side (numpy/scipy/cv2) part of the aligner - the reference
crosses to CPU here too (SURVEY.md §3.2); the TPU build quarantines it
completely: compute init on host, transfer parameters to device once.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import scipy.sparse as sp

from .commons import edge_str
from ..post_process import estimate_focal_knowing_depth
from ..utils.geometry import geotrf, inv, get_med_dist_between_poses
from ..utils.pose import (rigid_points_registration, sRT_to_4x4,
                          align_multiple_poses)


def estimate_focal(pts3d_i, pp=None):
    H, W, _ = pts3d_i.shape
    if pp is None:
        pp = np.array([W / 2, H / 2], np.float32)
    focal = estimate_focal_knowing_depth(
        np.asarray(pts3d_i)[None], np.asarray(pp)[None], focal_mode="weiszfeld")
    return float(np.asarray(focal).ravel()[0])


@lru_cache(maxsize=None)
def pixel_grid(H, W):
    return np.mgrid[:W, :H].T.astype(np.float32)


def fast_pnp(pts3d, focal, msk, pp=None, niter_PnP=10):
    """RANSAC-PnP for one image; tries 21 geomspace focals if unknown.

    Returns (focal, cam2world 4x4) or None.
    """
    import cv2

    msk = np.asarray(msk)
    if msk.sum() < 4:
        return None
    pts3d = np.asarray(pts3d, np.float32)
    H, W, _ = pts3d.shape
    pixels = pixel_grid(H, W)

    if focal is None:
        S = max(W, H)
        tentative_focals = np.geomspace(S / 2, S * 3, 21)
    else:
        tentative_focals = [focal]
    if pp is None:
        pp = (W / 2, H / 2)
    else:
        pp = np.asarray(pp)

    best = (0, None, None, None)
    for f in tentative_focals:
        K = np.float32([(f, 0, pp[0]), (0, f, pp[1]), (0, 0, 1)])
        success, R, T, inliers = cv2.solvePnPRansac(
            pts3d[msk], pixels[msk], K, None, iterationsCount=niter_PnP,
            reprojectionError=5, flags=cv2.SOLVEPNP_SQPNP)
        if success and len(inliers) > best[0]:
            best = (len(inliers), R, T, f)
    if not best[0]:
        return None
    _, R, T, best_focal = best
    R = cv2.Rodrigues(R)[0]  # world-to-cam rotation
    world2cam = sRT_to_4x4(1, R, T.ravel())
    return best_focal, np.asarray(inv(world2cam))


def _registration(pts_src, pts_tgt, conf):
    s, R, T = rigid_points_registration(
        np.asarray(pts_src).reshape(-1, 3), np.asarray(pts_tgt).reshape(-1, 3),
        weights=np.asarray(conf).reshape(-1))
    return float(s), np.asarray(R), np.asarray(T)


def minimum_spanning_tree(imshapes, edges, pred_i, pred_j, conf_i, conf_j,
                          im_conf, min_conf_thr, has_im_poses=True,
                          niter_PnP=10, verbose=True, edge_scores=None):
    """Build a consistent initial scene by walking the confidence MST.

    Returns (pts3d per image, msp_edges, im_focals, im_poses).
    """
    n_imgs = len(imshapes)
    if edge_scores is None:
        edge_scores = {(i, j): float(np.mean(conf_i[edge_str(i, j)]) *
                                     np.mean(conf_j[edge_str(i, j)]))
                       for i, j in edges}
    graph = sp.dok_array((n_imgs, n_imgs))
    for (i, j), score in edge_scores.items():
        graph[i, j] = -score
    msp = sp.csgraph.minimum_spanning_tree(graph).tocoo()

    todo = sorted(zip(-msp.data, msp.row, msp.col))  # best last
    pts3d = [None] * n_imgs
    im_poses = [None] * n_imgs
    im_focals = [None] * n_imgs

    score, i, j = todo.pop()
    if verbose:
        print(f" init edge ({i}*,{j}*) score={score}")
    s_ij = edge_str(i, j)
    pts3d[i] = np.array(pred_i[s_ij])
    pts3d[j] = np.array(pred_j[s_ij])
    done = {i, j}
    if has_im_poses:
        im_poses[i] = np.eye(4, dtype=np.float32)
        im_focals[i] = estimate_focal(pred_i[s_ij])

    msp_edges = [(i, j)]
    while todo:
        score, i, j = todo.pop()
        s_ij = edge_str(i, j)
        if im_focals[i] is None:
            im_focals[i] = estimate_focal(pred_i[s_ij])

        if i in done:
            if verbose:
                print(f" init edge ({i},{j}*) score={score}")
            assert j not in done
            s, R, T = _registration(pred_i[s_ij], pts3d[i], conf_i[s_ij])
            trf = np.asarray(sRT_to_4x4(s, R, T))
            pts3d[j] = np.asarray(geotrf(trf, pred_j[s_ij]))
            done.add(j)
            msp_edges.append((i, j))
            if has_im_poses and im_poses[i] is None:
                im_poses[i] = np.asarray(sRT_to_4x4(1, R, T))
        elif j in done:
            if verbose:
                print(f" init edge ({i}*,{j}) score={score}")
            assert i not in done
            s, R, T = _registration(pred_j[s_ij], pts3d[j], conf_j[s_ij])
            trf = np.asarray(sRT_to_4x4(s, R, T))
            pts3d[i] = np.asarray(geotrf(trf, pred_i[s_ij]))
            done.add(i)
            msp_edges.append((i, j))
            if has_im_poses and im_poses[i] is None:
                im_poses[i] = np.asarray(sRT_to_4x4(1, R, T))
        else:
            todo.insert(0, (score, i, j))  # retry later

    if has_im_poses:
        # fill remaining focals from best edges, poses via PnP
        pair_scores = np.array([-s for s in edge_scores.values()])
        edge_arr = np.array(list(edge_scores.keys()))
        for i, j in edge_arr[np.argsort(pair_scores)].tolist():
            if im_focals[i] is None:
                im_focals[i] = estimate_focal(pred_i[edge_str(i, j)])
        for i in range(n_imgs):
            if im_poses[i] is None:
                msk = im_conf[i] > min_conf_thr
                res = fast_pnp(pts3d[i], im_focals[i], msk=msk,
                               niter_PnP=niter_PnP)
                if res:
                    im_focals[i], im_poses[i] = res
            if im_poses[i] is None:
                im_poses[i] = np.eye(4, dtype=np.float32)
        im_poses = np.stack(im_poses)
    else:
        im_poses = im_focals = None

    return pts3d, msp_edges, im_focals, im_poses


def init_minimum_spanning_tree(scene, niter_PnP=10):
    pts3d, _, im_focals, im_poses = minimum_spanning_tree(
        scene.imshapes, scene.edges, scene.pred_i, scene.pred_j,
        scene.conf_i, scene.conf_j, scene.im_conf, scene.min_conf_thr,
        has_im_poses=scene.has_im_poses, niter_PnP=niter_PnP,
        verbose=scene.verbose, edge_scores=scene.edge_scores())
    return init_from_pts3d(scene, pts3d, im_focals, im_poses)


def init_from_pts3d(scene, pts3d, im_focals, im_poses):
    """Write per-image pointclouds/poses/focals into scene parameters."""
    nkp, known_poses_msk, known_poses = get_known_poses(scene)
    if nkp == 1:
        raise NotImplementedError(
            "Would be simpler to just align everything afterwards on the "
            "single known pose")
    if nkp > 1:
        s, R, T = align_multiple_poses(im_poses[known_poses_msk],
                                       known_poses[known_poses_msk])
        trf = np.asarray(sRT_to_4x4(float(s), np.asarray(R), np.asarray(T)))
        im_poses = trf @ im_poses
        im_poses[:, :3, :3] /= float(s)
        pts3d = [np.asarray(geotrf(trf, p)) for p in pts3d]

    # pairwise poses from conf-weighted registration
    for e, (i, j) in enumerate(scene.edges):
        s_ij = edge_str(i, j)
        s, R, T = _registration(scene.pred_i[s_ij], pts3d[i], scene.conf_i[s_ij])
        scene._set_pose("pw_poses", e, R, T, scale=s)

    s_factor = float(scene.get_pw_norm_scale_factor())
    im_poses[:, :3, 3] *= s_factor
    pts3d = [p * s_factor for p in pts3d]

    if scene.has_im_poses:
        for i in range(scene.n_imgs):
            cam2world = im_poses[i]
            depth = np.asarray(geotrf(inv(cam2world), pts3d[i]))[..., 2]
            scene._set_depthmap(i, depth)
            scene._set_pose("im_poses", i, cam2world)
            if im_focals[i] is not None:
                scene._set_focal(i, im_focals[i])

    if scene.verbose:
        print(" init loss =", scene.forward())


def get_known_poses(scene):
    if scene.has_im_poses:
        known_msk = ~np.asarray(scene.masks["im_poses"]).any(axis=1)
        known_poses = np.asarray(scene.get_im_poses())
        return int(known_msk.sum()), known_msk, known_poses
    return 0, None, None


def get_known_focals(scene):
    if scene.has_im_poses:
        known_msk = np.asarray(scene.get_known_focal_mask())
        # one focal per IMAGE: fx_and_fy scenes store (N, 2) — average the
        # pair like the reference (init_im_poses.py:44 im_focals[i].mean());
        # a flat reshape(-1) would misindex every image past the first
        focals = np.asarray(scene.get_focals()).reshape(scene.n_imgs, -1)
        focals = focals.mean(axis=1)
        return int(known_msk.sum()), known_msk, focals
    return 0, None, None


def init_from_known_poses(scene, niter_PnP=10, min_conf_thr=3):
    """Init pairwise poses/depths when all camera poses are preset
    (reference init_im_poses.py:23-63)."""
    nkp, known_msk, known_poses = get_known_poses(scene)
    assert nkp == scene.n_imgs, "not all poses are known"
    nkf, _, im_focals = get_known_focals(scene)
    assert nkf == scene.n_imgs
    im_pp = np.asarray(scene.get_principal_points())

    best_depthmaps = {}
    for e, (i, j) in enumerate(scene.edges):
        s_ij = edge_str(i, j)
        P1 = np.eye(4, dtype=np.float32)
        ci = np.asarray(scene.conf_i[s_ij])
        msk = ci > min(min_conf_thr, ci.min() - 0.1)
        res = fast_pnp(scene.pred_j[s_ij], float(im_focals[i]),
                       pp=im_pp[i], msk=msk, niter_PnP=niter_PnP)
        assert res is not None, f"PnP failed for edge {s_ij}"
        _, P2 = res

        s, R, T = align_multiple_poses(np.stack([P1, np.asarray(P2, np.float32)]),
                                       known_poses[[i, j]])
        scene._set_pose("pw_poses", e, np.asarray(R), np.asarray(T),
                        scale=float(s), force=True)

        score = float(ci.mean())
        if score > best_depthmaps.get(i, (0,))[0]:
            best_depthmaps[i] = score, s_ij, float(s)

    for n in range(scene.n_imgs):
        assert known_msk[n]
        _, s_ij, scale = best_depthmaps[n]
        depth = np.asarray(scene.pred_i[s_ij])[:, :, 2]
        scene._set_depthmap(n, depth * scale, force=True)
