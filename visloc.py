#!/usr/bin/env python3
"""Visual localization benchmark driver.

Behavioral contract: /root/reference/visloc.py:50-193. Per query: run the
two-view model on (query, top-k map view) pairs, threshold by confidence,
match reciprocal 3D nearest neighbors, lift matches to the map's sparse 3D,
round-trip coordinates to the original resolution, RANSAC-PnP, report
median/accuracy pose-error stats in LTVL format.
"""
import argparse
import math
import random

import numpy as np

from dust3r_tpu.inference import InferenceEngine, inference
from dust3r_tpu.checkpoint import from_pretrained
from dust3r_tpu.utils.geometry import find_reciprocal_matches, xy_grid, geotrf
from dust3r_tpu.visloc.datasets import (VislocSevenScenes,  # noqa: F401
                                        VislocCambridgeLandmarks,
                                        VislocAachenDayNight, VislocInLoc)
from dust3r_tpu.visloc.localization import run_pnp
from dust3r_tpu.visloc.evaluation import (get_pose_error, aggregate_stats,
                                          export_results)


def get_args_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser_weights = parser.add_mutually_exclusive_group(required=True)
    parser_weights.add_argument("--weights", type=str, default=None)
    parser_weights.add_argument("--model_name", type=str,
                                choices=["DUSt3R_ViTLarge_BaseDecoder_512_dpt",
                                         "DUSt3R_ViTLarge_BaseDecoder_512_linear",
                                         "DUSt3R_ViTLarge_BaseDecoder_224_linear"])
    parser.add_argument("--confidence_threshold", type=float, default=3.0)
    parser.add_argument("--device", type=str, default="tpu")
    parser.add_argument("--pnp_mode", type=str, default="cv2",
                        choices=["cv2", "poselib", "pycolmap"])
    parser_reproj = parser.add_mutually_exclusive_group()
    parser_reproj.add_argument("--reprojection_error", type=float, default=5.0)
    parser_reproj.add_argument("--reprojection_error_diag_ratio", type=float,
                               default=None)
    parser.add_argument("--pnp_max_points", type=int, default=100_000)
    parser.add_argument("--viz_matches", type=int, default=0)
    parser.add_argument("--quantize", type=str, default=None,
                        choices=["int8"],
                        help="int8 serving mode: transformer gemms on int8 "
                             "MXU operands (ops/quant.py; ~1.12x forward)")
    parser.add_argument("--serving", action="store_true",
                        help="the measured best serving config: int8 block "
                             "gemms + bf16 heads (1.16x the parity config)")
    parser.add_argument("--mesh", type=int, default=0,
                        help="shard inference batches over this many "
                             "devices (0 = off)")
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--output_label", type=str, default="")
    return parser


def localize_query(engine, views, conf_thr, pnp_mode, reprojection_error,
                   reprojection_error_diag_ratio, pnp_max_points,
                   viz_matches=0, viz_path_prefix=None):
    """Estimate one query pose from its top-k map views.

    With viz_matches > 0, draws that many reciprocal matches per map view
    (reference visloc.py:127-146); saved to {viz_path_prefix}_k.png when a
    prefix is given, shown interactively otherwise.

    Returns (success, cam2world or None)."""
    query_view = views[0]
    map_views = views[1:]

    query_pts2d = []
    query_pts3d = []
    for map_view in map_views:
        imgs = []
        for idx, img in enumerate([query_view["rgb_rescaled"],
                                   map_view["rgb_rescaled"]]):
            imgs.append(dict(img=np.asarray(img, np.float32)[None],
                             true_shape=np.int32([img.shape[:2]]),
                             idx=idx, instance=str(idx)))
        output = inference([tuple(imgs)], engine, verbose=False)
        pred1, pred2 = output["pred1"], output["pred2"]
        conf_masks = [np.asarray(pred1["conf"])[0] >= conf_thr,
                      (np.asarray(pred2["conf"])[0] >= conf_thr)
                      & np.asarray(map_view["valid_rescaled"])]
        pts3d = [np.asarray(pred1["pts3d"])[0],
                 np.asarray(pred2["pts3d_in_other_view"])[0]]

        pts2d_list, pts3d_list = [], []
        for i in range(2):
            conf_i = conf_masks[i]
            H, W = imgs[i]["true_shape"][0]
            pts2d_list.append(np.asarray(xy_grid(W, H))[conf_i])
            pts3d_list.append(pts3d[i][conf_i])

        PQ, PM = pts3d_list[0], pts3d_list[1]
        if len(PQ) == 0 or len(PM) == 0:
            continue
        reciprocal_in_PM, nnM_in_PQ, num_matches = \
            find_reciprocal_matches(PQ, PM)
        matches_im1 = pts2d_list[1][reciprocal_in_PM].astype(np.int64)
        matches_im0 = pts2d_list[0][nnM_in_PQ][reciprocal_in_PM]
        valid_pts3d = np.asarray(map_view["pts3d_rescaled"])[
            matches_im1[:, 1], matches_im1[:, 0]]

        # cv2 -> colmap -> original resolution -> cv2
        matches_im0 = matches_im0.astype(np.float64) + 0.5
        matches_im0 = np.asarray(geotrf(query_view["to_orig"], matches_im0,
                                        norm=True)) - 0.5

        if viz_matches > 0:
            from dust3r_tpu.visloc.utils import plot_matches
            # map-view matches lifted to ITS original resolution (the
            # reference reuses the query transform here, visloc.py:121 -
            # same bucket in practice; per-view is strictly correct)
            m1_orig = np.asarray(geotrf(
                map_view["to_orig"],
                matches_im1.astype(np.float64) + 0.5, norm=True)) - 0.5
            save = (f"{viz_path_prefix}_{map_view.get('idx', 0)}.png"
                    if viz_path_prefix else None)
            plot_matches(query_view["rgb"], map_view["rgb"],
                         matches_im0, m1_orig, n_viz=viz_matches,
                         save_path=save)

        finite = np.isfinite(valid_pts3d.sum(axis=-1))
        if finite.any():
            query_pts3d.append(valid_pts3d[finite])
            query_pts2d.append(matches_im0[finite])

    if len(query_pts2d) == 0:
        return False, None
    query_pts2d = np.concatenate(query_pts2d, axis=0).astype(np.float32)
    query_pts3d = np.concatenate(query_pts3d, axis=0)
    if len(query_pts2d) > pnp_max_points:
        idxs = random.sample(range(len(query_pts2d)), pnp_max_points)
        query_pts3d = query_pts3d[idxs]
        query_pts2d = query_pts2d[idxs]

    W, H = query_view["rgb"].size
    if reprojection_error_diag_ratio is not None:
        reproj = reprojection_error_diag_ratio * math.sqrt(W ** 2 + H ** 2)
    else:
        reproj = reprojection_error
    return run_pnp(query_pts2d, query_pts3d, query_view["intrinsics"],
                   query_view["distortion"], pnp_mode, reproj,
                   img_size=[W, H])


def main(argv=None):
    args = get_args_parser().parse_args(argv)

    weights_path = args.weights if args.weights else "naver/" + args.model_name
    overrides = {}
    if args.serving:
        import jax.numpy as jnp
        # bf16 body + bf16 heads + int8 gemms — the measured serving
        # config (docs/DESIGN.md round-4 table row g); body dtype included
        # so the CLI matches what was benchmarked.
        overrides["dtype"] = jnp.bfloat16
        overrides["head_dtype"] = jnp.bfloat16
        args.quantize = args.quantize or "int8"
    model, variables = from_pretrained(weights_path, **overrides)
    from dust3r_tpu.parallel.mesh import cli_pair_mesh
    mesh, batch_size = cli_pair_mesh(args.mesh)
    engine = InferenceEngine(model, variables, batch_size=batch_size,
                             mesh=mesh, quantize=args.quantize)

    dataset = eval(args.dataset)  # noqa: S307 - same CLI DSL as reference
    dataset.set_resolution(model)

    query_names, poses_pred, pose_errors, angular_errors = [], [], [], []
    for idx in range(len(dataset)):
        views = dataset[idx]
        query_view = views[0]
        query_names.append(query_view["image_name"])

        viz_prefix = None
        if args.viz_matches > 0 and args.output_dir:
            import os
            viz_dir = os.path.join(args.output_dir, "viz")
            os.makedirs(viz_dir, exist_ok=True)
            viz_prefix = os.path.join(
                viz_dir, query_view["image_name"].replace("/", "_"))
        success, pr_c2w = localize_query(
            engine, views, args.confidence_threshold, args.pnp_mode,
            args.reprojection_error, args.reprojection_error_diag_ratio,
            args.pnp_max_points, viz_matches=args.viz_matches,
            viz_path_prefix=viz_prefix)

        if not success:
            te, ae = float("inf"), float("inf")
        else:
            te, ae = get_pose_error(pr_c2w, query_view["cam_to_world"])
        pose_errors.append(te)
        angular_errors.append(ae)
        poses_pred.append(pr_c2w)

    xp_label = f"tol_conf_{args.confidence_threshold}"
    if args.output_label:
        xp_label = args.output_label + "_" + xp_label
    if args.reprojection_error_diag_ratio is not None:
        xp_label += f"_reproj_diag_{args.reprojection_error_diag_ratio}"
    else:
        xp_label += f"_reproj_err_{args.reprojection_error}"
    export_results(args.output_dir, xp_label, query_names, poses_pred)
    print(aggregate_stats(f"{args.dataset}", pose_errors, angular_errors))


if __name__ == "__main__":
    main()
