"""Gradio demo: upload images -> reconstruct -> interactive GLB + galleries.

Behavioral contract: /root/reference/dust3r/demo.py:20-287 (scene-graph
choice, conf-threshold/cam-size/sky-mask/depth-cleanup sliders that
re-export the GLB without re-running inference).
"""
from __future__ import annotations

import argparse
import builtins
import copy
import datetime
import functools
import math
import os

import numpy as np
from jax.numpy import asarray as jnp_asarray

from .inference import InferenceEngine, inference
from .image_pairs import make_pairs
from .utils.image import load_images, rgb
from .viz import (add_scene_cam, CAM_COLORS, OPENGL, pts3d_to_trimesh,
                  cat_meshes, uint8)
from .cloud_opt import global_aligner, GlobalAlignerMode


def get_args_parser():
    parser = argparse.ArgumentParser()
    parser_url = parser.add_mutually_exclusive_group()
    parser_url.add_argument("--local_network", action="store_true",
                            default=False)
    parser_url.add_argument("--server_name", type=str, default=None)
    parser.add_argument("--image_size", type=int, default=512,
                        choices=[512, 224])
    parser.add_argument("--server_port", type=int, default=None)
    parser_weights = parser.add_mutually_exclusive_group(required=True)
    parser_weights.add_argument("--weights", type=str, default=None,
                                help="path to a .pth or orbax checkpoint")
    parser_weights.add_argument("--model_name", type=str,
                                choices=["DUSt3R_ViTLarge_BaseDecoder_512_dpt",
                                         "DUSt3R_ViTLarge_BaseDecoder_512_linear",
                                         "DUSt3R_ViTLarge_BaseDecoder_224_linear"])
    parser.add_argument("--device", type=str, default="tpu",
                        help="accepted for CLI parity; JAX manages placement")
    parser.add_argument("--mesh", type=int, default=0,
                        help="shard each inference batch and the aligner "
                             "edges over this many devices (0 = off)")
    parser.add_argument("--quantize", type=str, default=None,
                        choices=["int8"],
                        help="int8 serving mode: transformer gemms on int8 "
                             "MXU operands (ops/quant.py; ~1.12x forward)")
    parser.add_argument("--serving", action="store_true",
                        help="the measured best serving config: int8 block "
                             "gemms + bf16 heads (1.16x the parity config; "
                             "accuracy contracts tests/test_quant.py + "
                             "tests/test_heads.py)")
    parser.add_argument("--tmp_dir", type=str, default=None)
    parser.add_argument("--silent", action="store_true", default=False)
    return parser


def set_print_with_timestamp(time_format="%Y-%m-%d %H:%M:%S"):
    builtin_print = builtins.print

    def print_with_timestamp(*args, **kwargs):
        now = datetime.datetime.now().strftime(time_format)
        builtin_print(f"[{now}] ", end="")
        builtin_print(*args, **kwargs)

    builtins.print = print_with_timestamp


def _export_scene_ply(outdir, imgs, pts3d, mask, focals, cams2world,
                      cam_size=0.05, silent=False):
    """numpy-only scene export: colored point cloud + camera-frustum
    wireframes (sampled as points) in one binary PLY. Fallback for
    environments without trimesh (same scene content as the GLB path;
    viewers that open .glb open .ply too)."""
    pts = np.concatenate([p[m].reshape(-1, 3)
                          for p, m in zip(pts3d, mask)])
    col = np.concatenate([im[m].reshape(-1, 3)
                          for im, m in zip(imgs, mask)])
    col = uint8(col)
    cam_pts, cam_cols = [], []
    for i, c2w in enumerate(np.asarray(cams2world)):
        color = CAM_COLORS[i % len(CAM_COLORS)]
        h, w = imgs[i].shape[:2]
        # frustum: camera center -> 4 image-plane corners at depth cam_size
        z = cam_size
        corners = np.array([[x * w / (2 * focals[i]), y * h / (2 * focals[i]), 1.0]
                            for x, y in ((-1, -1), (1, -1), (1, 1), (-1, 1))])
        corners = corners * z
        segs = ([(np.zeros(3), c) for c in corners]
                + [(corners[k], corners[(k + 1) % 4]) for k in range(4)])
        for a, b in segs:
            t = np.linspace(0, 1, 16)[:, None]
            cam_pts.append(a * (1 - t) + b * t)
            cam_cols.append(np.tile(color, (16, 1)))
        local = np.concatenate(cam_pts[-8:])
        world = local @ c2w[:3, :3].T + c2w[:3, 3]
        for k in range(8):
            cam_pts[-8 + k] = world[16 * k:16 * (k + 1)]
    verts = np.concatenate([pts] + cam_pts).astype(np.float32)
    cols = np.concatenate([col] + cam_cols).astype(np.uint8)
    # OpenGL convention, anchored on camera 0 (same transform as GLB path)
    roty = np.eye(4)
    roty[0, 0] = roty[2, 2] = -1
    trf = np.linalg.inv(np.asarray(cams2world)[0] @ OPENGL @ roty)
    verts = (verts @ trf[:3, :3].T + trf[:3, 3]).astype(np.float32)
    outfile = os.path.join(outdir, "scene.ply")
    with open(outfile, "wb") as f:
        f.write((f"ply\nformat binary_little_endian 1.0\n"
                 f"element vertex {len(verts)}\n"
                 "property float x\nproperty float y\nproperty float z\n"
                 "property uchar red\nproperty uchar green\n"
                 "property uchar blue\nend_header\n").encode())
        rec = np.zeros(len(verts), dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
        rec["xyz"] = verts
        rec["rgb"] = cols
        f.write(rec.tobytes())
    if not silent:
        print("(trimesh unavailable; exported point-cloud PLY to",
              outfile, ")")
    return outfile


def _convert_scene_output_to_glb(outdir, imgs, pts3d, mask, focals,
                                 cams2world, cam_size=0.05, cam_color=None,
                                 as_pointcloud=False, transparent_cams=False,
                                 silent=False):
    try:
        import trimesh
    except ImportError:
        return _export_scene_ply(
            outdir, [np.asarray(im) for im in imgs],
            [np.asarray(p) for p in pts3d], mask,
            np.asarray(focals).reshape(-1), np.asarray(cams2world),
            cam_size=cam_size, silent=silent)

    assert len(pts3d) == len(mask) <= len(imgs) <= len(cams2world) == len(focals)
    pts3d = [np.asarray(p) for p in pts3d]
    imgs = [np.asarray(im) for im in imgs]
    focals = np.asarray(focals).reshape(-1)
    cams2world = np.asarray(cams2world)

    scene = trimesh.Scene()
    if as_pointcloud:
        pts = np.concatenate([p[m] for p, m in zip(pts3d, mask)])
        col = np.concatenate([p[m] for p, m in zip(imgs, mask)])
        pct = trimesh.PointCloud(pts.reshape(-1, 3),
                                 colors=col.reshape(-1, 3))
        scene.add_geometry(pct)
    else:
        meshes = [pts3d_to_trimesh(imgs[i], pts3d[i], mask[i])
                  for i in range(len(imgs))]
        scene.add_geometry(trimesh.Trimesh(**cat_meshes(meshes)))

    for i, pose_c2w in enumerate(cams2world):
        color = (cam_color[i] if isinstance(cam_color, list)
                 else cam_color or CAM_COLORS[i % len(CAM_COLORS)])
        add_scene_cam(scene, pose_c2w, color,
                      None if transparent_cams else imgs[i], focals[i],
                      imsize=imgs[i].shape[1::-1], screen_width=cam_size)

    # flip to OpenGL convention, anchored on camera 0
    roty = np.eye(4)
    roty[0, 0] = roty[2, 2] = -1  # 180deg about y
    scene.apply_transform(np.linalg.inv(cams2world[0] @ OPENGL @ roty))
    outfile = os.path.join(outdir, "scene.glb")
    if not silent:
        print("(exporting 3D scene to", outfile, ")")
    scene.export(file_obj=outfile)
    return outfile


def get_3D_model_from_scene(outdir, silent, scene, min_conf_thr=3,
                            as_pointcloud=False, mask_sky=False,
                            clean_depth=False, transparent_cams=False,
                            cam_size=0.05):
    if scene is None:
        return None
    if clean_depth:
        scene = scene.clean_pointcloud()
    if mask_sky:
        scene = scene.mask_sky()

    rgbimg = scene.imgs
    focals = np.asarray(scene.get_focals())
    cams2world = np.asarray(scene.get_im_poses())
    pts3d = [np.asarray(p) for p in scene.get_pts3d()]
    # reference quirk (dust3r/demo.py:131): the UI threshold is passed
    # through the conf transform before comparing against raw conf maps
    scene.min_conf_thr = float(scene.conf_trf(jnp_asarray(min_conf_thr)))
    msk = scene.get_masks()
    return _convert_scene_output_to_glb(
        outdir, rgbimg, pts3d, msk, focals, cams2world,
        as_pointcloud=as_pointcloud, transparent_cams=transparent_cams,
        cam_size=cam_size, silent=silent)


def get_reconstructed_scene(outdir, engine, device, silent, image_size,
                            filelist, schedule, niter, min_conf_thr,
                            as_pointcloud, mask_sky, clean_depth,
                            transparent_cams, cam_size, scenegraph_type,
                            winsize, refid):
    """Full pipeline: load -> pairs -> inference -> align -> GLB."""
    patch_size = getattr(engine.model, "patch_size", 16)
    imgs = load_images(filelist, size=image_size, verbose=not silent,
                       patch_size=patch_size)
    if len(imgs) == 1:
        imgs = [imgs[0], copy.deepcopy(imgs[0])]
        imgs[1]["idx"] = 1
    if scenegraph_type == "swin":
        scenegraph_type = f"swin-{winsize}"
    elif scenegraph_type == "oneref":
        scenegraph_type = f"oneref-{refid}"

    pairs = make_pairs(imgs, scene_graph=scenegraph_type, prefilter=None,
                       symmetrize=True)
    output = inference(pairs, engine, verbose=not silent)

    mode = (GlobalAlignerMode.PointCloudOptimizer if len(imgs) > 2
            else GlobalAlignerMode.PairViewer)
    scene = global_aligner(output, mode=mode, verbose=not silent,
                           mesh=getattr(engine, "mesh", None))
    if mode == GlobalAlignerMode.PointCloudOptimizer:
        scene.compute_global_alignment(init="mst", niter=niter,
                                       schedule=schedule, lr=0.01)

    outfile = get_3D_model_from_scene(outdir, silent, scene, min_conf_thr,
                                      as_pointcloud, mask_sky, clean_depth,
                                      transparent_cams, cam_size)

    # rgb / normalized depth / jet confidence galleries
    rgbimg = scene.imgs
    depths = [np.asarray(d) for d in scene.get_depthmaps()]
    confs = [np.asarray(c) for c in scene.im_conf]
    import matplotlib.pyplot as pl
    cmap = pl.get_cmap("jet")
    depths_max = max(d.max() for d in depths)
    depths = [d / depths_max for d in depths]
    confs_max = max(c.max() for c in confs)
    confs = [cmap(c / confs_max) for c in confs]

    gallery = []
    for i in range(len(rgbimg)):
        gallery.append(rgbimg[i])
        gallery.append(rgb(depths[i]))
        gallery.append(rgb(confs[i]))
    return scene, outfile, gallery


def set_scenegraph_options(inputfiles, winsize, refid, scenegraph_type):
    import gradio

    num_files = len(inputfiles) if inputfiles is not None else 1
    max_winsize = max(1, math.ceil((num_files - 1) / 2))
    show_win = scenegraph_type == "swin"
    show_ref = scenegraph_type == "oneref"
    winsize = gradio.Slider(label="Scene Graph: Window Size",
                            value=max_winsize, minimum=1, maximum=max_winsize,
                            step=1, visible=show_win)
    refid = gradio.Slider(label="Scene Graph: Id", value=0, minimum=0,
                          maximum=num_files - 1, step=1, visible=show_ref)
    return winsize, refid


def main_demo(tmpdirname, engine, device, image_size, server_name,
              server_port, silent=False):
    import gradio

    recon_fun = functools.partial(get_reconstructed_scene, tmpdirname, engine,
                                  device, silent, image_size)
    model_from_scene_fun = functools.partial(get_3D_model_from_scene,
                                             tmpdirname, silent)
    css = """.gradio-container {margin: 0 !important; min-width: 100%};"""
    with gradio.Blocks(css=css, title="DUSt3R-TPU Demo") as demo:
        scene = gradio.State(None)
        gradio.HTML('<h2 style="text-align: center;">DUSt3R-TPU Demo</h2>')
        with gradio.Column():
            inputfiles = gradio.File(file_count="multiple")
            with gradio.Row():
                schedule = gradio.Dropdown(["linear", "cosine"],
                                           value="linear", label="schedule")
                niter = gradio.Number(value=300, precision=0, minimum=0,
                                      maximum=5000, label="num_iterations")
                scenegraph_type = gradio.Dropdown(
                    [("complete: all possible image pairs", "complete"),
                     ("swin: sliding window", "swin"),
                     ("oneref: match one image with all", "oneref")],
                    value="complete", label="Scenegraph", interactive=True)
                winsize = gradio.Slider(label="Scene Graph: Window Size",
                                        value=1, minimum=1, maximum=1, step=1,
                                        visible=False)
                refid = gradio.Slider(label="Scene Graph: Id", value=0,
                                      minimum=0, maximum=0, step=1,
                                      visible=False)
            run_btn = gradio.Button("Run")
            with gradio.Row():
                min_conf_thr = gradio.Slider(label="min_conf_thr", value=3.0,
                                             minimum=1.0, maximum=20, step=0.1)
                cam_size = gradio.Slider(label="cam_size", value=0.05,
                                         minimum=0.001, maximum=0.1,
                                         step=0.001)
            with gradio.Row():
                as_pointcloud = gradio.Checkbox(value=False,
                                                label="As pointcloud")
                mask_sky = gradio.Checkbox(value=False, label="Mask sky")
                clean_depth = gradio.Checkbox(value=True,
                                              label="Clean-up depthmaps")
                transparent_cams = gradio.Checkbox(
                    value=False, label="Transparent cameras")
            outmodel = gradio.Model3D()
            outgallery = gradio.Gallery(label="rgb,depth,confidence",
                                        columns=3, height="100%")

            post_inputs = [scene, min_conf_thr, as_pointcloud, mask_sky,
                           clean_depth, transparent_cams, cam_size]
            scenegraph_type.change(set_scenegraph_options,
                                   inputs=[inputfiles, winsize, refid,
                                           scenegraph_type],
                                   outputs=[winsize, refid])
            inputfiles.change(set_scenegraph_options,
                              inputs=[inputfiles, winsize, refid,
                                      scenegraph_type],
                              outputs=[winsize, refid])
            run_btn.click(fn=recon_fun,
                          inputs=[inputfiles, schedule, niter, min_conf_thr,
                                  as_pointcloud, mask_sky, clean_depth,
                                  transparent_cams, cam_size,
                                  scenegraph_type, winsize, refid],
                          outputs=[scene, outmodel, outgallery])
            for ctl in [min_conf_thr, cam_size, as_pointcloud, mask_sky,
                        clean_depth, transparent_cams]:
                event = ctl.release if hasattr(ctl, "release") and \
                    ctl is min_conf_thr else ctl.change
                event(fn=model_from_scene_fun, inputs=post_inputs,
                      outputs=outmodel)
    demo.launch(share=False, server_name=server_name,
                server_port=server_port)
