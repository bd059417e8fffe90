#!/usr/bin/env python3
"""Habitat preprocessing driver: render crops at metadata viewpoints.

Behavioral contract: /root/reference/datasets_preprocess/habitat/
preprocess_habitat.py (walks metadata dirs emitting per-scene command
lines, or renders one metadata file: envmap at each viewpoint -> cropped
jpeg + exr depth + camera_params.json).
"""
import argparse
import glob
import json
import os

import numpy as np
import PIL.Image

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

from . import multiview_crop_generator
from dust3r_tpu.utils.exr import imwrite_exr


def preprocess_metadata(metadata_filename, scenes_dir, output_dir,
                        crop_resolution=(512, 512),
                        equirectangular_resolution=None,
                        fix_existing_dataset=False):
    import cv2

    with open(metadata_filename) as f:
        metadata = json.load(f)

    if metadata["scene_dataset_config_file"] == "":
        scene = os.path.join(scenes_dir, metadata["scene"])
        scene_dataset_config_file = ""
    else:
        scene = metadata["scene"]
        scene_dataset_config_file = os.path.join(
            scenes_dir, metadata["scene_dataset_config_file"])

    if equirectangular_resolution is None:
        max_res = max(crop_resolution)
        equirectangular_resolution = (4 * max_res, 8 * max_res)

    if os.path.exists(output_dir) and not fix_existing_dataset:
        raise FileExistsError(output_dir)

    highres_dataset = None
    for batch_label, batch in metadata["view_batches"].items():
        for view_label, view_params in batch.items():
            assert list(view_params["size"]) == list(crop_resolution)
            label = f"{batch_label}_{view_label}"
            out_params = os.path.join(output_dir,
                                      f"{label}_camera_params.json")
            if fix_existing_dataset and os.path.isfile(out_params):
                continue

            if highres_dataset is None:
                highres_dataset = \
                    multiview_crop_generator.HabitatMultiviewCrops(
                        scene=scene, navmesh=None,
                        scene_dataset_config_file=scene_dataset_config_file,
                        equirectangular_resolution=equirectangular_resolution,
                        crop_resolution=crop_resolution)
                os.makedirs(output_dir, exist_ok=bool(fix_existing_dataset))

            projection, position = \
                multiview_crop_generator.dict_to_perspective_projection(
                    view_params)
            viewpoint = highres_dataset.render_viewpoint_data(position)
            colormap, depthmap, pointmap, _ = \
                highres_dataset.extract_cropped_camera(
                    projection, viewpoint.colormap, viewpoint.distancemap,
                    viewpoint.pointmap)
            camera_params = \
                multiview_crop_generator.perspective_projection_to_dict(
                    projection, position)

            PIL.Image.fromarray(colormap).save(
                os.path.join(output_dir, f"{label}.jpeg"))
            imwrite_exr(os.path.join(output_dir, f"{label}_depth.exr"),
                        depthmap,
                        [cv2.IMWRITE_EXR_TYPE, cv2.IMWRITE_EXR_TYPE_HALF])
            with open(out_params, "w") as f:
                json.dump(camera_params, f)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--metadata_dir", required=True)
    parser.add_argument("--scenes_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--metadata_filename", default="")
    args = parser.parse_args()

    if args.metadata_filename == "":
        # emit one command line per scene (for GNU parallel)
        for filename in glob.iglob(
                os.path.join(args.metadata_dir, "**/metadata.json"),
                recursive=True):
            output_dir = os.path.join(
                args.output_dir,
                os.path.relpath(os.path.dirname(filename),
                                args.metadata_dir))
            if not os.path.exists(output_dir):
                print(f"python -m datasets_preprocess.habitat."
                      f"preprocess_habitat "
                      f"--metadata_filename={filename} "
                      f"--metadata_dir={args.metadata_dir} "
                      f"--scenes_dir={args.scenes_dir} "
                      f"--output_dir={output_dir}")
    else:
        preprocess_metadata(metadata_filename=args.metadata_filename,
                            scenes_dir=args.scenes_dir,
                            output_dir=args.output_dir)
