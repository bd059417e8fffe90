#!/usr/bin/env python3
"""Export habitat scene lists after rendering.

Behavioral contract: /root/reference/datasets_preprocess/habitat/
find_scenes.py (walk rendered output for *_1_depth.exr markers, 90/10
train/val scene split with seed 777, size-capped shuffled lists).
"""
import argparse
import os
from collections import defaultdict

import numpy as np


def find_all_scenes(habitat_root, n_scenes=(100000,), assume_yes=False):
    np.random.seed(777)

    fpath = os.path.join(habitat_root, "Habitat_all_scenes.txt")
    try:
        list_subscenes = open(fpath).read().splitlines()
    except IOError:
        if not assume_yes and \
                input("parsing sub-folders to find scenes? (y/n) ") != "y":
            return
        list_subscenes = []
        for root, dirs, files in os.walk(habitat_root):
            for f in files:
                if not f.endswith("_1_depth.exr"):
                    continue
                scene = os.path.join(os.path.relpath(root, habitat_root),
                                     f.replace("_1_depth.exr", ""))
                list_subscenes.append(scene)
        with open(fpath, "w") as f:
            f.write("\n".join(list_subscenes))
        print(f">> wrote {fpath}")

    print(f"Loaded {len(list_subscenes)} sub-scenes")

    list_scenes = defaultdict(list)
    for scene in list_subscenes:
        scene, sid = os.path.split(scene)
        list_scenes[scene].append(sid)
    list_scenes = list(list_scenes.items())
    print(f"from {len(list_scenes)} scenes in total")

    np.random.shuffle(list_scenes)
    train_scenes = list_scenes[len(list_scenes) // 10:]
    val_scenes = list_scenes[:len(list_scenes) // 10]

    def write_scene_list(scenes, n, path):
        sub_scenes = [os.path.join(scene, sid)
                      for scene, ids in scenes for sid in ids]
        np.random.shuffle(sub_scenes)
        if len(sub_scenes) < n:
            return
        with open(path, "w") as f:
            f.write("\n".join(sub_scenes[:n]))
        print(f">> wrote {path}")

    for n in n_scenes:
        write_scene_list(train_scenes, n, os.path.join(
            habitat_root, f"Habitat_{n}_scenes_train.txt"))
        write_scene_list(val_scenes, n // 10, os.path.join(
            habitat_root, f"Habitat_{n // 10}_scenes_val.txt"))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", required=True)
    parser.add_argument("--n_scenes", nargs="+",
                        default=[1_000, 10_000, 100_000, 1_000_000], type=int)
    parser.add_argument("--yes", action="store_true",
                        help="don't ask before walking the tree")
    args = parser.parse_args()
    find_all_scenes(args.root, args.n_scenes, assume_yes=args.yes)
