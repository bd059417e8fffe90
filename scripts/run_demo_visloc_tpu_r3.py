"""Drive demo + visloc end-to-end ON THE REAL TPU once (VERDICT r3
item 10): flushes tunnel-specific issues the CPU-mesh tests can't see.

- demo: get_reconstructed_scene with the real 512_dpt model (random
  init), 4 synthetic images, complete symmetrized graph, 300-iter
  alignment, GLB export.
- visloc: localize_query with the real engine on a synthetic scene whose
  GT pointmaps come from a known camera (pose error will be garbage with
  random weights - the point is the full device path + host PnP round
  trip executes).

Timings recorded on stdout for PROGRESS.md.
"""
import os
import os.path as osp
import sys
import tempfile
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import cv2

    print("devices:", jax.devices(), flush=True)

    from dust3r_tpu.models.model import dust3r_512_dpt
    from dust3r_tpu.inference import InferenceEngine
    import dust3r_tpu.demo as demo_mod

    model = dust3r_512_dpt(dtype=jnp.bfloat16)

    @jax.jit
    def init_bf16(k, i1, i2):
        p = model.init(k, i1, i2)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p)

    probe = jnp.zeros((1, 384, 512, 3), jnp.float32)
    t0 = time.perf_counter()
    params = init_bf16(jax.random.PRNGKey(0), probe, probe)
    _ = float(jnp.sum(params["params"]["enc_norm"]["ln"]["scale"]))
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)
    engine = InferenceEngine(model, params, batch_size=8)

    out_dir = tempfile.mkdtemp(prefix="demo_tpu_")
    rng = np.random.default_rng(0)
    if not os.environ.get("SKIP_DEMO"):
        files = []
        for i in range(4):
            img = rng.integers(0, 255, (600, 800, 3), dtype=np.uint8)
            p = osp.join(out_dir, f"img{i}.jpg")
            cv2.imwrite(p, img)
            files.append(p)

        t0 = time.perf_counter()
        scene, outfile, gallery = demo_mod.get_reconstructed_scene(
            out_dir, engine, "tpu", False, 512, files,
            schedule="cosine", niter=300, min_conf_thr=3.0,
            as_pointcloud=True, mask_sky=False, clean_depth=True,
            transparent_cams=False, cam_size=0.05,
            scenegraph_type="complete", winsize=1, refid=0)
        print(f"demo get_reconstructed_scene (4 imgs @512, 300 iters): "
              f"{time.perf_counter() - t0:.1f}s -> {outfile} "
              f"({osp.getsize(outfile)} bytes)", flush=True)
        assert osp.exists(outfile)

    # --- visloc: query + one map view with known-geometry GT ---------- #
    from visloc import localize_query
    from dust3r_tpu.utils.geometry import xy_grid

    f, W, H = 240.0, 512, 384
    K = np.float32([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    depth = 3 + rng.uniform(0, 1, (H, W)).astype(np.float32)
    grid = np.asarray(xy_grid(W, H)).reshape(H, W, 2)
    pts_cam = np.concatenate(
        [depth[..., None] * (grid - [W / 2, H / 2]) / f, depth[..., None]],
        axis=-1)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.3, -0.2, 0.1]
    img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)

    import PIL.Image

    def view(name):
        return dict(
            image_name=name,
            rgb=PIL.Image.fromarray(img),
            rgb_rescaled=img.astype(np.float32) / 127.5 - 1.0,
            valid_rescaled=np.ones((H, W), bool),
            pts3d_rescaled=pts_cam,  # (H, W, 3) GT map
            to_orig=np.eye(3, dtype=np.float64),  # already at original res
            intrinsics=K, distortion=None,
            cam_to_world=c2w,
        )

    t0 = time.perf_counter()
    success, pose = localize_query(
        engine, [view("query"), view("map0")], 1.0, "cv2", 5.0, None,
        100_000)
    print(f"visloc localize_query on TPU: {time.perf_counter() - t0:.1f}s "
          f"success={success}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
