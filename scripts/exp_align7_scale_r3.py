"""Round-3g: big-scene proof of the image-chunked grouped aligner.

n=50 COMPLETE graph = 2450 edges @ 384x512: ~8 GB of bf16 observations
alone - impossible to align flat on a 16 GB chip, and untested in any
prior round (bench covers n=50 only as swin-3/288 edges). With
edge_chunk=256 the grouped loss scans K=10 chunks of 5 images
(245 edges each); peak residual memory stays O(nc * G * A).

Prints it/s through the REAL production path (_run_alignment segments)
plus the loss trajectory head/tail for sanity.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dust3r_tpu.cloud_opt import global_aligner, GlobalAlignerMode
from dust3r_tpu.cloud_opt.commons import make_lr_schedule
from dust3r_tpu.cloud_opt.optimizer import _run_alignment

N_IMGS = int(os.environ.get("EXP7_N", 50))
H = int(os.environ.get("EXP7_H", 384))
W = int(os.environ.get("EXP7_W", 512))
CHUNK = int(os.environ.get("EXP7_CHUNK", 256))
NITER = int(os.environ.get("EXP7_NITER", 100))


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    edges = [(i, j) for i in range(N_IMGS) for j in range(N_IMGS) if i != j]
    E = len(edges)
    print(f"building n={N_IMGS} complete scene: {E} edges @ {H}x{W} ...",
          flush=True)
    t0 = time.perf_counter()
    out = dict(
        view1=dict(idx=[i for i, j in edges]),
        view2=dict(idx=[j for i, j in edges]),
        pred1=dict(
            pts3d=rng.uniform(-2, 2, (E, H, W, 3)).astype(np.float32),
            conf=1 + rng.uniform(1, 5, (E, H, W)).astype(np.float32)),
        pred2=dict(
            pts3d_in_other_view=rng.uniform(
                -2, 2, (E, H, W, 3)).astype(np.float32),
            conf=1 + rng.uniform(1, 5, (E, H, W)).astype(np.float32)),
    )
    scene = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                           verbose=False, edge_chunk=CHUNK)
    K, nc, G = scene._n_img_groups
    print(f"scene build: {time.perf_counter() - t0:.1f}s "
          f"(K={K} chunks x {nc} imgs, G={G})", flush=True)

    lrs = make_lr_schedule("cosine", NITER, 0.01, 1e-6)
    t0 = time.perf_counter()
    params, losses = _run_alignment(scene.pts3d_fn, scene.loss_spec,
                                    dict(scene.params), dict(scene.masks),
                                    lrs, dict(scene.consts))
    _ = float(losses[-1])
    print(f"compile+first {NITER} iters: {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    params, losses = _run_alignment(scene.pts3d_fn, scene.loss_spec,
                                    dict(scene.params), dict(scene.masks),
                                    lrs, dict(scene.consts))
    _ = float(losses[-1])
    dt = time.perf_counter() - t0
    lo = np.asarray(losses)
    print(f"n={N_IMGS} complete ({E} edges): {NITER / dt:.1f} iters/s "
          f"({dt:.2f}s for {NITER}); loss {lo[0]:.4f} -> {lo[-1]:.4f}",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
