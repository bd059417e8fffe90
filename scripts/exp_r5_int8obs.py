"""Round-5 experiment: int8 observation storage at the n=50-complete
aligner scale (r4 verdict item 6).

Reference scale intent: /root/reference/dust3r/cloud_opt/optimizer.py:41-61
stores all-edge observations densely; at n=50 complete (2450 edges @
384x512) that is 7.7 GB in bf16 — the single-16GB-chip bound r4 flagged.
int8 per-slot symmetric quantization (base_opt.py, obs_dtype='int8')
halves it to 3.9 GB; this script measures what that buys end-to-end:

  a) bf16-obs @ edge_chunk=768 (the r3 production point: 8.3 it/s)
  b) int8-obs @ edge_chunk=768 (same chunking, half the HBM traffic)
  c) int8-obs @ edge_chunk=1536 (freed memory -> fewer scan steps)

Run on the real tunneled v5e as a background task WITHOUT a kill
timeout (CLAUDE.md rule 2). Results recorded in docs/DESIGN.md.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from dust3r_tpu.cloud_opt import global_aligner, GlobalAlignerMode
    from dust3r_tpu.cloud_opt.commons import make_lr_schedule
    from dust3r_tpu.cloud_opt.optimizer import _run_alignment

    log(f"devices: {jax.devices()}")
    n_imgs, H, W, niter = 50, 384, 512, 300
    edges = [(i, j) for i in range(n_imgs) for j in range(n_imgs) if i != j]
    E = len(edges)
    rng = np.random.default_rng(0)
    out = dict(
        view1=dict(idx=[i for i, j in edges]),
        view2=dict(idx=[j for i, j in edges]),
        pred1=dict(pts3d=rng.uniform(-2, 2, (E, H, W, 3)).astype(np.float32),
                   conf=1 + rng.uniform(1, 5, (E, H, W)).astype(np.float32)),
        pred2=dict(
            pts3d_in_other_view=rng.uniform(
                -2, 2, (E, H, W, 3)).astype(np.float32),
            conf=1 + rng.uniform(1, 5, (E, H, W)).astype(np.float32)),
    )
    lrs = make_lr_schedule("cosine", niter, 0.01, 1e-6)

    # cases from argv as "<dtype>:<edge_chunk>" (default: the original
    # round-5 trio); the follow-up sweep ran "bf16:256 int8:256 int8:512"
    # — r3's 8.3 it/s n=50 production point was edge_chunk=256, so the
    # honest bf16-vs-int8 comparison needs matched chunking.
    name_to_dt = {"bf16": jnp.bfloat16, "fp32": jnp.float32, "int8": "int8"}
    if len(sys.argv) > 1:
        cases = []
        for spec in sys.argv[1:]:
            tag, chunk = spec.split(":")
            cases.append((tag, name_to_dt[tag], int(chunk)))
    else:
        cases = [("bf16", jnp.bfloat16, 768),
                 ("int8", "int8", 768),
                 ("int8", "int8", 1536)]
    for tag, dt, chunk in cases:
        name = f"{tag}-obs chunk={chunk}"
        try:
            jax.clear_caches()
            t0 = time.perf_counter()
            scene = global_aligner(
                out, mode=GlobalAlignerMode.PointCloudOptimizer,
                verbose=False, obs_dtype=dt, edge_chunk=chunk)
            log(f"[{name}] build consts: {time.perf_counter() - t0:.1f}s")
            t0 = time.perf_counter()
            params, losses = _run_alignment(
                scene.pts3d_fn, scene.loss_spec, dict(scene.params),
                dict(scene.masks), lrs, dict(scene.consts))
            _ = float(losses[-1])
            log(f"[{name}] compile+first {niter} iters: "
                f"{time.perf_counter() - t0:.1f}s")
            t0 = time.perf_counter()
            params, losses = _run_alignment(
                scene.pts3d_fn, scene.loss_spec, dict(scene.params),
                dict(scene.masks), lrs, dict(scene.consts))
            _ = float(losses[-1])
            dt_s = time.perf_counter() - t0
            log(f"[{name}] n={n_imgs} complete ({E} edges): "
                f"{niter / dt_s:.1f} it/s ({dt_s:.1f}s for {niter}), "
                f"final loss {float(losses[-1]):.4g}")
            del scene, params, losses
        except Exception as e:
            log(f"[{name}] FAILED: {type(e).__name__}: {e}")
            import jax

            jax.clear_caches()


if __name__ == "__main__":
    main()
