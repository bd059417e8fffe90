"""Diagnose where the n=25 aligner bench spends host time (CPU-only)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

t0 = time.perf_counter()
from dust3r_tpu.cloud_opt import global_aligner, GlobalAlignerMode
from dust3r_tpu.cloud_opt.commons import make_lr_schedule
from dust3r_tpu.cloud_opt.optimizer import _run_alignment
print(f"imports: {time.perf_counter()-t0:.1f}s", flush=True)

n_imgs, H, W, niter = 25, 384, 512, 300
rng = np.random.default_rng(0)
edges = [(i, j) for i in range(n_imgs) for j in range(n_imgs) if i != j]
E = len(edges)
t0 = time.perf_counter()
out = dict(
    view1=dict(idx=[i for i, j in edges]),
    view2=dict(idx=[j for i, j in edges]),
    pred1=dict(pts3d=rng.uniform(-2, 2, (E, H, W, 3)).astype(np.float32),
               conf=1 + rng.uniform(1, 5, (E, H, W)).astype(np.float32)),
    pred2=dict(
        pts3d_in_other_view=rng.uniform(-2, 2, (E, H, W, 3)).astype(np.float32),
        conf=1 + rng.uniform(1, 5, (E, H, W)).astype(np.float32)),
)
print(f"synthetic out: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
scene = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                       verbose=False, obs_dtype=jnp.bfloat16)
print(f"global_aligner build: {time.perf_counter()-t0:.1f}s", flush=True)

lrs = make_lr_schedule("cosine", niter, 0.01, 1e-6)

import dust3r_tpu.cloud_opt.optimizer as opt
from dust3r_tpu.cloud_opt.optimizer import _alignment_segment, _adam_init

t0 = time.perf_counter()
opt_state = _adam_init(dict(scene.params))
print(f"adam init: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
lowered = _alignment_segment.lower(
    scene.pts3d_fn, scene.loss_spec, dict(scene.params), opt_state,
    dict(scene.masks), lrs[:100], dict(scene.consts))
print(f"trace+lower one segment: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
compiled = lowered.compile()
print(f"XLA compile (CPU backend): {time.perf_counter()-t0:.1f}s", flush=True)

print("DONE (execution skipped on CPU)", flush=True)
