import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from dust3r_tpu.models import model as M
from dust3r_tpu.losses import ConfLoss, Regr3D, L21
from dust3r_tpu.training import TrainSpec, init_train_state, build_train_step

def sync(x): return float(jnp.sum(jnp.ravel(x)[:1]))

import os
B = int(os.environ.get("TRAIN_B", "16"))
H = int(os.environ.get("TRAIN_H", "224"))
W = int(os.environ.get("TRAIN_W", "224"))
CFG = os.environ.get("TRAIN_CFG", "dust3r_224_linear")
model = getattr(M, CFG)(dtype=jnp.bfloat16, scan_layers=True,
                        remat=os.environ.get("REMAT", "0") == "1",
                        remat_policy=os.environ.get("REMAT_POLICY", "full"))
print(f"cfg={CFG} B={B} {H}x{W} remat={model.remat} "
      f"policy={model.remat_policy}", flush=True)

rng = np.random.default_rng(0)
def view(seed):
    r = np.random.default_rng(seed)
    pose = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    pose[:, :3, 3] = r.standard_normal((B, 3)).astype(np.float32) * 0.1
    return dict(
        img=jnp.asarray(r.standard_normal((B, H, W, 3)), jnp.float32),
        pts3d=jnp.asarray(r.uniform(0.5, 3, (B, H, W, 3)), jnp.float32),
        valid_mask=jnp.asarray(r.uniform(size=(B, H, W)) > 0.2),
        camera_pose=jnp.asarray(pose))
batch = (view(1), view(2))

@jax.jit
def init_params(key, i):
    return model.init(key, i[:1], i[1:2])
t0=time.perf_counter()
params = init_params(jax.random.PRNGKey(0), batch[0]["img"])
sync(params["params"]["enc_norm"]["ln"]["scale"])
print(f"init {time.perf_counter()-t0:.0f}s", flush=True)
n_params = sum(x.size for x in jax.tree.leaves(params))
print(f"params: {n_params/1e6:.1f}M", flush=True)

criterion = ConfLoss(Regr3D(L21, norm_mode='avg_dis'), alpha=0.2)
spec = TrainSpec(lr=1e-4,
                 warmup_epochs=float(os.environ.get("WARMUP", "0")),
                 epochs=10,
                 clip_grad=float(os.environ.get("CLIP", "0")))
state = init_train_state(params, spec)
SYM = os.environ.get("SYM", "1") == "1"
print(f"symmetrized={SYM}", flush=True)
step = build_train_step(model, criterion, spec, symmetrized=SYM)

t0=time.perf_counter()
state, metrics = step(state, batch, jnp.asarray(0.0))
l = float(metrics["loss"])
print(f"train step compile+first: {time.perf_counter()-t0:.0f}s, loss={l:.3f}", flush=True)

t0=time.perf_counter()
iters = 10
for i in range(iters):
    state, metrics = step(state, batch, jnp.asarray(i * 0.001))
l = float(metrics["loss"])
dt = (time.perf_counter()-t0)/iters
print(f"steady: {dt*1e3:.0f} ms/step, {B/dt:.1f} pairs/s, loss={l:.3f}, "
      f"skipped={float(metrics.get('skipped', 0)):.0f}, "
      f"grad_norm={float(metrics['grad_norm']):.2e}", flush=True)
print("DONE", flush=True)
