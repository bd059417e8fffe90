"""Root-cause the init_from_known_poses parity delta (VERDICT r4 weak #1b).

Runs the reference and our init on the same fp32-obs synthetic scene and
prints every intermediate: per-edge PnP pose, align_multiple_poses (s,R,T),
raw pw_poses rows, seeded depthmaps, and the final loss of each.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax
jax.config.update("jax_platforms", "cpu")

from test_reference_differential import REF, _install_torchvision_stub
from test_reference_aligner_differential import (
    _install_roma_stub, _torch_output)

if REF not in sys.path:
    sys.path.insert(0, REF)
_install_torchvision_stub()
_install_roma_stub()

import torch
import jax.numpy as jnp

import dust3r.cloud_opt as refco
import dust3r.cloud_opt.init_im_poses as ref_init

from test_cloud_opt import make_synthetic_scene
from dust3r_tpu.cloud_opt import GlobalAlignerMode, global_aligner
from dust3r_tpu.cloud_opt import init_im_poses as our_init
from dust3r_tpu.cloud_opt.commons import edge_str

out_np, poses, depths, focal = make_synthetic_scene(n_imgs=4, seed=0)
ref_scene = refco.global_aligner(
    _torch_output(out_np), device="cpu",
    mode=refco.GlobalAlignerMode.PointCloudOptimizer, verbose=False)
our_scene = global_aligner(out_np, mode=GlobalAlignerMode.PointCloudOptimizer,
                           verbose=False, obs_dtype=jnp.float32)
n = our_scene.n_imgs

for scene in (ref_scene, our_scene):
    scene.preset_pose([poses[k] for k in range(n)])
    scene.preset_focal([focal] * n)

# ---- instrumented replay of both inits -------------------------------
ref_pnp = {}
orig_ref_fast_pnp = ref_init.fast_pnp
def spy_ref_fast_pnp(*a, **kw):
    res = orig_ref_fast_pnp(*a, **kw)
    ref_pnp[len(ref_pnp)] = None if res is None else np.asarray(res[1])
    return res
ref_init.fast_pnp = spy_ref_fast_pnp

our_pnp = {}
orig_our_fast_pnp = our_init.fast_pnp
def spy_our_fast_pnp(*a, **kw):
    res = orig_our_fast_pnp(*a, **kw)
    our_pnp[len(our_pnp)] = None if res is None else np.asarray(res[1])
    return res
our_init.fast_pnp = spy_our_fast_pnp

ref_init.init_from_known_poses(ref_scene, min_conf_thr=ref_scene.min_conf_thr,
                               niter_PnP=10)
our_init.init_from_known_poses(our_scene, min_conf_thr=our_scene.min_conf_thr,
                               niter_PnP=10)

print("=== per-edge PnP cam2world delta (max abs) ===")
for e in range(len(our_scene.edges)):
    d = np.abs(ref_pnp[e] - our_pnp[e]).max() if ref_pnp[e] is not None else -1
    print(f"  edge {our_scene.edges[e]}: {d:.3e}")

print("=== raw pw_poses rows (ref vs ours, max abs delta per row) ===")
ref_pw = ref_scene.pw_poses.detach().numpy()
our_pw = np.asarray(our_scene.params["pw_poses"])
for e in range(len(our_scene.edges)):
    print(f"  edge {our_scene.edges[e]}: {np.abs(ref_pw[e]-our_pw[e]).max():.3e}"
          f"  ref={np.round(ref_pw[e],4)}")

print("=== depthmaps delta ===")
ref_d = np.stack([d.detach().numpy() for d in ref_scene.get_depthmaps()])
our_d = np.asarray(our_scene.get_depthmaps())
print("  max abs:", np.abs(ref_d - our_d).max())

print("=== im_poses delta ===")
ref_p = ref_scene.get_im_poses().detach().numpy()
our_p = np.asarray(our_scene.get_im_poses())
print("  max abs:", np.abs(ref_p - our_p).max())

print("=== focals ===")
print("  ref:", ref_scene.get_focals().detach().numpy().ravel())
print("  ours:", np.asarray(our_scene.get_focals()).ravel())

print("=== pp ===")
print("  ref:", ref_scene.get_principal_points().detach().numpy())
print("  ours:", np.asarray(our_scene.get_principal_points()))

print("=== norm_pw_scale ===", ref_scene.norm_pw_scale, our_scene.norm_pw_scale)
loss_ref = float(ref_scene())
loss_ours = float(our_scene.forward())
print(f"=== loss: ref={loss_ref:.3e} ours={loss_ours:.3e} ===")

# cross-check: inject the REFERENCE's post-init state into OUR scene and
# re-evaluate — if the loss then matches ref, the delta is init-side;
# if not, it's forward-side.
our_scene.params["pw_poses"] = jnp.asarray(ref_pw)
our_scene.params["im_poses"] = jnp.asarray(ref_scene.im_poses.detach().numpy())
our_scene.params["im_depthmaps"] = jnp.asarray(
    ref_scene.im_depthmaps.detach().numpy())
our_scene.params["im_focals"] = jnp.asarray(
    ref_scene.im_focals.detach().numpy())
our_scene.params["im_pp"] = jnp.asarray(ref_scene.im_pp.detach().numpy())
print("our loss at REF state:", float(our_scene.forward()))
