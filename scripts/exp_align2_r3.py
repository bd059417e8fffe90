# HISTORICAL MEASUREMENT RECORD - does not run at HEAD.
# Measured against the pre-image-grouping aligner consts layout
# (stacked_pred_i / onehot_i / weight_i, removed in commit 20e9396 when
# observations moved to the grouped-by-image layout this script's
# results motivated). Kept verbatim as the evidence record behind
# docs/DESIGN.md's round-3 aligner numbers; to re-run, check out the
# parent of 20e9396.
"""Round-3 aligner probe #2: squeeze the fused-chunk step at n=25.

exp_align_r3 found: one-hot >> take (TPU gathers), fused per-chunk
value_and_grad +39% (12.8 it/s bf16/chunk=128). Remaining cost suspects:
the HIGHEST-precision (6-pass) gather einsum and the fp32 (chunk, A, 3)
elementwise streams. Variants (all fused + onehot + bf16 obs):

  p-highest   6-pass gather einsum (current)
  p-float32   3-pass
  p-default   1-pass (gathered proj bf16-rounded - same class as the
              bf16 observations it is differenced against)
  chunk 64 / 128
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dust3r_tpu.cloud_opt.base_opt import (adaptors_from_params,
                                           pw_poses_from_params)
from dust3r_tpu.cloud_opt.commons import ALL_DISTS
from dust3r_tpu.cloud_opt.optimizer import pco_depth_to_pts3d
from dust3r_tpu.utils.geometry import geotrf
from exp_align_r3 import make_scene, _edge_indices


def make_fused_step(scene, precision):
    spec = scene.loss_spec
    dist = ALL_DISTS[spec.dist_mode]
    E = scene.n_edges
    E_pad = int(scene.consts["stacked_pred_i"].shape[0])
    chunk = spec.edge_chunk

    def value_and_grad(params, consts):
        f32 = jnp.float32

        def stage1(params):
            pw_poses = pw_poses_from_params(spec, params)
            pw_adapt = adaptors_from_params(spec, params)[:, None, :]
            proj = pco_depth_to_pts3d(spec, params, consts)
            if E_pad > E:
                eye = jnp.broadcast_to(jnp.eye(4, dtype=pw_poses.dtype),
                                       (E_pad - E, 4, 4))
                pw_poses = jnp.concatenate([pw_poses, eye])
                pw_adapt = jnp.concatenate(
                    [pw_adapt, jnp.ones((E_pad - E, 1, 3), pw_adapt.dtype)])
            return pw_poses, pw_adapt, proj

        (pw_poses, pw_adapt, proj), vjp1 = jax.vjp(stage1, params)

        def chunk_term(poses, adapt, proj, pred_i, pred_j, w_i, w_j,
                       oh_i, oh_j):
            proj_i = jnp.einsum("en,nac->eac", oh_i, proj,
                                precision=precision)
            proj_j = jnp.einsum("en,nac->eac", oh_j, proj,
                                precision=precision)
            ai = geotrf(poses, adapt * pred_i.astype(f32))
            aj = geotrf(poses, adapt * pred_j.astype(f32))
            return (jnp.sum(dist(proj_i.astype(f32), ai, w_i.astype(f32)))
                    / consts["total_area_i"]
                    + jnp.sum(dist(proj_j.astype(f32), aj, w_j.astype(f32)))
                    / consts["total_area_j"])

        xs = jax.tree.map(
            lambda t: t.reshape((E_pad // chunk, chunk) + t.shape[1:]),
            (pw_poses, pw_adapt, consts["stacked_pred_i"],
             consts["stacked_pred_j"], consts["weight_i"],
             consts["weight_j"], consts["onehot_i"], consts["onehot_j"]))

        def body(acc, args):
            loss_acc, gproj_acc = acc
            poses_c, adapt_c, pi, pj, wi, wj, ohi, ohj = args
            l, (gp, ga, gproj) = jax.value_and_grad(
                chunk_term, argnums=(0, 1, 2))(
                    poses_c, adapt_c, proj, pi, pj, wi, wj, ohi, ohj)
            return (loss_acc + l, gproj_acc + gproj), (gp, ga)

        (loss, gproj), (gposes, gadapt) = jax.lax.scan(
            body, (jnp.zeros((), f32), jnp.zeros_like(proj)), xs)
        gposes = gposes.reshape((E_pad,) + gposes.shape[2:])
        gadapt = gadapt.reshape((E_pad,) + gadapt.shape[2:])
        (gparams,) = vjp1((gposes, gadapt, gproj))
        return loss, gparams

    return value_and_grad


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


def time_step(vg, params, consts, iters=8, rounds=3):
    loss, grads = vg(params, consts)
    sync(grads["im_depthmaps"])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            loss, grads = vg(params, consts)
        sync(grads["im_depthmaps"])
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best, float(loss)


def main():
    print("devices:", jax.devices(), flush=True)
    for chunk in (128, 64):
        scene = make_scene(jnp.bfloat16, chunk)
        params, consts = dict(scene.params), dict(scene.consts)
        for pname in ("highest", "float32", "default"):
            try:
                vg = jax.jit(make_fused_step(scene, pname))
                ms, loss = time_step(vg, params, consts)
                print(f"fused onehot bf16 chunk={chunk:3d} p={pname:8s}: "
                      f"{ms:7.1f} ms/step ({1000/ms:5.1f} it/s) "
                      f"loss={loss:.6f}", flush=True)
            except Exception as e:
                print(f"chunk={chunk} p={pname} FAILED: "
                      f"{type(e).__name__}: {e}", flush=True)
        del scene, params, consts
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
