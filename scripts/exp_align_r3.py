# HISTORICAL MEASUREMENT RECORD - does not run at HEAD.
# Measured against the pre-image-grouping aligner consts layout
# (stacked_pred_i / onehot_i / weight_i, removed in commit 20e9396 when
# observations moved to the grouped-by-image layout this script's
# results motivated). Kept verbatim as the evidence record behind
# docs/DESIGN.md's round-3 aligner numbers; to re-run, check out the
# parent of 20e9396.
"""Round-3 probe: the n=25 aligner cliff (VERDICT r3 item 3).

Current: 8.3 it/s at 600 edges / 25 imgs @384x512 (chunked remat scan,
one-hot highest-precision edge gathers chosen at n=10). Variants:

  v0  current production step (value_and_grad over the chunk-scanned loss)
  v1  jnp.take gather forward (XLA scatter-add backward)
  v2  take forward + one-hot-matmul backward (custom_vjp: exact, no
      scatter, no O(E*N*A) highest-precision forward matmul)
  v3  fused per-chunk value-and-grad scan: each chunk computes its own
      gradient contribution inline (one forward per chunk instead of two:
      kills the jax.checkpoint recompute)
  each x {fp32, bf16} observations x chunk {64, 128, 256}
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dust3r_tpu.cloud_opt import global_aligner, GlobalAlignerMode
from dust3r_tpu.cloud_opt.base_opt import (AlignerSpec, adaptors_from_params,
                                           pw_poses_from_params,
                                           alignment_loss)
from dust3r_tpu.cloud_opt.commons import ALL_DISTS
from dust3r_tpu.cloud_opt.optimizer import pco_depth_to_pts3d
from dust3r_tpu.utils.geometry import geotrf

N_IMGS, H, W = 25, 384, 512


def make_scene(obs_dtype, edge_chunk):
    rng = np.random.default_rng(0)
    edges = [(i, j) for i in range(N_IMGS) for j in range(N_IMGS) if i != j]
    E = len(edges)
    out = dict(
        view1=dict(idx=[i for i, j in edges]),
        view2=dict(idx=[j for i, j in edges]),
        pred1=dict(pts3d=rng.uniform(-2, 2, (E, H, W, 3)).astype(np.float32),
                   conf=1 + rng.uniform(1, 5, (E, H, W)).astype(np.float32)),
        pred2=dict(pts3d_in_other_view=rng.uniform(
                       -2, 2, (E, H, W, 3)).astype(np.float32),
                   conf=1 + rng.uniform(1, 5, (E, H, W)).astype(np.float32)),
    )
    return global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                          verbose=False, obs_dtype=obs_dtype,
                          edge_chunk=edge_chunk)


def _edge_indices(scene, e_pad):
    idx_i = np.zeros(e_pad, np.int32)
    idx_j = np.zeros(e_pad, np.int32)
    for e, (i, j) in enumerate(scene.edges):
        idx_i[e], idx_j[e] = i, j
    return jnp.asarray(idx_i), jnp.asarray(idx_j)


# -- gather flavors ------------------------------------------------------- #

def gather_onehot(oh, proj):
    return jnp.einsum("en,nac->eac", oh, proj, precision="highest")


def gather_take(idx, proj):
    return jnp.take(proj, idx, axis=0)


@jax.custom_vjp
def gather_take_ohbwd(idx, oh, proj):
    return jnp.take(proj, idx, axis=0)


def _gt_fwd(idx, oh, proj):
    return jnp.take(proj, idx, axis=0), (oh, proj.shape)


def _gt_bwd(res, g):
    oh, _ = res
    gproj = jnp.einsum("ne,eac->nac", oh.T, g, precision="highest")
    return None, None, gproj


gather_take_ohbwd.defvjp(_gt_fwd, _gt_bwd)


# -- loss variants -------------------------------------------------------- #

def make_loss(scene, gather_kind):
    spec = scene.loss_spec
    dist = ALL_DISTS[spec.dist_mode]
    E = scene.n_edges
    E_pad = int(scene.consts["stacked_pred_i"].shape[0])
    idx_i, idx_j = _edge_indices(scene, E_pad)
    chunk = spec.edge_chunk

    def loss(params, consts):
        pw_poses = pw_poses_from_params(spec, params)
        pw_adapt = adaptors_from_params(spec, params)[:, None, :]
        proj = pco_depth_to_pts3d(spec, params, consts)
        f32 = jnp.float32
        if E_pad > E:
            eye = jnp.broadcast_to(jnp.eye(4, dtype=pw_poses.dtype),
                                   (E_pad - E, 4, 4))
            pw_poses = jnp.concatenate([pw_poses, eye])
            pw_adapt = jnp.concatenate(
                [pw_adapt, jnp.ones((E_pad - E, 1, 3), pw_adapt.dtype)])

        def edge_terms(poses, adapt, pred_i, pred_j, w_i, w_j,
                       oh_i, oh_j, ii, jj):
            if gather_kind == "onehot":
                proj_i, proj_j = gather_onehot(oh_i, proj), gather_onehot(oh_j, proj)
            elif gather_kind == "take":
                proj_i, proj_j = gather_take(ii, proj), gather_take(jj, proj)
            else:
                proj_i = gather_take_ohbwd(ii, oh_i, proj)
                proj_j = gather_take_ohbwd(jj, oh_j, proj)
            ai = geotrf(poses, adapt * pred_i.astype(f32))
            aj = geotrf(poses, adapt * pred_j.astype(f32))
            return (jnp.sum(dist(proj_i, ai, w_i.astype(f32))),
                    jnp.sum(dist(proj_j, aj, w_j.astype(f32))))

        xs = jax.tree.map(
            lambda t: t.reshape((E_pad // chunk, chunk) + t.shape[1:]),
            (pw_poses, pw_adapt, consts["stacked_pred_i"],
             consts["stacked_pred_j"], consts["weight_i"],
             consts["weight_j"], consts["onehot_i"], consts["onehot_j"],
             idx_i, idx_j))

        def body(acc, args):
            li, lj = jax.checkpoint(edge_terms)(*args)
            return (acc[0] + li, acc[1] + lj), None

        (li, lj), _ = jax.lax.scan(body, (jnp.zeros((), f32),) * 2, xs)
        return li / consts["total_area_i"] + lj / consts["total_area_j"]

    return loss


def make_fused_step(scene, gather_kind):
    """v3: scan computes loss AND grads per chunk (no remat recompute)."""
    spec = scene.loss_spec
    dist = ALL_DISTS[spec.dist_mode]
    E = scene.n_edges
    E_pad = int(scene.consts["stacked_pred_i"].shape[0])
    idx_i, idx_j = _edge_indices(scene, E_pad)
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
                       oh_i, oh_j, ii, jj):
            if gather_kind == "onehot":
                proj_i, proj_j = gather_onehot(oh_i, proj), gather_onehot(oh_j, proj)
            elif gather_kind == "take":
                proj_i, proj_j = gather_take(ii, proj), gather_take(jj, proj)
            else:
                proj_i = gather_take_ohbwd(ii, oh_i, proj)
                proj_j = gather_take_ohbwd(jj, oh_j, proj)
            ai = geotrf(poses, adapt * pred_i.astype(f32))
            aj = geotrf(poses, adapt * pred_j.astype(f32))
            return (jnp.sum(dist(proj_i, ai, w_i.astype(f32)))
                    / consts["total_area_i"]
                    + jnp.sum(dist(proj_j, aj, w_j.astype(f32)))
                    / consts["total_area_j"])

        xs = jax.tree.map(
            lambda t: t.reshape((E_pad // chunk, chunk) + t.shape[1:]),
            (pw_poses, pw_adapt, consts["stacked_pred_i"],
             consts["stacked_pred_j"], consts["weight_i"],
             consts["weight_j"], consts["onehot_i"], consts["onehot_j"],
             idx_i, idx_j))

        def body(acc, args):
            loss_acc, gproj_acc = acc
            poses_c, adapt_c, pi, pj, wi, wj, ohi, ohj, ii, jj = args
            l, (gp, ga, gproj) = jax.value_and_grad(
                chunk_term, argnums=(0, 1, 2))(
                    poses_c, adapt_c, proj, pi, pj, wi, wj, ohi, ohj, ii, jj)
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
    ref_grads = {}
    for obs_name, obs_dtype in (("bf16", jnp.bfloat16), ("fp32", jnp.float32)):
        for chunk in (128, 256):
            try:
                scene = make_scene(obs_dtype, chunk)
            except Exception as e:
                print(f"scene obs={obs_name} chunk={chunk} failed: {e}",
                      flush=True)
                continue
            params, consts = dict(scene.params), dict(scene.consts)
            for kind in ("onehot", "take", "take_ohbwd"):
                try:
                    vg = jax.jit(jax.value_and_grad(make_loss(scene, kind)))
                    ms, loss = time_step(vg, params, consts)
                    print(f"v-stdgrad obs={obs_name} chunk={chunk:3d} "
                          f"{kind:10s}: {ms:7.1f} ms/step "
                          f"({1000/ms:5.1f} it/s) loss={loss:.6f}",
                          flush=True)
                except Exception as e:
                    print(f"v-stdgrad obs={obs_name} chunk={chunk} {kind} "
                          f"FAILED: {type(e).__name__}: {e}", flush=True)
                try:
                    vg = jax.jit(make_fused_step(scene, kind))
                    ms, loss = time_step(vg, params, consts)
                    print(f"v-fused   obs={obs_name} chunk={chunk:3d} "
                          f"{kind:10s}: {ms:7.1f} ms/step "
                          f"({1000/ms:5.1f} it/s) loss={loss:.6f}",
                          flush=True)
                except Exception as e:
                    print(f"v-fused obs={obs_name} chunk={chunk} {kind} "
                          f"FAILED: {type(e).__name__}: {e}", flush=True)
            del scene, params, consts
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
