# HISTORICAL MEASUREMENT RECORD - does not run at HEAD.
# Measured against the pre-image-grouping aligner consts layout
# (stacked_pred_i / onehot_i / weight_i, removed in commit 20e9396 when
# observations moved to the grouped-by-image layout this script's
# results motivated). Kept verbatim as the evidence record behind
# docs/DESIGN.md's round-3 aligner numbers; to re-run, check out the
# parent of 20e9396.
"""Round-3c: elementwise pose application in the aligner hot path.

exp_align3_r3 located the n=25 cost: geotrf's einsum over the 3-wide
coordinate axis lowers to MXU dot_generals that pad 3 -> 128 lanes
(~40 of 75 ms/step); the one-hot proj gathers add ~10. Variants:

  base       fused chunk scan (production, exp_align3 'base')
  elem       same, geotrf replaced by explicit per-component FMA
             (9 mul + 9 add broadcast ops that fuse into the dist chain)
  grouped-e  image-grouped broadcast (no gathers) + elementwise pose
             application; group arrays built from HOST numpy
  n10-base / n10-elem: the same comparison at n=10 (non-chunked path)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dust3r_tpu.cloud_opt import global_aligner, GlobalAlignerMode
from dust3r_tpu.cloud_opt.base_opt import (adaptors_from_params,
                                           pw_poses_from_params)
from dust3r_tpu.cloud_opt.commons import ALL_DISTS
from dust3r_tpu.cloud_opt.optimizer import pco_depth_to_pts3d
from dust3r_tpu.utils.geometry import geotrf

H, W = 384, 512


def scene_arrays(n_imgs):
    rng = np.random.default_rng(0)
    edges = [(i, j) for i in range(n_imgs) for j in range(n_imgs) if i != j]
    E = len(edges)
    pred1 = rng.uniform(-2, 2, (E, H, W, 3)).astype(np.float32)
    pred2 = rng.uniform(-2, 2, (E, H, W, 3)).astype(np.float32)
    conf1 = 1 + rng.uniform(1, 5, (E, H, W)).astype(np.float32)
    conf2 = 1 + rng.uniform(1, 5, (E, H, W)).astype(np.float32)
    out = dict(
        view1=dict(idx=[i for i, j in edges]),
        view2=dict(idx=[j for i, j in edges]),
        pred1=dict(pts3d=pred1, conf=conf1),
        pred2=dict(pts3d_in_other_view=pred2, conf=conf2),
    )
    return out, edges, (pred1, pred2, conf1, conf2)


def apply_pose_elem(poses, pts):
    """poses (..., 4, 4) applied to pts (..., A, 3) as fused FMAs."""
    R = poses[..., :3, :3]
    t = poses[..., :3, 3]
    comps = [
        pts[..., 0] * R[..., i, 0, None] + pts[..., 1] * R[..., i, 1, None]
        + pts[..., 2] * R[..., i, 2, None] + t[..., i, None]
        for i in range(3)]
    return jnp.stack(comps, axis=-1)


def make_fused_step(scene, elem):
    spec = scene.loss_spec
    dist = ALL_DISTS[spec.dist_mode]
    E = scene.n_edges
    E_pad = int(scene.consts["stacked_pred_i"].shape[0])
    chunk = spec.edge_chunk
    apply_pose = apply_pose_elem if elem else (
        lambda poses, p: geotrf(poses, p))

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
                                precision="highest")
            proj_j = jnp.einsum("en,nac->eac", oh_j, proj,
                                precision="highest")
            ai = apply_pose(poses, adapt * pred_i.astype(f32))
            aj = apply_pose(poses, adapt * pred_j.astype(f32))
            return (jnp.sum(dist(proj_i, ai, w_i.astype(f32)))
                    / consts["total_area_i"]
                    + jnp.sum(dist(proj_j, aj, w_j.astype(f32)))
                    / consts["total_area_j"])

        if not (chunk and E_pad > chunk):
            def whole(poses, adapt, proj):
                return chunk_term(poses, adapt, proj,
                                  consts["stacked_pred_i"],
                                  consts["stacked_pred_j"],
                                  consts["weight_i"], consts["weight_j"],
                                  consts["onehot_i"], consts["onehot_j"])
            loss, (gposes, gadapt, gproj) = jax.value_and_grad(
                whole, argnums=(0, 1, 2))(pw_poses, pw_adapt, proj)
            (gparams,) = vjp1((gposes, gadapt, gproj))
            return loss, gparams

        xs = jax.tree.map(
            lambda t: t.reshape((E_pad // chunk, chunk) + t.shape[1:]),
            (pw_poses, pw_adapt, consts["stacked_pred_i"],
             consts["stacked_pred_j"], consts["weight_i"],
             consts["weight_j"], consts["onehot_i"], consts["onehot_j"]))

        def body(acc, args):
            loss_acc, gproj_acc = acc
            poses_c, adapt_c, *obs = args
            l, (gp, ga, gproj) = jax.value_and_grad(
                chunk_term, argnums=(0, 1, 2))(poses_c, adapt_c, proj, *obs)
            return (loss_acc + l, gproj_acc + gproj), (gp, ga)

        (loss, gproj), (gposes, gadapt) = jax.lax.scan(
            body, (jnp.zeros((), f32), jnp.zeros_like(proj)), xs)
        gposes = gposes.reshape((E_pad,) + gposes.shape[2:])
        gadapt = gadapt.reshape((E_pad,) + gadapt.shape[2:])
        (gparams,) = vjp1((gposes, gadapt, gproj))
        return loss, gparams

    return value_and_grad


def make_grouped_step(scene, edges, host_obs, n_imgs):
    spec = scene.loss_spec
    dist = ALL_DISTS[spec.dist_mode]
    E = scene.n_edges
    N = n_imgs
    G = E // N
    from dust3r_tpu.cloud_opt.commons import get_conf_trf_np

    pred1, pred2, conf1, conf2 = host_obs
    trf = get_conf_trf_np("log")
    sort_i = np.argsort([i for i, j in edges], kind="stable")
    sort_j = np.argsort([j for i, j in edges], kind="stable")
    A = H * W
    odt = jnp.bfloat16
    gp_i = jnp.asarray(pred1.reshape(E, A, 3)[sort_i].reshape(N, G, A, 3), odt)
    gp_j = jnp.asarray(pred2.reshape(E, A, 3)[sort_j].reshape(N, G, A, 3), odt)
    gw_i = jnp.asarray(trf(conf1).reshape(E, A)[sort_i].reshape(N, G, A), odt)
    gw_j = jnp.asarray(trf(conf2).reshape(E, A)[sort_j].reshape(N, G, A), odt)
    sort_i_d = jnp.asarray(sort_i)
    sort_j_d = jnp.asarray(sort_j)

    def value_and_grad(params, consts):
        f32 = jnp.float32

        def stage1(params):
            pw_poses = pw_poses_from_params(spec, params)[:E]
            pw_adapt = adaptors_from_params(spec, params)[:E][:, None, :]
            proj = pco_depth_to_pts3d(spec, params, consts)
            return (jnp.take(pw_poses, sort_i_d, 0).reshape(N, G, 4, 4),
                    jnp.take(pw_adapt, sort_i_d, 0).reshape(N, G, 1, 3),
                    jnp.take(pw_poses, sort_j_d, 0).reshape(N, G, 4, 4),
                    jnp.take(pw_adapt, sort_j_d, 0).reshape(N, G, 1, 3),
                    proj)

        (po_i, ad_i, po_j, ad_j, proj), vjp1 = jax.vjp(stage1, params)

        def img_term(proj_n, poses_i, adapt_i, poses_j, adapt_j,
                     pred_i, pred_j, w_i, w_j):
            ai = apply_pose_elem(poses_i, adapt_i * pred_i.astype(f32))
            aj = apply_pose_elem(poses_j, adapt_j * pred_j.astype(f32))
            li = jnp.sum(dist(proj_n[None], ai, w_i.astype(f32)))
            lj = jnp.sum(dist(proj_n[None], aj, w_j.astype(f32)))
            return (li / consts["total_area_i"]
                    + lj / consts["total_area_j"])

        xs = (jnp.arange(N), po_i, ad_i, po_j, ad_j, gp_i, gp_j, gw_i, gw_j)

        def body(loss_acc, args):
            n, poses_i, adapt_i, poses_j, adapt_j, pi, pj, wi, wj = args
            proj_n = jax.lax.dynamic_index_in_dim(proj, n, 0, False)
            l, grads = jax.value_and_grad(img_term, argnums=(0, 1, 2, 3, 4))(
                proj_n, poses_i, adapt_i, poses_j, adapt_j, pi, pj, wi, wj)
            return loss_acc + l, grads

        loss, (gproj, gpo_i, gad_i, gpo_j, gad_j) = jax.lax.scan(
            body, jnp.zeros((), f32), xs)
        (gparams,) = vjp1((gpo_i, gad_i, gpo_j, gad_j, gproj))
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


def run(n_imgs, modes):
    out, edges, host_obs = scene_arrays(n_imgs)
    scene = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                           verbose=False, obs_dtype=jnp.bfloat16,
                           edge_chunk=64)
    params, consts = dict(scene.params), dict(scene.consts)
    gref = None
    for mode in modes:
        try:
            if mode == "grouped-e":
                vg = jax.jit(make_grouped_step(scene, edges, host_obs,
                                               n_imgs))
            else:
                vg = jax.jit(make_fused_step(scene, elem=(mode == "elem")))
            ms, loss = time_step(vg, params, consts)
            line = (f"n={n_imgs:2d} {mode:9s}: {ms:7.1f} ms/step "
                    f"({1000 / ms:6.1f} it/s) loss={loss:.6f}")
            _, grads = vg(params, consts)
            g = np.asarray(grads["im_depthmaps"], np.float64)
            if gref is None:
                gref = g
            else:
                rel = np.abs(g - gref).max() / max(np.abs(gref).max(), 1e-12)
                line += f"  grad rel={rel:.2e}"
            print(line, flush=True)
        except Exception as e:
            print(f"n={n_imgs} {mode}: FAILED {type(e).__name__}: {e}",
                  flush=True)
    del scene, params, consts


def main():
    print("devices:", jax.devices(), flush=True)
    run(25, ("base", "elem", "grouped-e"))
    run(10, ("base", "elem", "grouped-e"))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
