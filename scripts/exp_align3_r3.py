# HISTORICAL MEASUREMENT RECORD - does not run at HEAD.
# Measured against the pre-image-grouping aligner consts layout
# (stacked_pred_i / onehot_i / weight_i, removed in commit 20e9396 when
# observations moved to the grouped-by-image layout this script's
# results motivated). Kept verbatim as the evidence record behind
# docs/DESIGN.md's round-3 aligner numbers; to re-run, check out the
# parent of 20e9396.
"""Round-3b: where do the n=25 aligner's 74 ms/step actually go?

The HBM traffic floor of the fused chunk-scan step is ~5 GB/step
(~6 ms at 819 GB/s), yet the measured step is 73.6 ms (chunk=64,
bf16 obs). Suspects, each ablated below at the production config:

  base      current fused value-and-grad chunk scan (exp_align_r3 v3)
  noproj    skip the one-hot proj gathers (compare against pred_i
            itself - semantics broken, measures the gather+materialize
            cost of 2x (chunk, A, 3) fp32 per chunk)
  nogeo     skip the geotrf pose application (measures the batched
            tiny-matmul einsum + its materialized output)
  l2        squared-L2 distance (measures the sqrt VPU pass)
  fwdonly   loss only, no gradients (forward/backward split)
  traffic   body only sums the chunk's observation arrays (true read
            floor of the stacked obs)
  grouped   image-grouped broadcast prototype: edges pre-sorted by
            their proj image (i-term by i, j-term by j); each scan
            step processes ONE image's edge group, so proj_n (A, 3)
            broadcasts against the (G, A, 3) group - NO materialized
            per-edge proj copies, NO gather matmul, per-image gproj
            falls out of the scan as a (N, A, 3) stack. Exact same
            loss up to summation order.
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

N_IMGS, H, W = 25, 384, 512
CHUNK = 64


def make_scene():
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
                          verbose=False, obs_dtype=jnp.bfloat16,
                          edge_chunk=CHUNK)


# --------------------------------------------------------------------- #
# ablations of the chunk-scan step
# --------------------------------------------------------------------- #

def make_fused_step(scene, mode):
    spec = scene.loss_spec
    dist = ALL_DISTS["l2" if mode == "l2" else spec.dist_mode]
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
            if mode == "noproj":
                proj_i = pred_i.astype(f32)
                proj_j = pred_j.astype(f32)
            else:
                proj_i = jnp.einsum("en,nac->eac", oh_i, proj,
                                    precision="highest")
                proj_j = jnp.einsum("en,nac->eac", oh_j, proj,
                                    precision="highest")
            if mode == "nogeo":
                ai = adapt * pred_i.astype(f32)
                aj = adapt * pred_j.astype(f32)
            else:
                ai = geotrf(poses, adapt * pred_i.astype(f32))
                aj = geotrf(poses, adapt * pred_j.astype(f32))
            return (jnp.sum(dist(proj_i, ai, w_i.astype(f32)))
                    / consts["total_area_i"]
                    + jnp.sum(dist(proj_j, aj, w_j.astype(f32)))
                    / consts["total_area_j"])

        def traffic_term(poses, adapt, proj, pred_i, pred_j, w_i, w_j,
                         oh_i, oh_j):
            s = (jnp.sum(pred_i.astype(f32)) + jnp.sum(pred_j.astype(f32))
                 + jnp.sum(w_i.astype(f32)) + jnp.sum(w_j.astype(f32)))
            return s / consts["total_area_i"]

        term = traffic_term if mode == "traffic" else chunk_term

        xs = jax.tree.map(
            lambda t: t.reshape((E_pad // chunk, chunk) + t.shape[1:]),
            (pw_poses, pw_adapt, consts["stacked_pred_i"],
             consts["stacked_pred_j"], consts["weight_i"],
             consts["weight_j"], consts["onehot_i"], consts["onehot_j"]))

        if mode == "fwdonly":
            def body(acc, args):
                poses_c, adapt_c, *obs = args
                return acc + term(poses_c, adapt_c, proj, *obs), None
            loss, _ = jax.lax.scan(body, jnp.zeros((), f32), xs)
            return loss, params  # grads placeholder

        def body(acc, args):
            loss_acc, gproj_acc = acc
            poses_c, adapt_c, *obs = args
            l, (gp, ga, gproj) = jax.value_and_grad(
                term, argnums=(0, 1, 2))(poses_c, adapt_c, proj, *obs)
            return (loss_acc + l, gproj_acc + gproj), (gp, ga)

        (loss, gproj), (gposes, gadapt) = jax.lax.scan(
            body, (jnp.zeros((), f32), jnp.zeros_like(proj)), xs)
        gposes = gposes.reshape((E_pad,) + gposes.shape[2:])
        gadapt = gadapt.reshape((E_pad,) + gadapt.shape[2:])
        (gparams,) = vjp1((gposes, gadapt, gproj))
        return loss, gparams

    return value_and_grad


# --------------------------------------------------------------------- #
# image-grouped broadcast prototype
# --------------------------------------------------------------------- #

def make_grouped_step(scene):
    spec = scene.loss_spec
    dist = ALL_DISTS[spec.dist_mode]
    E = scene.n_edges
    edges = list(scene.edges)
    N = N_IMGS
    G = E // N  # complete graph: exact

    # host: permutations sorting edges by i (for the i-term) and j
    sort_i = np.argsort([i for i, j in edges], kind="stable")
    sort_j = np.argsort([j for i, j in edges], kind="stable")
    inv_i = np.argsort(sort_i)
    inv_j = np.argsort(sort_j)

    consts = dict(scene.consts)
    # reorder + group the big stacks ONCE at build (host-side in product)
    gi = {}
    gi["pred_i"] = jnp.asarray(np.asarray(consts["stacked_pred_i"])[:E][sort_i]
                               .reshape(N, G, -1, 3))
    gi["pred_j"] = jnp.asarray(np.asarray(consts["stacked_pred_j"])[:E][sort_j]
                               .reshape(N, G, -1, 3))
    gi["w_i"] = jnp.asarray(np.asarray(consts["weight_i"])[:E][sort_i]
                            .reshape(N, G, -1))
    gi["w_j"] = jnp.asarray(np.asarray(consts["weight_j"])[:E][sort_j]
                            .reshape(N, G, -1))
    sort_i_d = jnp.asarray(sort_i)
    sort_j_d = jnp.asarray(sort_j)
    inv_i_d = jnp.asarray(inv_i)
    inv_j_d = jnp.asarray(inv_j)

    def value_and_grad(params, consts):
        f32 = jnp.float32

        def stage1(params):
            pw_poses = pw_poses_from_params(spec, params)[:E]
            pw_adapt = adaptors_from_params(spec, params)[:E][:, None, :]
            proj = pco_depth_to_pts3d(spec, params, consts)
            # permuted pose stacks (tiny: E x 4 x 4); vjp flows back
            # through the takes as tiny scatters
            return (jnp.take(pw_poses, sort_i_d, axis=0).reshape(N, G, 4, 4),
                    jnp.take(pw_adapt, sort_i_d, axis=0).reshape(N, G, 1, 3),
                    jnp.take(pw_poses, sort_j_d, axis=0).reshape(N, G, 4, 4),
                    jnp.take(pw_adapt, sort_j_d, axis=0).reshape(N, G, 1, 3),
                    proj)

        (po_i, ad_i, po_j, ad_j, proj), vjp1 = jax.vjp(stage1, params)

        def img_term(proj_n, poses_i, adapt_i, poses_j, adapt_j,
                     pred_i, pred_j, w_i, w_j):
            # proj_n: (A, 3) broadcasts over the (G, A, 3) groups
            ai = geotrf(poses_i, adapt_i * pred_i.astype(f32))
            aj = geotrf(poses_j, adapt_j * pred_j.astype(f32))
            li = jnp.sum(dist(proj_n[None], ai, w_i.astype(f32)))
            lj = jnp.sum(dist(proj_n[None], aj, w_j.astype(f32)))
            return (li / consts["total_area_i"]
                    + lj / consts["total_area_j"])

        xs = (jnp.arange(N), po_i, ad_i, po_j, ad_j,
              gi["pred_i"], gi["pred_j"], gi["w_i"], gi["w_j"])

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


def main():
    print("devices:", jax.devices(), flush=True)
    scene = make_scene()
    params, consts = dict(scene.params), dict(scene.consts)
    gref = None
    for mode in ("base", "noproj", "nogeo", "l2", "fwdonly", "traffic",
                 "grouped"):
        try:
            if mode == "grouped":
                vg = jax.jit(make_grouped_step(scene))
            else:
                vg = jax.jit(make_fused_step(scene, mode))
            ms, loss = time_step(vg, params, consts)
            line = (f"{mode:8s}: {ms:7.1f} ms/step ({1000 / ms:6.1f} it/s) "
                    f"loss={loss:.6f}")
            if mode in ("base", "grouped"):
                _, grads = vg(params, consts)
                g = np.asarray(grads["im_depthmaps"], np.float64)
                if mode == "base":
                    gref = g
                else:
                    rel = (np.abs(g - gref).max()
                           / max(np.abs(gref).max(), 1e-12))
                    line += f"  grad-vs-base rel={rel:.2e}"
            print(line, flush=True)
        except Exception as e:
            print(f"{mode}: FAILED {type(e).__name__}: {e}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
