"""Round-3e: kill the aligner's one-hot gather matmuls via image-grouping.

After the planar relayout (exp_align5) the n=25/600-edge step is ~43-46
ms against a ~6 ms HBM floor. Arithmetic points at the per-chunk one-hot
proj gathers: (chunk=64, N=25) x (N, A) fp32-highest matmuls pad both
tiny dims to 128 MXU lanes (~10% fill) and run fwd + bwd -> ~75
GFLOP/step of heavily-padded fp32 dot_generals.

Grouping the edges BY THEIR PROJ IMAGE on the host removes the gather
entirely: side i's edges sorted by idx_i give (N, G, A) observation
stacks whose proj term is a plain (N, 1, A) broadcast of the planar
world points; the per-image gproj falls out of the backward as the
group-axis sum, with no scatter and no matmul. Same math, same planar
layout, summation order changes only across edges within a group.

Variants (n=25 complete, 600 edges, bf16 obs):
  base        production fused chunk scan (chunk=64)
  fwdonly     production loss only (no grads) - fwd/bwd split
  chunk32/128 production at other chunk sizes (device-side re-chunk,
              no obs re-upload)
  grouped     flat grouped broadcast, whole loss in one fused chain
  grouped-c5  grouped, lax.scan over 5-image chunks with per-chunk
              value_and_grad (bounds residual memory like production)

Loss and im_depthmaps-grad agreement vs base is printed for each mode.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("EXP6_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dust3r_tpu.cloud_opt import global_aligner, GlobalAlignerMode
from dust3r_tpu.cloud_opt.base_opt import (adaptors_from_params,
                                           alignment_loss,
                                           alignment_value_and_grad,
                                           pw_poses_from_params)
from dust3r_tpu.cloud_opt.commons import get_conf_trf_np, planar_dist
from dust3r_tpu.cloud_opt.optimizer import pco_pts3d_planar

N_IMGS = int(os.environ.get("EXP6_N", 25))
H = int(os.environ.get("EXP6_H", 384))
W = int(os.environ.get("EXP6_W", 512))
A = H * W


def scene_arrays():
    rng = np.random.default_rng(0)
    edges = [(i, j) for i in range(N_IMGS) for j in range(N_IMGS) if i != j]
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


# --------------------------------------------------------------------- #
# production step + device-side re-chunk for the chunk sweep
# --------------------------------------------------------------------- #

def make_base_step(scene, fwdonly=False):
    spec = scene.loss_spec
    pts3d_fn = scene.pts3d_fn

    if fwdonly:
        def fwd(params, consts):
            return alignment_loss(pts3d_fn, spec, params, consts), None
        return fwd, dict(scene.consts)

    def vg(params, consts):
        return alignment_value_and_grad(pts3d_fn, spec, params, consts)

    return vg, dict(scene.consts)


def make_rechunked_step(scene, new_chunk):
    """Production step at a different edge_chunk: re-chunk the pre-chunked
    (K, 3, chunk, A) prediction stacks ON DEVICE (one transpose each; a
    re-upload of the 1.4 GB obs through the tunnel would dominate)."""
    spec = scene.loss_spec._replace(edge_chunk=new_chunk)
    pts3d_fn = scene.pts3d_fn
    consts = dict(scene.consts)
    K, _, c, _ = consts["planar_pred_i"].shape
    E_pad = K * c
    assert E_pad % new_chunk == 0, (E_pad, new_chunk)
    K2 = E_pad // new_chunk

    @jax.jit
    def rechunk(p):  # (K, 3, c, A) -> (K2, 3, new_chunk, A), edge order kept
        flat = p.transpose(0, 2, 1, 3).reshape(E_pad, 3, A)
        return flat.reshape(K2, new_chunk, 3, A).transpose(0, 2, 1, 3)

    for k in ("planar_pred_i", "planar_pred_j"):
        consts[k] = rechunk(consts[k])

    def vg(params, consts):
        return alignment_value_and_grad(pts3d_fn, spec, params, consts)

    return vg, consts


# --------------------------------------------------------------------- #
# grouped-by-image broadcast (gather-free)
# --------------------------------------------------------------------- #

def make_grouped_consts(scene, edges, host_obs):
    """(3, N, G, A) obs + (N, G, A) weights per side, edges grouped by the
    image whose world points the side compares against (idx_i for side i,
    idx_j for side j). Groups are padded to the max group size with
    zero-weight slots pointing at edge 0."""
    pred1, pred2, conf1, conf2 = host_obs
    N, E = scene.n_imgs, scene.n_edges
    trf = get_conf_trf_np(scene.conf_mode)
    gc = dict(
        grid_x=scene.consts["grid_x"], grid_y=scene.consts["grid_y"],
        pp_base=scene.consts["pp_base"],
        total_i=scene.consts["total_area_i"],
        total_j=scene.consts["total_area_j"],
    )
    for side, idx, pred, conf in (
            ("i", [i for i, j in edges], pred1, conf1),
            ("j", [j for i, j in edges], pred2, conf2)):
        idx = np.asarray(idx)
        counts = np.bincount(idx, minlength=N)
        G = int(counts.max())
        perm = np.zeros((N, G), np.int32)
        valid = np.zeros((N, G), np.float32)
        slot = np.zeros(N, np.int32)
        for e, n in enumerate(idx):
            perm[n, slot[n]] = e
            valid[n, slot[n]] = 1.0
            slot[n] += 1
        w = trf(conf.reshape(E, A))[perm] * valid[..., None]  # (N, G, A)
        p = pred.reshape(E, A, 3)[perm]  # (N, G, A, 3)
        gc[f"pred_{side}"] = jnp.asarray(
            np.ascontiguousarray(p.transpose(3, 0, 1, 2)), scene.obs_dtype)
        gc[f"w_{side}"] = jnp.asarray(w, scene.obs_dtype)
        gc[f"perm_{side}"] = jnp.asarray(perm)
    return gc


def make_grouped_step(scene, edges, host_obs, nc=0):
    spec = scene.loss_spec
    N = scene.n_imgs
    gc = make_grouped_consts(scene, edges, host_obs)
    f32 = jnp.float32

    def term(poses, adapt, proj_pl, pred, w, perm, total):
        """pred (3, n, G, A) bf16, w (n, G, A), perm (n, G), proj_pl
        (3, n, A) planar world points for the SAME n images, in order."""
        shp = perm.shape
        p_s = jnp.take(poses, perm.reshape(-1), axis=0).reshape(shp + (4, 4))
        a_s = jnp.take(adapt, perm.reshape(-1), axis=0).reshape(shp + (3,))
        ap = [a_s[..., c, None] * pred[c].astype(f32) for c in range(3)]
        d2 = None
        for c in range(3):
            al = (p_s[:, :, c, 3, None]
                  + p_s[:, :, c, 0, None] * ap[0]
                  + p_s[:, :, c, 1, None] * ap[1]
                  + p_s[:, :, c, 2, None] * ap[2])
            diff = proj_pl[c][:, None, :] - al
            d2 = diff * diff if d2 is None else d2 + diff * diff
        per = planar_dist(spec.dist_mode, d2)
        return jnp.sum(per * w.astype(f32)) / total

    def vg(params, gc):
        def stage1(p):
            return (pw_poses_from_params(spec, p),
                    adaptors_from_params(spec, p),
                    pco_pts3d_planar(spec, p, gc))
        (poses, adapt, proj), vjp1 = jax.vjp(stage1, params)

        if not nc:
            def loss_fn(poses, adapt, proj):
                return (term(poses, adapt, proj, gc["pred_i"], gc["w_i"],
                             gc["perm_i"], gc["total_i"])
                        + term(poses, adapt, proj, gc["pred_j"], gc["w_j"],
                               gc["perm_j"], gc["total_j"]))
            loss, (gp, ga, gproj) = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2))(poses, adapt, proj)
        else:
            K = N // nc
            assert K * nc == N

            def chunked(x, axis):  # split the image axis into (K, nc) chunks
                x = x.reshape(x.shape[:axis] + (K, nc) + x.shape[axis + 1:])
                return jnp.moveaxis(x, axis, 0)

            xs = tuple(chunked(gc[k], 1 if k.startswith("pred") else 0)
                       for k in ("pred_i", "w_i", "perm_i",
                                 "pred_j", "w_j", "perm_j"))
            xs += (chunked(proj, 1),)

            def chunk_term(poses, adapt, proj_c, args):
                pi, wi, mi, pj, wj, mj = args
                return (term(poses, adapt, proj_c, pi, wi, mi, gc["total_i"])
                        + term(poses, adapt, proj_c, pj, wj, mj,
                               gc["total_j"]))

            def body(acc, args):
                loss_acc, gp_acc, ga_acc = acc
                *obs, proj_c = args
                l, (gp, ga, gproj_c) = jax.value_and_grad(
                    chunk_term, argnums=(0, 1, 2))(poses, adapt, proj_c,
                                                   tuple(obs))
                return (loss_acc + l, gp_acc + gp, ga_acc + ga), gproj_c

            (loss, gp, ga), gproj_ck = jax.lax.scan(
                body, (jnp.zeros((), f32), jnp.zeros_like(poses),
                       jnp.zeros_like(adapt)), xs)
            gproj = jnp.moveaxis(gproj_ck, 0, 1).reshape(3, N, A)

        (gparams,) = vjp1((gp, ga, gproj))
        return loss, gparams

    return vg, gc


# --------------------------------------------------------------------- #

def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


def time_step(vg, params, consts, iters=8, rounds=3):
    loss, grads = vg(params, consts)
    sync(loss if grads is None else grads["im_depthmaps"])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            loss, grads = vg(params, consts)
        sync(loss if grads is None else grads["im_depthmaps"])
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best, float(loss), grads


def main():
    print("devices:", jax.devices(), flush=True)
    out, edges, host_obs = scene_arrays()
    scene = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                           verbose=False, obs_dtype=jnp.bfloat16)
    params = dict(scene.params)
    gref = None
    modes = os.environ.get(
        "EXP6_MODES", "base,fwdonly,chunk32,chunk128,grouped,grouped-c5"
    ).split(",")
    for mode in modes:
        try:
            if mode == "base":
                fn, cc = make_base_step(scene)
            elif mode == "fwdonly":
                fn, cc = make_base_step(scene, fwdonly=True)
            elif mode.startswith("chunk"):
                fn, cc = make_rechunked_step(scene, int(mode[5:]))
            elif mode == "grouped":
                fn, cc = make_grouped_step(scene, edges, host_obs)
            elif mode == "grouped-c5":
                fn, cc = make_grouped_step(scene, edges, host_obs, nc=5)
            else:
                raise ValueError(mode)
            vg = jax.jit(fn)
            ms, loss, grads = time_step(vg, params, cc)
            line = (f"{mode:11s}: {ms:7.1f} ms/step ({1000 / ms:6.1f} it/s) "
                    f"loss={loss:.6f}")
            if grads is not None:
                g = np.asarray(grads["im_depthmaps"], np.float64)
                if gref is None:
                    gref = g
                else:
                    rel = (np.abs(g - gref).max()
                           / max(np.abs(gref).max(), 1e-12))
                    line += f"  grad rel={rel:.2e}"
            del cc
            print(line, flush=True)
        except Exception as e:
            print(f"{mode}: FAILED {type(e).__name__}: {e}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
