# HISTORICAL MEASUREMENT RECORD - does not run at HEAD.
# Measured against the pre-image-grouping aligner consts layout
# (stacked_pred_i / onehot_i / weight_i, removed in commit 20e9396 when
# observations moved to the grouped-by-image layout this script's
# results motivated). Kept verbatim as the evidence record behind
# docs/DESIGN.md's round-3 aligner numbers; to re-run, check out the
# parent of 20e9396.
"""Round-3d: coordinate-planar observation layout for the aligner.

exp_align4 showed elementwise-FMA pose application alone LOSES (99 vs
75 ms): with (…, A, 3) arrays the coordinate axis sits next to the lane
dim and every op in the chain pays relayout/padding. Here the whole
chunk-scan step is rebuilt coordinate-planar: obs stored (3, E, A),
world points (3, N, A), so every elementwise op and reduction runs on
A-minor planes with clean (8,128) tiling and the pose application is 9
scalar-broadcast FMAs per chunk. The one-hot proj gather becomes one
(chunk,N)x(N,A) matmul per coordinate.

Variants:
  base     production fused chunk scan (exp_align3 'base', 75 ms/step)
  planar   planar chunk scan described above (same math, same chunking)
  planar-L planar with the dist computed in f32 but obs kept bf16 until
           the subtraction (checks whether the astype placement matters)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("EXP5_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dust3r_tpu.cloud_opt import global_aligner, GlobalAlignerMode
from dust3r_tpu.cloud_opt.base_opt import (adaptors_from_params,
                                           pw_poses_from_params)
from dust3r_tpu.cloud_opt.commons import get_conf_trf_np
from dust3r_tpu.cloud_opt.optimizer import pco_depth_to_pts3d
from dust3r_tpu.utils.pose import pose_vec_to_matrix

N_IMGS = int(os.environ.get("EXP5_N", 25))
H = int(os.environ.get("EXP5_H", 384))
W = int(os.environ.get("EXP5_W", 512))
CHUNK = int(os.environ.get("EXP5_CHUNK", 64))
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


def make_base_step(scene):
    from dust3r_tpu.cloud_opt.base_opt import alignment_value_and_grad

    spec = scene.loss_spec
    pts3d_fn = scene.pts3d_fn  # planar since the exp_align5 integration

    def vg(params, consts):
        return alignment_value_and_grad(pts3d_fn, spec, params, consts)

    return vg


def planar_pts3d(spec, params, consts_planar):
    """(3, N, A) world points, planar: per-coordinate FMAs over (N, A)."""
    focals = jnp.exp(params["im_focals"] / spec.focal_break)  # (N,1|2)
    pp = consts_planar["pp_base"] + 10 * params["im_pp"]  # (N,2)
    T = pose_vec_to_matrix(params["im_poses"])  # (N,4,4)
    depth = jnp.exp(params["im_depthmaps"])  # (N,A)
    gx = consts_planar["grid_x"]  # (N,A) or (1,A)
    gy = consts_planar["grid_y"]
    fx = focals[:, :1]
    fy = focals[:, -1:]
    relx = depth * (gx - pp[:, :1]) / fx
    rely = depth * (gy - pp[:, 1:2]) / fy
    relz = depth
    rel = (relx, rely, relz)
    comps = []
    for c in range(3):
        acc = T[:, c, 3, None]
        for d in range(3):
            acc = acc + T[:, c, d, None] * rel[d]
        comps.append(acc)
    return jnp.stack(comps)  # (3, N, A)


def make_planar_step(scene, edges, host_obs, late_cast):
    spec = scene.loss_spec
    E = scene.n_edges
    E_pad = int(scene.consts["stacked_pred_i"].shape[0])
    chunk = spec.edge_chunk
    K = E_pad // chunk
    assert spec.dist_mode == "l1"

    pred1, pred2, conf1, conf2 = host_obs
    trf = get_conf_trf_np("log")
    odt = np.dtype(np.float32) if False else jnp.bfloat16

    def pad_e(x):
        if E_pad > E:
            x = np.concatenate(
                [x, np.zeros((E_pad - E,) + x.shape[1:], x.dtype)])
        return x

    # planar obs: (3, E_pad, A) bf16, weights (E_pad, A) bf16.
    # IMPORTANT: threaded through as call ARGUMENTS, never closed over -
    # jit-closure constants get serialized into the remote-compile
    # program body (HTTP 413 / broken-pipe, exp_align4 grouped-e).
    grid = np.asarray(scene.consts["grid"])  # (N?, A, 2) or (1, A, 2)

    def planar_chunked(p):  # (E, A, 3) f32 -> (K, 3, chunk, A)
        p = pad_e(p.reshape(E, A, 3))
        return np.ascontiguousarray(
            p.reshape(K, chunk, A, 3).transpose(0, 3, 1, 2))

    pc = dict(
        p_i=jnp.asarray(planar_chunked(pred1), odt),
        p_j=jnp.asarray(planar_chunked(pred2), odt),
        w_i=jnp.asarray(pad_e(trf(conf1).reshape(E, A)), odt),
        w_j=jnp.asarray(pad_e(trf(conf2).reshape(E, A)), odt),
        oh_i=scene.consts["onehot_i"],  # (E_pad, N)
        oh_j=scene.consts["onehot_j"],
        grid_x=jnp.asarray(grid[..., 0]),
        grid_y=jnp.asarray(grid[..., 1]),
        pp_base=scene.consts["pp_base"],
        total_i=scene.consts["total_area_i"],
        total_j=scene.consts["total_area_j"],
    )

    def value_and_grad(params, pc):
        f32 = jnp.float32
        consts_p = dict(grid_x=pc["grid_x"], grid_y=pc["grid_y"],
                        pp_base=pc["pp_base"])
        total_i = pc["total_i"]
        total_j = pc["total_j"]

        def stage1(params):
            pw_poses = pw_poses_from_params(spec, params)
            pw_adapt = adaptors_from_params(spec, params)  # (E,3)
            if E_pad > E:
                eye = jnp.broadcast_to(jnp.eye(4, dtype=pw_poses.dtype),
                                       (E_pad - E, 4, 4))
                pw_poses = jnp.concatenate([pw_poses, eye])
                pw_adapt = jnp.concatenate(
                    [pw_adapt, jnp.ones((E_pad - E, 3), pw_adapt.dtype)])
            proj = planar_pts3d(spec, params, consts_p)  # (3, N, A)
            return pw_poses, pw_adapt, proj

        (pw_poses, pw_adapt, proj), vjp1 = jax.vjp(stage1, params)

        def chunk_term(poses, adapt, proj, pi, pj, wi, wj, ohi, ohj):
            # poses (chunk,4,4) adapt (chunk,3) proj (3,N,A)
            # pi/pj (3,chunk,A) wi/wj (chunk,A)
            def side(pred, oh, w, total):
                # gather the target image's plane per edge: (chunk, A)
                g = [jnp.einsum("en,na->ea", oh, proj[c],
                                precision="highest") for c in range(3)]
                if late_cast:
                    ap = [adapt[:, c, None].astype(jnp.bfloat16) * pred[c]
                          for c in range(3)]
                    ap = [x.astype(f32) for x in ap]
                else:
                    ap = [adapt[:, c, None] * pred[c].astype(f32)
                          for c in range(3)]
                al = [poses[:, c, 3, None]
                      + poses[:, c, 0, None] * ap[0]
                      + poses[:, c, 1, None] * ap[1]
                      + poses[:, c, 2, None] * ap[2] for c in range(3)]
                d2 = ((g[0] - al[0]) ** 2 + (g[1] - al[1]) ** 2
                      + (g[2] - al[2]) ** 2)
                return jnp.sum(jnp.sqrt(d2) * w.astype(f32)) / total

            return side(pi, ohi, wi, total_i) + side(pj, ohj, wj, total_j)

        def r(t):
            return t.reshape((K, chunk) + t.shape[1:])

        xs = (r(pw_poses), r(pw_adapt), pc["p_i"], pc["p_j"],
              r(pc["w_i"]), r(pc["w_j"]), r(pc["oh_i"]), r(pc["oh_j"]))

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

    return value_and_grad, pc


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
    out, edges, host_obs = scene_arrays()
    scene = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                           verbose=False, obs_dtype=jnp.bfloat16,
                           edge_chunk=CHUNK)
    params, consts = dict(scene.params), dict(scene.consts)
    gref = None
    for mode in os.environ.get("EXP5_MODES", "base,planar,planar-L").split(","):
        try:
            if mode == "base":
                vg = jax.jit(make_base_step(scene))
                cc = consts
            else:
                fn, cc = make_planar_step(scene, edges, host_obs,
                                          late_cast=(mode == "planar-L"))
                vg = jax.jit(fn)
            ms, loss = time_step(vg, params, cc)
            line = (f"{mode:9s}: {ms:7.1f} ms/step ({1000 / ms:6.1f} it/s) "
                    f"loss={loss:.6f}")
            _, grads = vg(params, cc)
            g = np.asarray(grads["im_depthmaps"], np.float64)
            if gref is None:
                gref = g
            else:
                rel = np.abs(g - gref).max() / max(np.abs(gref).max(), 1e-12)
                line += f"  grad rel={rel:.2e}"
            print(line, flush=True)
        except Exception as e:
            print(f"{mode}: FAILED {type(e).__name__}: {e}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
