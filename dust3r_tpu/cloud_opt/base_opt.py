"""Scene-graph container + shared accessors for the global aligner.

Behavioral contract: /root/reference/dust3r/cloud_opt/base_opt.py:27-405.
TPU-native redesign: the scene is a pytree of stacked, zero-padded edge
tensors from the start (the reference reaches the same layout only in its
"fast" subclass, optimizer.py:41-61); all parameters live in one params
dict; optimization runs as a single jitted lax.scan (see optimizer.py).
Host-side state (edge lists, image shapes, conf maps) stays in numpy.
"""
from __future__ import annotations

import copy
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .commons import (ALL_DISTS, compute_edge_scores, edge_str, get_conf_trf,
                      get_conf_trf_np, get_imshapes, planar_dist)
from ..utils.geometry import xy_grid, geotrf, inv
from ..utils.pose import (matrix_to_pose_vec, pose_vec_to_matrix,
                          quat_normalize, signed_expm1)
from ..utils.image import rgb


def _ravel_pad(arr, fill):
    """(H, W, ...) -> (H*W, ...) zero-padded to length `fill`."""
    arr = np.asarray(arr, dtype=np.float32)
    flat = arr.reshape((arr.shape[0] * arr.shape[1],) + arr.shape[2:])
    if len(flat) < fill:
        pad = np.zeros((fill - len(flat),) + flat.shape[1:], np.float32)
        flat = np.concatenate([flat, pad])
    return flat


def _as_list(x, n):
    """Predictions arrive stacked (uniform shapes) or as lists (mixed)."""
    if isinstance(x, (list, tuple)):
        return [np.asarray(v) for v in x]
    x = np.asarray(x)
    return [x[k] for k in range(n)]


class AlignerSpec(NamedTuple):
    """Hashable static description of the alignment loss.

    The scanned optimization (`optimizer._alignment_segment`) is jitted on
    (pts3d_fn, spec) as static arguments plus the params/consts pytrees -
    so two scenes with equal specs and equal array SHAPES share one
    compiled program (same-shape demo scenes no longer pay the 7-44 s
    first-run compile each). Everything per-scene and numeric lives in
    `params`/`consts`; everything structural lives here.
    """
    dist_mode: str
    pw_break: float
    base_scale: float
    norm_pw_scale: bool
    edge_chunk: int
    pose_dim: int
    focal_break: float = 0.0  # used by the PointCloudOptimizer pts3d_fn


def pw_poses_from_params(spec, params):
    """Per-edge sim(3) matrices from the raw pw_poses rows (reference
    base_opt.py:150-195: quat+signed-log-t -> RT, exp log-scale, optional
    global scale normalization around base_scale)."""
    p = params["pw_poses"]
    RT = pose_vec_to_matrix(p[:, :spec.pose_dim])
    scale = jnp.exp(p[:, -1])
    if spec.norm_pw_scale:
        scale = scale * jnp.exp(np.log(spec.base_scale) - jnp.mean(p[:, -1]))
    return RT.at[:, :3].multiply(scale[:, None, None])


def adaptors_from_params(spec, params):
    """Per-edge (sxy, sxy, sz) scale adaptors (reference base_opt.py)."""
    p = params["pw_adaptors"]
    adapt = jnp.concatenate([p[:, 0:1], p], axis=-1)
    if spec.norm_pw_scale:
        adapt = adapt - jnp.mean(adapt, axis=1, keepdims=True)
    return jnp.exp(adapt / spec.pw_break)


def _group_layout(indices, n_imgs, g_cap=None):
    """Host helper: edge ids grouped by the image whose world points the
    side compares against (idx_i for side i, idx_j for side j).

    Returns (perm (R, G) int32, valid (R, G) float32, row_img (R,) int32).
    G = min(g_cap, max per-image edge count); an image with more than G
    edges spans several consecutive rows, all mapped back to it through
    row_img. Without a cap R == n_imgs and row_img == arange (one row per
    image). Pad slots point at edge 0; the weights are zeroed through
    `valid`, so they contribute exactly nothing."""
    indices = np.asarray(indices)
    counts = np.bincount(indices, minlength=n_imgs)
    G = max(1, int(counts.max()))
    if g_cap:
        G = min(G, int(g_cap))
        rows_per_img = np.maximum(1, -(-counts // G))
    else:
        rows_per_img = np.ones(n_imgs, np.int64)
    row0 = np.concatenate([[0], np.cumsum(rows_per_img)])
    R = int(row0[-1])
    perm = np.zeros((R, G), np.int32)
    valid = np.zeros((R, G), np.float32)
    row_img = np.zeros(R, np.int32)
    for n in range(n_imgs):
        row_img[row0[n]:row0[n + 1]] = n
    slot = np.zeros(n_imgs, np.int32)
    for e, n in enumerate(indices):
        s = slot[n]
        perm[row0[n] + s // G, s % G] = e
        valid[row0[n] + s // G, s % G] = 1.0
        slot[n] += 1
    return perm, valid, row_img


def _pad_rows(perm, valid, row_img, r_pad):
    """Zero-pad the row axis to r_pad (pad rows: edge 0 / image 0 with
    zero weights — they contribute nothing)."""
    extra = r_pad - len(perm)
    if extra == 0:
        return perm, valid, row_img
    return (np.pad(perm, ((0, extra), (0, 0))),
            np.pad(valid, ((0, extra), (0, 0))),
            np.pad(row_img, (0, extra)))


def _grouped_term(spec, poses, adapt, proj, pred, w, perm, total):
    """Normalized loss contribution of one side's image groups.

    COORDINATE-PLANAR + GROUPED-BY-IMAGE: pred is (3, n, G, A) planes of
    the per-edge predictions sorted so group g holds the edges whose
    world points are image g's; w is (n, G, A); perm (n, G) maps group
    slots back to edge ids for the tiny pose/adaptor gathers; proj is
    (3, n, A) world points for the SAME n images in order.

    Planar keeps every array in the chain A-minor ((8, 128) vreg tiling;
    the (…, A, 3) layout costs 1.7x, scripts/exp_align5_r3.py). Grouping
    makes the proj term a plain (n, 1, A) broadcast: the previous
    per-edge one-hot gather matmuls - (chunk, N) x (N, A) fp32-highest
    dots padding BOTH tiny dims to 128 MXU lanes, fwd + bwd - were the
    dominant residual cost of the chunk-scan step (46.0 -> 24.2 ms/step
    at n=25/600 edges, scripts/exp_align6_r3.py), and the per-image
    gproj now falls out of the backward as the group-axis sum with no
    scatter. The pose application stays 9 scalar-broadcast FMAs fused
    into the distance chain."""
    f32 = jnp.float32
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
        diff = proj[c][:, None, :] - al
        d2 = diff * diff if d2 is None else d2 + diff * diff
    per = planar_dist(spec.dist_mode, d2)
    return jnp.sum(per * w.astype(f32)) / total


def _pad_imgs(proj, n_pad):
    """Zero-pad the image axis of (3, N, A) world points to n_pad (the
    pad groups carry zero weights, so the values never matter)."""
    n = proj.shape[1]
    if n_pad == n:
        return proj
    return jnp.pad(proj, ((0, 0), (0, n_pad - n), (0, 0)))


def _group_xs(consts, proj):
    """Scan inputs (a dict; every leaf is K-leading so lax.scan slices
    chunks): the pre-chunked grouped consts plus matching world-point
    chunks (host chunking makes every scan slice a zero-copy
    leading-axis index). Split-row scenes (see `_group_layout` g_cap)
    carry row->image maps instead of pre-sliced world points; the takes
    happen inside the scan body against the full (3, N, A) points.
    int8-quantized scenes additionally carry the per-slot dequant
    scales (see `_dequant`)."""
    xs = {"pi": consts["group_pred_i"], "wi": consts["group_w_i"],
          "mi": consts["group_perm_i"], "pj": consts["group_pred_j"],
          "wj": consts["group_w_j"], "mj": consts["group_perm_j"]}
    for k in ("pi", "wi", "pj", "wj"):
        sk = {"pi": "group_pred_i_scale", "wi": "group_w_i_scale",
              "pj": "group_pred_j_scale", "wj": "group_w_j_scale"}[k]
        if sk in consts:
            xs[k + "s"] = consts[sk]
    if "group_img_i" in consts:
        xs["ii"] = consts["group_img_i"]
        xs["ij"] = consts["group_img_j"]
        return xs
    K, _, nc, _, A = consts["group_pred_i"].shape
    xs["proj"] = jnp.moveaxis(
        _pad_imgs(proj, K * nc).reshape(3, K, nc, A), 1, 0)
    return xs


def _both_sides_term(spec, consts, poses, adapt, proj_i, proj_j,
                     pi, wi, mi, pj, wj, mj):
    return (_grouped_term(spec, poses, adapt, proj_i, pi, wi, mi,
                          consts["total_area_i"])
            + _grouped_term(spec, poses, adapt, proj_j, pj, wj, mj,
                            consts["total_area_j"]))


def _dequant(x, scale):
    """Undo the int8 per-slot observation quantization: x int8
    (..., A)-minor, scale fp32 broadcast over A. scale=None (bf16/fp32
    observations) passes through — `_grouped_term` upcasts to fp32
    itself. Running the dequant here, on one chunk at a time inside the
    scan, keeps peak memory at the chunk size; the stored consts stay
    int8 (half of bf16: the 16 GB-chip bound on scene size)."""
    if scale is None:
        return x
    return x.astype(jnp.float32) * scale[..., None]


def _chunk_projs(proj, xs):
    """Observation 6-tuple (dequantized if int8) + per-side world-point
    rows for one chunk's scan slice: either the pre-sliced (3, nc, A)
    chunk (one row per image) or, for split-row scenes, takes through
    the chunk's row->image maps."""
    obs = (_dequant(xs["pi"], xs.get("pis")),
           _dequant(xs["wi"], xs.get("wis")), xs["mi"],
           _dequant(xs["pj"], xs.get("pjs")),
           _dequant(xs["wj"], xs.get("wjs")), xs["mj"])
    if "ii" in xs:  # split rows: row->image maps
        return (obs, jnp.take(proj, xs["ii"], axis=1),
                jnp.take(proj, xs["ij"], axis=1))
    return obs, xs["proj"], xs["proj"]


def alignment_loss(pts3d_fn, spec, params, consts):
    """Confidence-weighted 3D consistency over all edges - the pure
    function behind forward() and the non-chunked optimization.

    pts3d_fn(spec, params, consts) -> (3, N, A) coordinate-planar world
    points; pass a MODULE-LEVEL function so the jit cache is keyed on a
    stable identity (optimizer.pco_pts3d_planar for the standard scene).

    Scenes whose grouped consts carry K > 1 image chunks scan
    rematerialized chunks: peak memory through forward + backward stays
    O(nc * G * A) instead of O(E * A)."""
    poses = pw_poses_from_params(spec, params)
    adapt = adaptors_from_params(spec, params)
    proj = pts3d_fn(spec, params, consts)  # (3, N, A)
    K, _, nc = consts["group_pred_i"].shape[:3]
    if K == 1:
        xs1 = jax.tree.map(lambda x: x[0], _group_xs(consts, proj))
        obs, proj_i, proj_j = _chunk_projs(proj, xs1)
        return _both_sides_term(spec, consts, poses, adapt,
                                proj_i, proj_j, *obs)

    xs = _group_xs(consts, proj)

    def body(acc, args):
        def term_fn(a):
            obs, proj_i, proj_j = _chunk_projs(proj, a)
            return _both_sides_term(spec, consts, poses, adapt,
                                    proj_i, proj_j, *obs)

        term = jax.checkpoint(term_fn)(args)
        return acc + term, None

    loss, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
    return loss


def alignment_value_and_grad(pts3d_fn, spec, params, consts):
    """(loss, grads) in a single pass over the edges.

    For chunked scenes the scan computes each image-chunk's loss AND
    gradient contribution inline (one forward per chunk instead of the
    jax.checkpoint fwd+recompute+bwd - measured +39% it/s at n=25/600
    edges, scripts/exp_align_r3.py). Each chunk's world-point gradient
    is exactly its own images' slice (grouping!), so the scan stacks
    them with no accumulator; pose/adaptor gradients accumulate across
    chunks and everything flows back through pts3d_fn once via jax.vjp.
    """
    K = consts["group_pred_i"].shape[0]
    if K == 1:
        return jax.value_and_grad(alignment_loss, argnums=2)(
            pts3d_fn, spec, params, consts)

    def stage1(params):
        return (pw_poses_from_params(spec, params),
                adaptors_from_params(spec, params),
                pts3d_fn(spec, params, consts))

    (poses, adapt, proj), vjp1 = jax.vjp(stage1, params)
    _, _, nc, _, A = consts["group_pred_i"].shape
    N = proj.shape[1]
    xs = _group_xs(consts, proj)

    if "group_img_i" in consts:
        # split-row scenes: a chunk's rows are not an image slice, so the
        # world-point gradient accumulates through the in-chunk takes
        # into a full (3, N, A) buffer instead of stacking slices
        def body(acc, args):
            loss_acc, gp_acc, ga_acc, gproj_acc = acc

            def term(poses, adapt, proj):
                obs, proj_i, proj_j = _chunk_projs(proj, args)
                return _both_sides_term(spec, consts, poses, adapt,
                                        proj_i, proj_j, *obs)

            l, (gp, ga, gproj_c) = jax.value_and_grad(
                term, argnums=(0, 1, 2))(poses, adapt, proj)
            return (loss_acc + l, gp_acc + gp, ga_acc + ga,
                    gproj_acc + gproj_c), None

        (loss, gposes, gadapt, gproj), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), jnp.zeros_like(poses),
                   jnp.zeros_like(adapt), jnp.zeros_like(proj)), xs)
        (gparams,) = vjp1((gposes, gadapt, gproj))
        return loss, gparams

    def chunk_term(poses, adapt, proj_c, obs):
        return _both_sides_term(spec, consts, poses, adapt, proj_c,
                                proj_c, *obs)

    def body(acc, args):
        loss_acc, gp_acc, ga_acc = acc
        obs, proj_c, _ = _chunk_projs(proj, args)
        l, (gp, ga, gproj_c) = jax.value_and_grad(
            chunk_term, argnums=(0, 1, 2))(poses, adapt, proj_c, obs)
        return (loss_acc + l, gp_acc + gp, ga_acc + ga), gproj_c

    (loss, gposes, gadapt), gproj_c = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros_like(poses),
               jnp.zeros_like(adapt)), xs)
    gproj = jnp.moveaxis(gproj_c, 0, 1).reshape(3, K * nc, A)[:, :N]
    (gparams,) = vjp1((gposes, gadapt, gproj))
    return loss, gparams


class BasePCOptimizer:
    """Graph of images (nodes) and pairwise predictions (edges).

    Parameters optimized (the `params` dict pytree):
      pw_poses    (E, 8)  per-edge sim(3): quat(4) + signed-log t(3) + log s
      pw_adaptors (E, 2)  per-edge xy/z scale adaptation (off by default)
    Subclasses add per-image params (depthmaps, poses, focals, pp).
    """

    POSE_DIM = 7

    def __init__(self, view1, view2, pred1, pred2,
                 dist="l1",
                 conf="log",
                 min_conf_thr=3,
                 base_scale=0.5,
                 allow_pw_adaptors=False,
                 pw_break=20,
                 rand_pose=None,
                 seed=0,
                 verbose=True,
                 obs_dtype=jnp.bfloat16,
                 edge_chunk=768,
                 group_cap=None,
                 mesh=None,
                 **_ignored):
        self.verbose = verbose
        # observation storage dtype: bf16 (default) halves the HBM traffic
        # of the memory-bound alignment loop (+17-20% it/s measured);
        # distances are computed in fp32 either way, and recovery quality
        # matches fp32-obs within optimization noise
        # (tests/test_cloud_opt.py::TestBf16ObsAccuracyDelta). Pass
        # jnp.float32 to pin exact-reference behavior, or 'int8' to
        # halve storage again for very large scenes (per-slot scaled
        # symmetric quantization; TestInt8ObsAccuracyDelta).
        self.obs_dtype = obs_dtype
        self.obs_quant = np.dtype(obs_dtype) == np.int8
        # above this many edges the loss scans image-grouped chunks
        # instead of materializing O(E * A) intermediates, so very large
        # graphs still fit a 16 GB chip. The flat path is fastest while
        # it fits: 600 edges flat = 24.2 ms/step vs 29.5 chunked-by-5
        # (scripts/exp_align6_r3.py), and 600 edges measured ~8 GB peak -
        # hence the 768 default. Lower it for bigger-A or busier chips.
        self.edge_chunk = edge_chunk
        # cap on edges per observation row (None = auto: uncapped for
        # balanced graphs, 2*ceil(E/N) when grouping would pad >4x the
        # edge count - e.g. oneref star graphs). See _group_layout.
        self.group_cap = group_cap
        # multi-chip: shard the IMAGE axis of the grouped observations
        # over all devices of the mesh (SURVEY §5's TPU analogue of
        # "scale" = number of aligner edges). Each device owns its
        # images' edge groups and their gproj slice; params stay
        # replicated and XLA inserts the loss/pose-grad all-reduce from
        # the shardings. Supersedes chunking (each shard holds ~E/n
        # edges - the memory win is the same mechanism, spatial instead
        # of temporal).
        self.mesh = mesh
        if mesh is not None:
            self.edge_chunk = 0
        self.min_conf_thr = min_conf_thr
        self.base_scale = base_scale
        self.pw_break = pw_break
        self.norm_pw_scale = True
        self.has_im_poses = False
        self.dist_mode = dist
        self.dist = ALL_DISTS[dist]
        self.conf_mode = conf
        self.conf_trf = get_conf_trf(conf)

        idx1 = [int(i) for i in np.asarray(view1["idx"]).reshape(-1)]
        idx2 = [int(j) for j in np.asarray(view2["idx"]).reshape(-1)]
        self.edges = list(zip(idx1, idx2))
        self.is_symmetrized = set(self.edges) == {(j, i) for i, j in self.edges}
        self.n_imgs = self._check_edges()

        E = self.n_edges
        pred_i = _as_list(pred1["pts3d"], E)
        pred_j = _as_list(pred2["pts3d_in_other_view"], E)
        conf_i = _as_list(pred1["conf"], E)
        conf_j = _as_list(pred2["conf"], E)

        self.imshapes = get_imshapes(self.edges, pred_i, pred_j)
        im_areas = [h * w for h, w in self.imshapes]
        self.max_area = max(im_areas)
        self.im_areas = im_areas
        A = self.max_area

        # per-edge raw predictions and confidences (host copies for init)
        self.pred_i = {edge_str(i, j): pred_i[e]
                       for e, (i, j) in enumerate(self.edges)}
        self.pred_j = {edge_str(i, j): pred_j[e]
                       for e, (i, j) in enumerate(self.edges)}
        self.conf_i = {edge_str(i, j): conf_i[e]
                       for e, (i, j) in enumerate(self.edges)}
        self.conf_j = {edge_str(i, j): conf_j[e]
                       for e, (i, j) in enumerate(self.edges)}

        # stacked device tensors, kept in a consts pytree that is passed as
        # a jit ARGUMENT to the optimization loop (closing over them would
        # bake hundreds of MB of constants into the XLA program).
        # conf transforms run on HOST numpy: one device call per edge costs
        # a tunnel dispatch round trip each (~minutes of scene build at
        # 600 edges); the numpy twin computes the same values
        trf_np = get_conf_trf_np(conf)
        w_i = [trf_np(np.asarray(c, np.float32)) for c in conf_i]
        w_j = [trf_np(np.asarray(c, np.float32)) for c in conf_j]
        odt = self.obs_dtype
        N = self.n_imgs
        idx_i = [i for i, j in self.edges]
        idx_j = [j for i, j in self.edges]
        G_max = max(1, int(max(np.bincount(np.asarray(idx_i), minlength=N)
                               .max(initial=0),
                               np.bincount(np.asarray(idx_j), minlength=N)
                               .max(initial=0))))
        # observations are stored GROUPED BY IMAGE, coordinate-planar and
        # pre-chunked: (K, 3, nc, G, A). Grouping removes the per-edge
        # proj gathers from the loss entirely (the world points broadcast
        # per image/row - see _grouped_term); planar keeps every
        # loss-chain array A-minor. Balanced graphs (complete/swin:
        # per-image count ~ E/N) store one row per image with near-zero
        # padding. Unbalanced graphs (oneref stars: hub count ~ E) would
        # pad every image to the hub's count - O(N*E*A), unrunnable - so
        # oversized groups split into rows of at most g_cap edges, mapped
        # back through row->image indices ("group_img_*" consts; the
        # world points then ride a take instead of the 1:1 broadcast).
        avg = -(-E // max(N, 1))
        split = self.group_cap is not None or N * G_max > 4 * E
        g_cap = (self.group_cap or min(G_max, max(1, 2 * avg))) \
            if split else None
        perm_i, valid_i, rimg_i = _group_layout(idx_i, N, g_cap)
        perm_j, valid_j, rimg_j = _group_layout(idx_j, N, g_cap)
        R = max(len(perm_i), len(perm_j))
        G_sched = max(perm_i.shape[1], perm_j.shape[1])
        # K = number of row chunks the loss scans; flat (K=1) up to
        # ~edge_chunk edges, beyond that the smallest K whose chunks stay
        # under edge_chunk edges (minimizes row padding).
        if self.edge_chunk and E > self.edge_chunk:
            nc_max = max(1, self.edge_chunk // G_sched)
            K = -(-R // nc_max)
        else:
            K = 1
        if self.mesh is not None:
            n_shard = int(np.prod(list(self.mesh.shape.values())))
            K = 1
            nc = -(-R // n_shard) * n_shard  # row axis shards evenly
        else:
            nc = -(-R // K)
        R_pad = K * nc
        self._n_img_groups = (K, nc, G_sched)

        perm_i, valid_i, rimg_i = _pad_rows(perm_i, valid_i, rimg_i, R_pad)
        perm_j, valid_j, rimg_j = _pad_rows(perm_j, valid_j, rimg_j, R_pad)

        def group_pred(rows, perm):
            arr = np.stack([_ravel_pad(r, A) for r in rows])  # (E, A, 3)
            g = arr[perm]  # (N_pad, G, A, 3)
            return np.ascontiguousarray(
                g.transpose(3, 0, 1, 2).reshape(3, K, nc, -1, A)
                .transpose(1, 0, 2, 3, 4))

        def group_w(rows, perm, valid):
            arr = np.stack([_ravel_pad(r, A) for r in rows])  # (E, A)
            g = arr[perm] * valid[..., None]  # (N_pad, G, A)
            return np.ascontiguousarray(g.reshape(K, nc, -1, A))

        self.consts = {
            # group slot -> edge id, for the tiny pose/adaptor gathers
            "group_perm_i": jnp.asarray(perm_i.reshape(K, nc, -1)),
            "group_perm_j": jnp.asarray(perm_j.reshape(K, nc, -1)),
        }
        grouped = {
            "group_pred_i": group_pred(pred_i, perm_i),
            "group_pred_j": group_pred(pred_j, perm_j),
            # pre-transformed conf weights; group padding has weight 0
            "group_w_i": group_w(w_i, perm_i, valid_i),
            "group_w_j": group_w(w_j, perm_j, valid_j),
        }
        if self.obs_quant:
            # int8 observation storage (opt-in, obs_dtype='int8'): half
            # of bf16 — the 16 GB-chip bound on scene size — at a
            # coarser quantization floor (symmetric per-slot max-abs,
            # per coordinate PLANE for the preds so depth's larger range
            # doesn't cost x/y precision; step = max|v|/127 ~ 0.8% of
            # the slot range vs bf16's 0.4%-of-value; floor defended by
            # tests/test_cloud_opt.py::TestInt8ObsAccuracyDelta).
            for k, g in grouped.items():
                s = np.maximum(np.abs(g).max(axis=-1), 1e-12) / 127.0
                q = np.rint(g / s[..., None]).clip(-127, 127)
                self.consts[k] = jnp.asarray(q.astype(np.int8))
                self.consts[k + "_scale"] = jnp.asarray(
                    s.astype(np.float32))
        else:
            for k, g in grouped.items():
                self.consts[k] = jnp.asarray(g, odt)
        del grouped
        if split:
            # row -> image maps (only present when groups were split; the
            # loss keys its layout branch on these)
            self.consts["group_img_i"] = jnp.asarray(rimg_i.reshape(K, nc))
            self.consts["group_img_j"] = jnp.asarray(rimg_j.reshape(K, nc))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            axes = tuple(self.mesh.axis_names)
            # multi-chip: shard the IMAGE axis (position 2 of the K=1
            # grouped stacks). Each device owns its images' groups AND
            # their gproj slice - the only collectives XLA inserts are
            # the scalar loss psum and the tiny pose-grad reduce.
            specs = {
                "group_pred_i": PartitionSpec(None, None, axes),
                "group_pred_j": PartitionSpec(None, None, axes),
                "group_pred_i_scale": PartitionSpec(None, None, axes),
                "group_pred_j_scale": PartitionSpec(None, None, axes),
                "group_w_i": PartitionSpec(None, axes),
                "group_w_j": PartitionSpec(None, axes),
                "group_w_i_scale": PartitionSpec(None, axes),
                "group_w_j_scale": PartitionSpec(None, axes),
                "group_perm_i": PartitionSpec(None, axes),
                "group_perm_j": PartitionSpec(None, axes),
                "group_img_i": PartitionSpec(None, axes),
                "group_img_j": PartitionSpec(None, axes),
            }
            self.consts = {
                k: jax.device_put(v, NamedSharding(self.mesh, specs[k]))
                for k, v in self.consts.items()}
        self.total_area_i = sum(im_areas[i] for i, j in self.edges)
        self.total_area_j = sum(im_areas[j] for i, j in self.edges)
        # normalization denominators ride in consts (replicated scalars)
        # so same-shape scenes with different graphs share one program
        self.consts["total_area_i"] = jnp.float32(self.total_area_i)
        self.consts["total_area_j"] = jnp.float32(self.total_area_j)

        # per-image max-confidence maps
        self.im_conf = self._compute_img_conf(conf_i, conf_j)

        # learnable pairwise pose parameters
        rng = np.random.default_rng(seed)
        if rand_pose is None:
            rand_pose = lambda shape: rng.standard_normal(shape).astype(np.float32)
        self.rand_pose = rand_pose
        self.params = {
            "pw_poses": jnp.asarray(rand_pose((E, 1 + self.POSE_DIM))),
            "pw_adaptors": jnp.zeros((E, 2), jnp.float32),
        }
        self.masks = {
            "pw_poses": jnp.ones((E, 1 + self.POSE_DIM), jnp.float32),
            "pw_adaptors": jnp.full((E, 2), float(allow_pw_adaptors), jnp.float32),
        }

        # keep display images if provided
        self.imgs = None
        if "img" in view1 and "img" in view2:
            imgs = [None] * self.n_imgs
            img1 = _as_list(view1["img"], E)
            img2 = _as_list(view2["img"], E)
            for e in range(E):
                imgs[idx1[e]] = img1[e]
                imgs[idx2[e]] = img2[e]
            self.imgs = [rgb(im) for im in imgs]

    # ------------------------------------------------------------------ #
    # basic graph properties
    # ------------------------------------------------------------------ #

    @property
    def n_edges(self):
        return len(self.edges)

    @property
    def str_edges(self):
        return [edge_str(i, j) for i, j in self.edges]

    @property
    def imsizes(self):
        return [(w, h) for h, w in self.imshapes]

    def state_dict(self, trainable=True):
        """Scene parameter snapshot (reference base_opt.py:121-126).

        trainable=True returns the optimized parameters (host numpy);
        False returns the frozen observation buffers.
        """
        if trainable:
            return {k: np.asarray(v) for k, v in self.params.items()}
        return dict(consts=jax.device_get(self.consts),
                    im_conf=[np.asarray(c) for c in self.im_conf])

    def load_state_dict(self, data):
        for k, v in data.items():
            if k in self.params:
                self.params[k] = jnp.asarray(v)
        return self

    def _check_edges(self):
        indices = sorted({i for e in self.edges for i in e})
        assert indices == list(range(len(indices))), \
            "bad pair indices: missing values"
        return len(indices)

    def _compute_img_conf(self, conf_i, conf_j):
        im_conf = [np.zeros(hw, np.float32) for hw in self.imshapes]
        for e, (i, j) in enumerate(self.edges):
            im_conf[i] = np.maximum(im_conf[i], conf_i[e])
            im_conf[j] = np.maximum(im_conf[j], conf_j[e])
        return im_conf

    def edge_scores(self):
        conf_i = [self.conf_i[s] for s in self.str_edges]
        conf_j = [self.conf_j[s] for s in self.str_edges]
        return compute_edge_scores(self.edges, conf_i, conf_j)

    # ------------------------------------------------------------------ #
    # pairwise pose access
    # ------------------------------------------------------------------ #

    def get_adaptors(self, params=None):
        # (sxy, sxy, sz) per edge
        return adaptors_from_params(self.loss_spec, params or self.params)

    def get_pw_norm_scale_factor(self, params=None):
        if self.norm_pw_scale:
            p = (params or self.params)["pw_poses"]
            return jnp.exp(np.log(self.base_scale) - jnp.mean(p[:, -1]))
        return jnp.asarray(1.0)

    def get_pw_scale(self, params=None):
        p = (params or self.params)["pw_poses"]
        return jnp.exp(p[:, -1]) * self.get_pw_norm_scale_factor(params)

    def get_pw_poses(self, params=None):
        return pw_poses_from_params(self.loss_spec, params or self.params)

    # ------------------------------------------------------------------ #
    # host-side parameter writes (init & presets)
    # ------------------------------------------------------------------ #

    def _set_pose(self, name, idx, pose_or_R, T=None, scale=None, force=False):
        """Write a pose into params[name][idx] (host op, respects masks
        unless force)."""
        mask = np.asarray(self.masks[name][idx])
        if not (mask.any() or force):
            return
        pose_or_R = np.asarray(pose_or_R)
        if pose_or_R.shape == (4, 4):
            assert T is None
            M = pose_or_R
        else:
            M = np.eye(4, dtype=np.float32)
            M[:3, :3] = pose_or_R
            M[:3, 3] = np.asarray(T).reshape(3)
        vec = np.asarray(matrix_to_pose_vec(M, scale=scale))
        cur = np.array(self.params[name])
        cur[idx, :len(vec)] = vec
        self.params[name] = jnp.asarray(cur)

    def get_masks(self):
        return [c > self.min_conf_thr for c in self.im_conf]

    def get_conf(self, mode=None):
        trf = self.conf_trf if mode is None else get_conf_trf(mode)
        return [np.asarray(trf(jnp.asarray(c))) for c in self.im_conf]

    # subclass responsibilities ----------------------------------------- #

    def depth_to_pts3d(self, params=None, consts=None):
        raise NotImplementedError

    def get_pts3d(self, raw=False, params=None):
        res = self.depth_to_pts3d(params)
        if not raw:
            res = [res[n, :h * w].reshape(h, w, 3)
                   for n, (h, w) in enumerate(self.imshapes)]
        return res

    def get_im_poses(self):
        raise NotImplementedError

    def get_focals(self):
        raise NotImplementedError

    def get_principal_points(self):
        raise NotImplementedError

    def get_depthmaps(self, raw=False):
        raise NotImplementedError

    # ------------------------------------------------------------------ #
    # loss (pure function of params - used by the scan loop and forward)
    # ------------------------------------------------------------------ #

    @property
    def loss_spec(self):
        """The static (hashable) half of the loss configuration; the jit
        cache for the optimization loop is keyed on (pts3d_fn, spec)."""
        return AlignerSpec(
            dist_mode=self.dist_mode,
            pw_break=float(self.pw_break),
            base_scale=float(self.base_scale),
            norm_pw_scale=bool(self.norm_pw_scale),
            edge_chunk=int(self.edge_chunk),
            pose_dim=int(self.POSE_DIM),
            focal_break=float(getattr(self, "focal_break", 0.0)),
        )

    @property
    def pts3d_fn(self):
        """Module-level (spec, params, consts) -> (3, N, A) planar world
        points used by the pure loss; subclasses override `_PTS3D_FN`.
        Falls back to wrapping the instance method's (N, A, 3) contract
        (per-instance jit key) for exotic subclasses that only define
        depth_to_pts3d."""
        fn = getattr(type(self), "_PTS3D_FN", None)
        if fn is not None:
            return fn
        return lambda spec, params, consts: jnp.transpose(
            self.depth_to_pts3d(params, consts=consts), (2, 0, 1))

    def loss_fn(self, params, consts=None):
        """Confidence-weighted 3D consistency over all edges.

        `consts` carries the stacked edge tensors; inside the jitted scan
        loop it is threaded as an argument (never a closure constant)."""
        c = self.consts if consts is None else consts
        return alignment_loss(self.pts3d_fn, self.loss_spec, params, c)

    def forward(self):
        return float(self.loss_fn(self.params))

    __call__ = forward

    # ------------------------------------------------------------------ #
    # main entry point
    # ------------------------------------------------------------------ #

    def compute_global_alignment(self, init=None, niter_PnP=10, **kw):
        from . import init_im_poses as init_fun

        if init is None:
            pass
        elif init in ("msp", "mst"):
            init_fun.init_minimum_spanning_tree(self, niter_PnP=niter_PnP)
        elif init == "known_poses":
            init_fun.init_from_known_poses(self, min_conf_thr=self.min_conf_thr,
                                           niter_PnP=niter_PnP)
        else:
            raise ValueError(f"bad value for init={init!r}")

        from .optimizer import global_alignment_loop
        return global_alignment_loop(self, **kw)

    # ------------------------------------------------------------------ #
    # post-processing
    # ------------------------------------------------------------------ #

    def mask_sky(self):
        from ..viz import segment_sky

        # shallow copy + fresh conf maps only: the reference mutates just
        # im_conf; deep-copying would duplicate the stacked device buffers
        # (hundreds of MB) on every demo slider toggle.
        res = copy.copy(self)
        res.im_conf = [np.array(c, copy=True) for c in self.im_conf]
        for i in range(self.n_imgs):
            sky = segment_sky(self.imgs[i])
            res.im_conf[i] = np.where(sky, 0.0, res.im_conf[i])
        return res

    def clean_pointcloud(self, tol=0.001, bad_conf=0, max_bad_conf=None):
        """Lower the confidence of points occluded by more-confident
        geometry in other views (reference base_opt.py:369-405).

        Vectorized per source image over all target cameras.
        """
        assert 0 <= tol < 1
        K = np.asarray(self.get_intrinsics())
        cams = np.asarray(inv(self.get_im_poses()))  # world2cam
        depthmaps = [np.asarray(d) for d in self.get_depthmaps()]
        all_pts3d = [np.asarray(p) for p in self.get_pts3d()]
        res = [c.copy() for c in self.im_conf]

        # pad depth/conf of each target view for vectorized gather
        for i, pts3d in enumerate(all_pts3d):
            for j in range(self.n_imgs):
                if i == j:
                    continue
                Hj, Wj = self.imshapes[j]
                proj = geotrf(cams[j], pts3d)  # (H,W,3) in cam j
                proj = np.asarray(proj)
                z = proj[..., 2]
                uv = np.asarray(geotrf(K[j], proj, norm=1, ncol=2))
                u = np.round(uv[..., 0]).astype(np.int64)
                v = np.round(uv[..., 1]).astype(np.int64)
                msk = (z > 0) & (u >= 0) & (u < Wj) & (v >= 0) & (v < Hj)
                uc, vc = np.clip(u, 0, Wj - 1), np.clip(v, 0, Hj - 1)
                depth_j = depthmaps[j][vc, uc]
                conf_j = res[j][vc, uc]
                bad = msk & (z < (1 - tol) * depth_j) & (res[i] < conf_j)
                res[i] = np.where(bad, np.minimum(res[i], bad_conf), res[i])

        self.im_conf = res
        return self

    def get_dense_pts3d(self):
        """Convenience: (pts3d list, depthmaps list, confs list)."""
        return self.get_pts3d(), self.get_depthmaps(), \
            [np.asarray(c) for c in self.im_conf]

    def show(self, **kw):
        from ..viz import SceneViz, auto_cam_size

        viz = SceneViz()
        if self.imgs is None:
            colors = np.random.randint(0, 256, size=(self.n_imgs, 3))
            colors = list(map(tuple, colors.tolist()))
            for n in range(self.n_imgs):
                viz.add_pointcloud(self.get_pts3d()[n], colors[n],
                                   self.get_masks()[n])
        else:
            viz.add_pointcloud(self.get_pts3d(), self.imgs, self.get_masks())
            colors = np.random.randint(256, size=(self.n_imgs, 3))
        im_poses = np.asarray(self.get_im_poses())
        cam_size = kw.pop("cam_size", None) or auto_cam_size(im_poses)
        viz.add_cameras(im_poses, np.asarray(self.get_focals()), colors=colors,
                        images=self.imgs, imsizes=self.imsizes,
                        cam_size=cam_size)
        viz.show(**kw)
        return viz
