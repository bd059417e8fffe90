"""PointCloudOptimizer: the fast, fully-vectorized global aligner.

Behavioral contract: /root/reference/dust3r/cloud_opt/optimizer.py:16-248
and the Adam loop of base_opt.py:326-366. TPU-native redesign: the whole
niter-step Adam optimization is ONE jitted lax.scan over stacked edge
tensors - no per-iteration host round-trips (the reference pays a python
loop + CUDA launches per iter; this is where the iters/sec headroom lives,
SURVEY.md §7).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .base_opt import (BasePCOptimizer, _ravel_pad, alignment_loss,
                       alignment_value_and_grad)
from .commons import make_lr_schedule
from ..utils.geometry import xy_grid
from ..utils.pose import pose_vec_to_matrix


def pco_pts3d_planar(spec, params, consts):
    """Coordinate-planar (3, N, A) world points from the per-image
    learnables (pure; reference optimizer.py:170-211): exp(log-depth)
    back-projected through focal/pp and transformed by the per-image
    pose. Planar (vs (N, A, 3)) keeps the whole chain A-minor - see
    base_opt._grouped_term - with the pose applied as scalar-broadcast
    FMAs. Module-level so the jit cache key is stable across scene
    instances."""
    focals = jnp.exp(params["im_focals"] / spec.focal_break)  # (N,1|2)
    pp = consts["pp_base"] + 10 * params["im_pp"]  # (N,2)
    T = pose_vec_to_matrix(params["im_poses"])  # (N,4,4)
    depth = jnp.exp(params["im_depthmaps"])  # (N,A)
    # focals (N,1) broadcasts to fx=fy; (N,2) is per-axis (fx, fy)
    rel = (depth * (consts["grid_x"] - pp[:, :1]) / focals[:, :1],
           depth * (consts["grid_y"] - pp[:, 1:2]) / focals[:, -1:],
           depth)
    return jnp.stack([
        T[:, c, 3, None]
        + T[:, c, 0, None] * rel[0]
        + T[:, c, 1, None] * rel[1]
        + T[:, c, 2, None] * rel[2] for c in range(3)])


def pco_depth_to_pts3d(spec, params, consts):
    """(N, A, 3) view of pco_pts3d_planar - the reference-shaped contract
    used by accessors and host-side consumers."""
    return jnp.transpose(pco_pts3d_planar(spec, params, consts), (1, 2, 0))


class PointCloudOptimizer(BasePCOptimizer):
    """Adds per-image learnables: log-depthmaps, 7-dof poses, log-focals
    (scaled by focal_break), optional principal points."""

    _PTS3D_FN = staticmethod(pco_pts3d_planar)

    def __init__(self, *args, optimize_pp=False, focal_break=20,
                 fx_and_fy=False, **kwargs):
        super().__init__(*args, **kwargs)
        self.has_im_poses = True
        self.focal_break = focal_break
        self.optimize_pp = optimize_pp
        self.n_focals = 2 if fx_and_fy else 1

        N, A = self.n_imgs, self.max_area
        rng = np.random.default_rng(1)

        depth_init = np.stack([
            _ravel_pad(rng.standard_normal(hw).astype(np.float32) / 10 - 3, A)
            for hw in self.imshapes])
        self.params.update({
            "im_depthmaps": jnp.asarray(depth_init),  # log depth, (N, A)
            "im_poses": jnp.asarray(self.rand_pose((N, self.POSE_DIM))),
            "im_focals": jnp.asarray(
                [[focal_break * np.log(max(hw))] * self.n_focals
                 for hw in self.imshapes], jnp.float32),
            "im_pp": jnp.zeros((N, 2), jnp.float32),
        })
        self.masks.update({
            "im_depthmaps": jnp.ones((N, A), jnp.float32),
            "im_poses": jnp.ones((N, self.POSE_DIM), jnp.float32),
            "im_focals": jnp.ones((N, self.n_focals), jnp.float32),
            "im_pp": jnp.full((N, 2), float(optimize_pp), jnp.float32),
        })

        self.consts["pp_base"] = jnp.asarray(
            [(w / 2, h / 2) for h, w in self.imshapes], jnp.float32)
        # pixel grids stored as separate x/y planes ((N, A) each, A-minor)
        # for the planar pts3d path
        grids = np.stack([_ravel_pad(np.asarray(xy_grid(w, h)), A)
                          for h, w in self.imshapes])  # (N, A, 2)
        self.consts["grid_x"] = jnp.asarray(
            np.ascontiguousarray(grids[..., 0]))
        self.consts["grid_y"] = jnp.asarray(
            np.ascontiguousarray(grids[..., 1]))

    # ------------------------------------------------------------------ #
    # presets (known poses / intrinsics)
    # ------------------------------------------------------------------ #

    def _get_msk_indices(self, msk):
        if msk is None:
            return list(range(self.n_imgs))
        if isinstance(msk, int):
            return [msk]
        msk = np.asarray(msk)
        if msk.dtype == bool:
            assert len(msk) == self.n_imgs
            return list(np.where(msk)[0])
        return [int(i) for i in msk.reshape(-1)]

    def _freeze(self, name, indices):
        m = np.array(self.masks[name])
        # dtype pinned so an EMPTY preset (Modular no-op, matching the
        # reference's silent zip) indexes as int, not float64
        m[np.asarray(indices, dtype=np.int64)] = 0.0
        self.masks[name] = jnp.asarray(m)

    def _check_all_imgs_are_selected(self, msk):
        """PointCloudOptimizer presets must cover EVERY image (reference
        optimizer.py:63-64 'incomplete mask!'); partial presets are the
        Modular variant's job."""
        assert np.array_equal(np.asarray(self._get_msk_indices(msk)),
                              np.arange(self.n_imgs)), "incomplete mask!"

    @staticmethod
    def _check_counts_match(idxs, values, what):
        # beyond-reference guard: the reference zip()s silently, so fewer
        # values than selected images freezes images it never set
        assert len(values) == len(idxs), (
            f"{len(values)} {what} given for {len(idxs)} selected images")

    def preset_pose(self, known_poses, pose_msk=None):
        self._check_all_imgs_are_selected(pose_msk)
        idxs = self._get_msk_indices(pose_msk)
        known_poses = np.asarray(known_poses)
        if known_poses.ndim == 2:
            known_poses = known_poses[None]
        self._check_counts_match(idxs, known_poses, "poses")
        for idx, pose in zip(idxs, known_poses):
            if self.verbose:
                print(f" (setting pose #{idx} = {pose[:3, 3]})")
            self._set_pose("im_poses", idx, pose, force=True)
        # all poses are known after a (complete) preset: absolute scale is
        # pinned, pairwise-scale normalization off (reference
        # optimizer.py:80-81 ends at norm_pw_scale = False)
        self.norm_pw_scale = False
        self._freeze("im_poses", idxs)

    def preset_focal(self, known_focals, msk=None):
        self._check_all_imgs_are_selected(msk)
        idxs = self._get_msk_indices(msk)
        self._check_counts_match(idxs, known_focals, "focals")
        for idx, focal in zip(idxs, known_focals):
            if self.verbose:
                print(f" (setting focal #{idx} = {focal})")
            self._set_focal(idx, focal, force=True)
        self._freeze("im_focals", idxs)

    def preset_principal_point(self, known_pp, msk=None):
        self._check_all_imgs_are_selected(msk)
        idxs = self._get_msk_indices(msk)
        known_pp = np.asarray(known_pp).reshape(-1, 2)
        self._check_counts_match(idxs, known_pp, "principal points")
        for idx, pp in zip(idxs, known_pp):
            if self.verbose:
                print(f" (setting principal point #{idx} = {pp})")
            self._set_principal_point(idx, pp, force=True)
        self._freeze("im_pp", idxs)

    def preset_intrinsics(self, known_K, msk=None):
        known_K = np.asarray(known_K)
        if known_K.ndim == 2:
            known_K = known_K[None]
        self.preset_focal([K.diagonal()[:2].mean() for K in known_K], msk)
        self.preset_principal_point([K[:2, 2] for K in known_K], msk)

    # ------------------------------------------------------------------ #
    # parameter writes
    # ------------------------------------------------------------------ #

    def _set_focal(self, idx, focal, force=False):
        if np.asarray(self.masks["im_focals"][idx]).any() or force:
            cur = np.array(self.params["im_focals"])
            # degenerate pointmaps can give focal ~ 0 (Weiszfeld on noise);
            # clamp so log stays finite. Scalar focal broadcasts to fx=fy;
            # a pair sets fx != fy (Modular fx_and_fy mode).
            vals = np.atleast_1d(np.asarray(focal, np.float64))
            cur[idx] = self.focal_break * np.log(np.maximum(vals, 1e-4))
            self.params["im_focals"] = jnp.asarray(cur)

    def _set_principal_point(self, idx, pp, force=False):
        if np.asarray(self.masks["im_pp"][idx]).any() or force:
            h, w = self.imshapes[idx]
            cur = np.array(self.params["im_pp"])
            cur[idx] = (np.asarray(pp) - (w / 2, h / 2)) / 10
            self.params["im_pp"] = jnp.asarray(cur)

    def _set_depthmap(self, idx, depth, force=False):
        depth = np.asarray(depth, np.float32)
        logd = np.log(depth, out=np.zeros_like(depth),
                      where=depth > 0)  # log; <=0 -> 0 (ref nan_to_num)
        if np.asarray(self.masks["im_depthmaps"][idx]).any() or force:
            cur = np.array(self.params["im_depthmaps"])
            cur[idx] = _ravel_pad(logd.reshape(self.imshapes[idx]), self.max_area)
            self.params["im_depthmaps"] = jnp.asarray(cur)

    # ------------------------------------------------------------------ #
    # accessors
    # ------------------------------------------------------------------ #

    def get_focals(self, params=None):
        p = (params or self.params)["im_focals"]
        return jnp.exp(p / self.focal_break)  # (N, 1) or (N, 2) if fx_and_fy

    def get_known_focal_mask(self):
        return ~np.asarray(self.masks["im_focals"][:, 0]).astype(bool)

    def get_principal_points(self, params=None, consts=None):
        p = (params or self.params)["im_pp"]
        pp_base = (consts or self.consts)["pp_base"]
        return pp_base + 10 * p

    def get_intrinsics(self):
        focals = np.asarray(self.get_focals())
        pp = np.asarray(self.get_principal_points())
        K = np.zeros((self.n_imgs, 3, 3), np.float32)
        K[:, 0, 0] = focals[:, 0]
        K[:, 1, 1] = focals[:, -1]  # == fx when a single focal is stored
        K[:, :2, 2] = pp
        K[:, 2, 2] = 1
        return jnp.asarray(K)

    def get_im_poses(self, params=None):
        p = (params or self.params)["im_poses"]
        return pose_vec_to_matrix(p)

    def get_depthmaps(self, raw=False, params=None):
        d = jnp.exp((params or self.params)["im_depthmaps"])
        if raw:
            return d
        return [d[n, :h * w].reshape(h, w)
                for n, (h, w) in enumerate(self.imshapes)]

    def depth_to_pts3d(self, params=None, consts=None):
        return pco_depth_to_pts3d(self.loss_spec, params or self.params,
                                  self.consts if consts is None else consts)


# ---------------------------------------------------------------------- #
# the jitted optimization loop
# ---------------------------------------------------------------------- #

@functools.partial(jax.jit, static_argnums=(0, 1))
def _alignment_segment(pts3d_fn, spec, params, opt_state, masks, lrs,
                       consts):
    """Scan Adam(0.9, 0.9) over one segment of the LR schedule.

    Static args are (pts3d_fn, spec) - module-level function + hashable
    AlignerSpec - so scenes with the same configuration and shapes hit the
    jit cache instead of recompiling per instance. Frozen entries receive
    zero gradient via the masks (their Adam moments stay exactly zero).
    The stacked edge tensors are threaded through `consts` as jit
    arguments so they never become XLA program constants.
    """
    opt = optax.scale_by_adam(b1=0.9, b2=0.9)

    def step(carry, lr):
        params, opt_state = carry
        loss, grads = alignment_value_and_grad(pts3d_fn, spec, params,
                                               consts)
        grads = jax.tree.map(lambda g, m: g * m, grads, masks)
        updates, opt_state = opt.update(grads, opt_state)
        params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
        return (params, opt_state), loss

    (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), lrs)
    return params, opt_state, losses


_adam_init = jax.jit(optax.scale_by_adam(b1=0.9, b2=0.9).init)


def _run_alignment(pts3d_fn, spec, params, masks, lrs, consts, segment=100):
    """Run the whole Adam schedule as ceil(niter/segment) device scans.

    Segmenting bounds each device execution to ~segment iterations: on big
    scenes a single 300-iter program can run for minutes, which trips the
    remote-execution deadline of tunneled deployments (observed as a
    'TPU worker crashed' on 600-edge scenes); per-segment dispatch costs
    only ~ms. Adam moments and step count carry across segments, so the
    result is bit-identical to one long scan.
    """
    opt_state = _adam_init(params)
    losses = []
    for s in range(0, len(lrs), segment):
        params, opt_state, seg_losses = _alignment_segment(
            pts3d_fn, spec, params, opt_state, masks, lrs[s:s + segment],
            consts)
        losses.append(seg_losses)
    return params, jnp.concatenate(losses) if losses else jnp.zeros((0,))


def global_alignment_loop(scene, lr=0.01, niter=300, schedule="cosine",
                          lr_min=1e-6):
    """Run the full alignment on device; one compile, zero host round-trips.

    Matches reference global_alignment_loop defaults
    (base_opt.py:326-337). Returns the final loss (float).
    """
    any_trainable = any(bool(np.asarray(m).any()) for m in scene.masks.values())
    if not any_trainable:
        return float("nan")
    if scene.verbose:
        print("Global alignment - optimizing for:")
        print([k for k, m in scene.masks.items() if np.asarray(m).any()])

    lrs = make_lr_schedule(schedule, niter, lr, lr_min)
    params, losses = _run_alignment(scene.pts3d_fn, scene.loss_spec,
                                    dict(scene.params), dict(scene.masks),
                                    lrs, dict(scene.consts))
    scene.params = params  # stays on device
    scene.last_losses = np.asarray(losses)
    final = float(scene.loss_fn(scene.params))
    if scene.verbose:
        print(f" final loss = {final:g}")
    return final


class ModularPointCloudOptimizer(PointCloudOptimizer):
    """Preset-friendly variant (reference modular_optimizer.py:17-145).

    The TPU build's PointCloudOptimizer already supports per-image
    freezing via gradient masks, so this subclass only preserves the
    reference's preset semantics differences: presets don't require ALL
    images to be covered, and norm_pw_scale follows the known-pose count.
    fx != fy is supported via fx_and_fy=True (two focals per image).
    """

    def __init__(self, *args, optimize_pp=False, fx_and_fy=False,
                 focal_brake=20, **kwargs):
        super().__init__(*args, optimize_pp=optimize_pp,
                         focal_break=focal_brake, fx_and_fy=fx_and_fy,
                         **kwargs)

    def preset_intrinsics(self, known_intrinsics, msk=None):
        known_K = np.asarray(known_intrinsics)
        if known_K.ndim == 2:
            known_K = known_K[None]
        if self.n_focals == 2:
            self.preset_focal([K.diagonal()[:2] for K in known_K], msk)
        else:
            self.preset_focal([K.diagonal()[:2].mean() for K in known_K], msk)
        self.preset_principal_point([K[:2, 2] for K in known_K], msk)

    def preset_pose(self, known_poses, pose_msk=None):
        """Partial presets allowed; only the images actually assigned a
        pose are frozen (reference modular_optimizer.py:38-48 freezes
        per-tensor inside the zip)."""
        idxs = list(self._get_msk_indices(pose_msk))
        known_poses = np.asarray(known_poses)
        if known_poses.ndim == 2:
            known_poses = known_poses[None]
        idxs = idxs[:len(known_poses)]
        for idx, pose in zip(idxs, known_poses):
            if self.verbose:
                print(f" (setting pose #{idx} = {pose[:3, 3]})")
            self._set_pose("im_poses", idx, pose, force=True)
        self._freeze("im_poses", idxs)
        # cumulative over every preset call (reference counts
        # requires_grad=False over the whole ParameterList)
        n_known = int(self.n_imgs - np.asarray(
            self.masks["im_poses"]).any(axis=1).sum())
        self.norm_pw_scale = n_known <= 1

    def preset_focal(self, known_focals, msk=None):
        idxs = list(self._get_msk_indices(msk))[:len(known_focals)]
        for idx, focal in zip(idxs, known_focals):
            if self.verbose:
                print(f" (setting focal #{idx} = {focal})")
            self._set_focal(idx, focal, force=True)
        self._freeze("im_focals", idxs)

    def preset_principal_point(self, known_pp, msk=None):
        known_pp = np.asarray(known_pp).reshape(-1, 2)
        idxs = list(self._get_msk_indices(msk))[:len(known_pp)]
        for idx, pp in zip(idxs, known_pp):
            if self.verbose:
                print(f" (setting principal point #{idx} = {pp})")
            self._set_principal_point(idx, pp, force=True)
        self._freeze("im_pp", idxs)
