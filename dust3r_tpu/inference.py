"""Pairwise inference engine.

Behavioral contract: /root/reference/dust3r/inference.py:32-78 (the
{view1, view2, pred1, pred2} output dict). TPU-native redesign:

  * each UNIQUE image is encoded exactly once per scene and its encoder
    tokens are reused across every pair it participates in - this strictly
    generalizes the reference's symmetrized-batch fast path
    (dust3r/model.py:162-166): for a complete symmetrized graph of N
    images the encoder does N forward passes instead of N*(N-1).
  * pairs are grouped by (shape1, shape2) bucket and padded to a fixed
    batch size, so each bucket compiles exactly one XLA program
    (no recompile storms across aspect ratios).
  * all batches run async on device; host sync happens once at the end.
"""
from __future__ import annotations

import functools
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np


def _pad_batch(arrs, bs):
    """Stack list of (H, W, C) arrays and pad batch dim up to bs."""
    x = np.stack(arrs, axis=0)
    if len(arrs) < bs:
        pad = np.repeat(x[-1:], bs - len(arrs), axis=0)
        x = np.concatenate([x, pad], axis=0)
    return x


class InferenceEngine:
    """Compiled two-view inference over a scene graph.

    model: AsymmetricCroCo3DStereo (module definition)
    params: its variables (as returned by model.init or the checkpoint
    converter)
    """

    def __init__(self, model, params, batch_size=8, mesh=None,
                 quantize=None):
        """mesh: optional jax.sharding.Mesh - data-parallel pair fan-out
        (SURVEY §5: sharding the PAIR axis across devices for inference).
        Params and stacked encoder features are replicated; each batch of
        pairs is split over all mesh devices through encoder, decoder and
        heads - XLA emits the (trivial) collectives. batch_size must be a
        multiple of the device count.

        quantize: None or 'int8' - converts the transformer gemms to the
        int8 serving mode (ops/quant.py) at construction. Skipped if the
        params are already quantized (int8 leaves present)."""
        if quantize is not None:
            if quantize != "int8":
                raise ValueError(f"unsupported quantize mode {quantize!r}")
            already = any(v.dtype == jnp.int8 for v in jax.tree.leaves(params))
            if not already:
                from .ops.quant import quantize_for_inference
                model, params = quantize_for_inference(model, params)
            elif not model.quant:
                model = model.clone(quant=True)
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            n_dev = int(np.prod(list(mesh.shape.values())))
            assert batch_size % n_dev == 0, \
                f"batch_size {batch_size} not divisible by {n_dev} devices"
            axes = tuple(mesh.axis_names)
            self._repl = NamedSharding(mesh, PartitionSpec())
            self._bshard = NamedSharding(mesh, PartitionSpec(axes))
            params = jax.device_put(params, self._repl)

            def bconstrain(x):
                return jax.lax.with_sharding_constraint(x, self._bshard)

            def rconstrain(x):
                return jax.lax.with_sharding_constraint(x, self._repl)
        else:
            def bconstrain(x):
                return x

            def rconstrain(x):
                return x
        self.params = params
        self.batch_size = batch_size

        # encoder runs batch-sharded; its (small) feature stack is
        # replicated on output so downstream pair gathers need no comms
        self._encode = jax.jit(
            lambda p, img: jax.tree.map(
                rconstrain, model.apply(p, bconstrain(img),
                                        method="encode")))

        @functools.partial(jax.jit, static_argnums=(7, 8))
        def _decode_head_gather(p, feats, pos, feats2, pos2, idx1, idx2,
                                shape1, shape2):
            """Gather the pair batch from stacked encoder features and run
            decoder + heads - ONE dispatch per batch (the gather happens
            on device, no host round-trips). With a mesh, the gathered
            batch is sharded over devices (feats are replicated, so the
            gather itself needs no communication)."""
            f1 = bconstrain(jnp.take(feats, idx1, axis=0))
            p1 = bconstrain(jnp.take(pos, idx1, axis=0))
            f2 = bconstrain(jnp.take(feats2, idx2, axis=0))
            p2 = bconstrain(jnp.take(pos2, idx2, axis=0))
            dec1, dec2 = model.apply(p, f1, p1, f2, p2, method="decode")
            res1 = model.apply(p, 1, dec1, shape1, method="head")
            res2 = model.apply(p, 2, dec2, shape2, method="head")
            res2["pts3d_in_other_view"] = res2.pop("pts3d")
            return res1, res2

        self._decode_head_gather = _decode_head_gather

    # ------------------------------------------------------------------ #

    def encode_views(self, views):
        """Encode unique view dicts once each.

        Returns ({id(view): (shape, slot)}, {shape: (feats, pos)}) with
        feats stacked (U, S, D) per shape bucket - downstream batches are
        gathered on device by slot index (no per-pair host round-trips).
        """
        unique = {}
        for v in views:
            unique.setdefault(id(v), v)

        by_shape = defaultdict(list)
        for key, v in unique.items():
            img = v["img"]
            assert img.ndim == 4 and img.shape[0] == 1, "views hold (1,H,W,3)"
            by_shape[tuple(img.shape[1:3])].append(key)

        slots = {}
        stacked = {}
        for shape, keys in by_shape.items():
            chunks_f, chunks_p = [], []
            for i in range(0, len(keys), self.batch_size):
                chunk = keys[i:i + self.batch_size]
                arrs = [unique[k]["img"] for k in chunk]
                if any(isinstance(a, np.ndarray) for a in arrs):
                    imgs = jnp.asarray(_pad_batch(
                        [np.asarray(a)[0] for a in arrs], self.batch_size))
                else:
                    # images already on device: stack/pad there (no host
                    # round-trip)
                    imgs = jnp.concatenate(arrs + [arrs[-1]] *
                                           (self.batch_size - len(arrs)))
                f, pos = self._encode(self.params, imgs)
                chunks_f.append(f[:len(chunk)])
                chunks_p.append(pos[:len(chunk)])
                for n, k in enumerate(chunk):
                    slots[k] = (shape, i + n)
            stacked[shape] = (jnp.concatenate(chunks_f),
                              jnp.concatenate(chunks_p))
        return slots, stacked

    def infer_pairs(self, pairs, verbose=False, to_cpu=True):
        """Run the two-view model over a list of (view1, view2) dict pairs.

        Returns the reference-format output dict; predictions are numpy
        when to_cpu (the reference contract, inference.py:68) or stay on
        device when to_cpu=False (zero-copy hand-off to the aligner).
        """
        views = [v for pair in pairs for v in pair]
        slots, stacked = self.encode_views(views)

        # group pair indices by (shape1, shape2)
        by_bucket = defaultdict(list)
        for n, (v1, v2) in enumerate(pairs):
            s1 = tuple(v1["img"].shape[1:3])
            s2 = tuple(v2["img"].shape[1:3])
            by_bucket[(s1, s2)].append(n)

        # per bucket: batched decode+head, results concatenated ONCE on
        # device; no per-pair device slicing (each tiny slice would be a
        # separate dispatch)
        pred1 = [None] * len(pairs)
        pred2 = [None] * len(pairs)
        bs = self.batch_size
        for (s1, s2), idxs in by_bucket.items():
            feats1, pos1 = stacked[s1]
            feats2, pos2 = stacked[s2]
            parts1, parts2 = [], []
            for i in range(0, len(idxs), bs):
                chunk = idxs[i:i + bs]
                slot1 = [slots[id(pairs[n][0])][1] for n in chunk]
                slot2 = [slots[id(pairs[n][1])][1] for n in chunk]
                pad = bs - len(chunk)
                if pad:
                    slot1 = slot1 + slot1[-1:] * pad
                    slot2 = slot2 + slot2[-1:] * pad
                # numpy index arrays go straight in as jit arguments -
                # no separate transfer dispatch
                r1, r2 = self._decode_head_gather(
                    self.params, feats1, pos1, feats2, pos2,
                    np.asarray(slot1, np.int32),
                    np.asarray(slot2, np.int32), s1, s2)
                parts1.append(r1)
                parts2.append(r2)

            # concatenate once per bucket and trim the final pad
            total = len(idxs)
            bucket1 = {k: jnp.concatenate([p[k] for p in parts1])[:total]
                       for k in parts1[0]}
            bucket2 = {k: jnp.concatenate([p[k] for p in parts2])[:total]
                       for k in parts2[0]}
            if to_cpu:
                bucket1, bucket2 = jax.device_get((bucket1, bucket2))

            if len(by_bucket) == 1:
                # uniform shapes: bucket order == pair order, hand the
                # stacked arrays straight to the output (zero re-slicing)
                return dict(
                    view1=_collate_views([p[0] for p in pairs], False,
                                         numpy=to_cpu),
                    view2=_collate_views([p[1] for p in pairs], False,
                                         numpy=to_cpu),
                    pred1=bucket1, pred2=bucket2)

            for m, n in enumerate(idxs):
                pred1[n] = {k: v[m] for k, v in bucket1.items()}
                pred2[n] = {k: v[m] for k, v in bucket2.items()}

        return collate_inference_output(pairs, pred1, pred2, True,
                                        numpy=to_cpu)


def _collate_views(views, multiple_shapes, numpy=True):
    out = {}
    keys = views[0].keys()
    for k in keys:
        vals = [v[k] for v in views]
        if k == "img":
            if not numpy:
                # keep device arrays (display conversion happens lazily in
                # the aligner, once) - avoids a device->host copy per call
                out[k] = [v[0] for v in vals]
            else:
                vals = [np.asarray(v)[0] for v in vals]
                out[k] = vals if multiple_shapes else np.stack(vals)
        elif k == "true_shape":
            out[k] = np.concatenate([np.asarray(v) for v in vals])
        else:
            out[k] = list(vals)
    return out


def collate_inference_output(pairs, pred1, pred2, multiple_shapes,
                             numpy=True):
    """Build the reference-format result dict.

    Uniform shapes: stacked arrays. Mixed shapes: python lists (matching
    reference inference.py:70 `lists=multiple_shapes`). numpy=False keeps
    device arrays (stacked with jnp).
    """
    xp = np if numpy else jnp

    def collate_preds(preds):
        out = {}
        for k in preds[0].keys():
            vals = [(np.asarray(p[k]) if numpy else p[k]) for p in preds]
            out[k] = vals if multiple_shapes else xp.stack(vals)
        return out

    return dict(
        view1=_collate_views([p[0] for p in pairs], multiple_shapes,
                             numpy=numpy),
        view2=_collate_views([p[1] for p in pairs], multiple_shapes,
                             numpy=numpy),
        pred1=collate_preds(pred1),
        pred2=collate_preds(pred2),
    )


def inference(pairs, model, params=None, batch_size=8, verbose=True):
    """Reference-compatible entry point (inference.py:55-72).

    model: either an InferenceEngine or a module definition (then params
    must be given).
    """
    if verbose:
        print(f">> Inference with model on {len(pairs)} image pairs")
    engine = model if hasattr(model, "infer_pairs") else \
        InferenceEngine(model, params, batch_size)
    return engine.infer_pairs(pairs, verbose=verbose)


# ------------------------------------------------------------------ #
# prediction decoding helpers (reference inference.py:81-150)
# ------------------------------------------------------------------ #

def get_pred_pts3d(gt, pred, use_pose=False):
    from .utils.geometry import depthmap_to_pts3d, geotrf

    if "depth" in pred and "pseudo_focal" in pred:
        pp = gt["camera_intrinsics"][..., :2, 2] if "camera_intrinsics" in gt else None
        pts3d = depthmap_to_pts3d(pred["depth"], pred["pseudo_focal"], pp=pp)
    elif "pts3d" in pred:
        pts3d = pred["pts3d"]
    elif "pts3d_in_other_view" in pred:
        assert use_pose is True
        return pred["pts3d_in_other_view"]

    if use_pose:
        camera_pose = pred.get("camera_pose")
        assert camera_pose is not None
        pts3d = geotrf(camera_pose, pts3d)
    return pts3d


def find_opt_scaling(gt_pts1, gt_pts2, pr_pts1, pr_pts2=None,
                     fit_mode="weiszfeld_stop_grad", valid1=None, valid2=None):
    """Optimal per-sample scaling aligning GT onto predictions.

    Masked-JAX reimplementation of reference find_opt_scaling
    (inference.py:106-150); invalid pixels are excluded via masks instead
    of NaNs.
    """
    from .utils.geometry import masked_mean, masked_median

    assert gt_pts1.ndim == pr_pts1.ndim == 4

    def flat(x):
        return x.reshape(x.shape[0], -1, 3) if x is not None else None

    def flatm(m, like):
        if m is None:
            return jnp.ones(like.shape[:-1], bool).reshape(like.shape[0], -1)
        return m.reshape(m.shape[0], -1)

    gt1, pr1 = flat(gt_pts1), flat(pr_pts1)
    m1 = flatm(valid1, gt_pts1)
    if gt_pts2 is not None:
        gt2, pr2 = flat(gt_pts2), flat(pr_pts2)
        m2 = flatm(valid2, gt_pts2)
        all_gt = jnp.concatenate([gt1, gt2], axis=1)
        all_pr = jnp.concatenate([pr1, pr2], axis=1)
        mask = jnp.concatenate([m1, m2], axis=1)
    else:
        all_gt, all_pr, mask = gt1, pr1, m1

    dot_gt_pr = jnp.sum(all_pr * all_gt, axis=-1)
    dot_gt_gt = jnp.sum(all_gt * all_gt, axis=-1)

    if fit_mode.startswith("avg"):
        scaling = masked_mean(dot_gt_pr, mask, axis=1) / \
            masked_mean(dot_gt_gt, mask, axis=1)
    elif fit_mode.startswith("median"):
        scaling = masked_median(dot_gt_pr / jnp.clip(dot_gt_gt, 1e-12), mask, axis=1)
    elif fit_mode.startswith("weiszfeld"):
        scaling = masked_mean(dot_gt_pr, mask, axis=1) / \
            masked_mean(dot_gt_gt, mask, axis=1)

        def body(_, scaling):
            dis = jnp.linalg.norm(all_pr - scaling[:, None, None] * all_gt, axis=-1)
            w = 1.0 / jnp.clip(dis, 1e-8)
            return masked_mean(w * dot_gt_pr, mask, axis=1) / \
                masked_mean(w * dot_gt_gt, mask, axis=1)

        scaling = jax.lax.fori_loop(0, 10, body, scaling)
    else:
        raise ValueError(f"bad fit_mode {fit_mode}")

    if fit_mode.endswith("stop_grad"):
        scaling = jax.lax.stop_gradient(scaling)
    return jnp.clip(scaling, 1e-3)
