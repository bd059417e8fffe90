"""Training losses: confidence-weighted 3D regression + composable DSL.

Behavioral contract: /root/reference/dust3r/losses.py:34-299. JIT-safety
redesign: the reference selects valid pixels by boolean indexing (dynamic
shapes); here every loss is computed densely and reduced with masked means,
which is mathematically identical and XLA-friendly. Loss detail dicts carry
jnp scalars (convert to float outside jit).

The user-facing DSL is preserved:
    ConfLoss(Regr3D(L21, norm_mode='avg_dis'), alpha=0.2)
    Regr3D_ScaleShiftInv(L21, gt_scale=True)
    loss_a + 0.1 * loss_b
"""
from __future__ import annotations

import copy

import jax
import jax.numpy as jnp

from .inference import get_pred_pts3d
from .utils.geometry import (inv, geotrf, normalize_pointcloud, masked_mean,
                             get_joint_pointcloud_depth,
                             get_joint_pointcloud_center_scale)


class BaseCriterion:
    def __init__(self, reduction="mean"):
        self.reduction = reduction


class LLoss(BaseCriterion):
    """Pixelwise distance with selectable reduction.

    Called with dense tensors + a validity mask; 'mean' averages over valid
    pixels only, 'none' returns the dense per-pixel map.
    """

    def __call__(self, a, b, mask=None):
        dist = self.distance(a, b)
        if self.reduction == "none":
            return dist
        if mask is None:
            mask = jnp.ones(dist.shape, bool)
        if self.reduction == "sum":
            return jnp.sum(jnp.where(mask, dist, 0))
        if self.reduction == "mean":
            return masked_mean(dist, mask)
        raise ValueError(f"bad reduction {self.reduction}")

    def distance(self, a, b):
        raise NotImplementedError


class L21Loss(LLoss):
    """Euclidean distance between 3D points."""

    def distance(self, a, b):
        # grad-safe norm (see cloud_opt.commons.l1_dist)
        sq = jnp.sum(jnp.square(a - b), axis=-1)
        return jnp.sqrt(jnp.maximum(sq, 1e-16))

    def __repr__(self):
        return "L21Loss()"


L21 = L21Loss()


class MultiLoss:
    """Composable loss algebra: `MyLoss1() + 0.1 * MyLoss2()`.

    A composite is a FLAT list of (weight, leaf) terms (`_terms()`), built
    up by `*` and `+`; evaluation walks the terms left to right, summing
    weighted scalars and merging detail dicts. This supports exactly the
    expression grammar the reference CLI strings use
    (/root/reference/dust3r/losses.py:64-105) with a different internal
    representation: leaves subclass MultiLoss and implement
    compute_loss/get_name; composition never mutates a leaf.
    """

    def compute_loss(self, *args, **kw):
        raise NotImplementedError

    def get_name(self):
        raise NotImplementedError

    def _terms(self):
        """[(weight, leaf), ...] of this expression."""
        return [(1, self)]

    def __mul__(self, alpha):
        assert isinstance(alpha, (int, float))
        return _WeightedSum([(alpha * w, leaf) for w, leaf in self._terms()])

    __rmul__ = __mul__

    def __add__(self, other):
        assert isinstance(other, MultiLoss)
        return _WeightedSum(self._terms() + other._terms())

    def __repr__(self):
        return " + ".join(
            leaf.get_name() if w == 1 else f"{w:g}*{leaf.get_name()}"
            for w, leaf in self._terms())

    def __call__(self, *args, **kw):
        total = None
        details = {}
        for weight, leaf in self._terms():
            out = leaf.compute_loss(*args, **kw)
            if isinstance(out, tuple):
                value, d = out
            elif getattr(out, "ndim", 0) == 0:
                # detail dicts record the UNWEIGHTED leaf value
                value, d = out, {leaf.get_name(): out}
            else:
                value, d = out, {}
            if isinstance(value, tuple):
                # structured per-pixel output (reduction='none', e.g. a
                # ConfLoss pixel term): not summable - must be a lone term
                assert weight == 1 and len(self._terms()) == 1, \
                    "per-pixel losses cannot be weighted or summed"
                total = value
            else:
                term = weight * value
                total = term if total is None else total + term
            details.update(d)
        return total, details


class _WeightedSum(MultiLoss):
    """Internal composite node; never constructed by user code directly."""

    def __init__(self, terms):
        self.terms = list(terms)

    def _terms(self):
        return self.terms


class Criterion:
    def __init__(self, criterion=None):
        assert isinstance(criterion, BaseCriterion), \
            f"{criterion} is not a proper criterion!"
        self.criterion = copy.copy(criterion)

    def get_name(self):
        return f"{type(self).__name__}({self.criterion})"

    def with_reduction(self, mode="none"):
        """Copy of this (possibly composite) pixel loss with every leaf's
        reduction switched (ConfLoss needs dense per-pixel maps)."""
        res = copy.deepcopy(self)
        for _, leaf in res._terms():
            assert isinstance(leaf, Criterion)
            leaf.criterion.reduction = mode
        return res


class Regr3D(Criterion, MultiLoss):
    """Confidence-free 3D regression in view1's frame.

    Both GT pointmaps are mapped into camera1; predictions and GT are
    (optionally) normalized by mean distance-to-origin
    (reference losses.py:142-194).
    """

    def __init__(self, criterion, norm_mode="avg_dis", gt_scale=False):
        Criterion.__init__(self, criterion)
        MultiLoss.__init__(self)
        self.norm_mode = norm_mode
        self.gt_scale = gt_scale

    def get_all_pts3d(self, gt1, gt2, pred1, pred2, dist_clip=None):
        in_camera1 = inv(gt1["camera_pose"])
        gt_pts1 = geotrf(in_camera1, gt1["pts3d"])
        gt_pts2 = geotrf(in_camera1, gt2["pts3d"])

        valid1 = gt1["valid_mask"]
        valid2 = gt2["valid_mask"]
        if dist_clip is not None:
            dis1 = jnp.linalg.norm(gt_pts1, axis=-1)
            dis2 = jnp.linalg.norm(gt_pts2, axis=-1)
            valid1 = valid1 & (dis1 <= dist_clip)
            valid2 = valid2 & (dis2 <= dist_clip)

        pr_pts1 = get_pred_pts3d(gt1, pred1, use_pose=False)
        pr_pts2 = get_pred_pts3d(gt2, pred2, use_pose=True)

        if self.norm_mode:
            pr_pts1, pr_pts2 = normalize_pointcloud(
                pr_pts1, pr_pts2, self.norm_mode, valid1, valid2)
        if self.norm_mode and not self.gt_scale:
            gt_pts1, gt_pts2 = normalize_pointcloud(
                gt_pts1, gt_pts2, self.norm_mode, valid1, valid2)

        return gt_pts1, gt_pts2, pr_pts1, pr_pts2, valid1, valid2, {}

    def compute_loss(self, gt1, gt2, pred1, pred2, **kw):
        gt_pts1, gt_pts2, pred_pts1, pred_pts2, mask1, mask2, monitoring = \
            self.get_all_pts3d(gt1, gt2, pred1, pred2, **kw)
        l1 = self.criterion(pred_pts1, gt_pts1, mask1)
        l2 = self.criterion(pred_pts2, gt_pts2, mask2)
        name = type(self).__name__
        if self.criterion.reduction == "none":
            details = {name + "_pts3d_1": masked_mean(l1, mask1),
                       name + "_pts3d_2": masked_mean(l2, mask2)}
            return ((l1, mask1), (l2, mask2)), {**details, **monitoring}
        details = {name + "_pts3d_1": l1, name + "_pts3d_2": l2}
        return l1 + l2, {**details, **monitoring}


class ConfLoss(MultiLoss):
    """conf * err - alpha * log(conf): self-calibrating weighting
    (reference losses.py:197-238). Train default alpha = 0.2."""

    def __init__(self, pixel_loss, alpha=1):
        super().__init__()
        assert alpha > 0
        self.alpha = alpha
        self.pixel_loss = pixel_loss.with_reduction("none")

    def get_name(self):
        return f"ConfLoss({self.pixel_loss})"

    def compute_loss(self, gt1, gt2, pred1, pred2, **kw):
        ((loss1, msk1), (loss2, msk2)), details = \
            self.pixel_loss(gt1, gt2, pred1, pred2, **kw)

        conf1 = pred1["conf"]
        conf2 = pred2["conf"]
        conf_loss1 = loss1 * conf1 - self.alpha * jnp.log(conf1)
        conf_loss2 = loss2 * conf2 - self.alpha * jnp.log(conf2)

        # mean over valid pixels (0 if none - the reference's nan guard)
        conf_loss1 = masked_mean(conf_loss1, msk1)
        conf_loss2 = masked_mean(conf_loss2, msk2)

        return conf_loss1 + conf_loss2, {
            "conf_loss_1": conf_loss1, "conf_loss2": conf_loss2, **details}


class Regr3D_ShiftInv(Regr3D):
    """Regr3D invariant to a global depth shift (median-centered z)."""

    def get_all_pts3d(self, gt1, gt2, pred1, pred2):
        gt_pts1, gt_pts2, pred_pts1, pred_pts2, mask1, mask2, monitoring = \
            super().get_all_pts3d(gt1, gt2, pred1, pred2)

        gt_shift = get_joint_pointcloud_depth(
            gt_pts1[..., 2], gt_pts2[..., 2], mask1, mask2)[:, None, None]
        pred_shift = get_joint_pointcloud_depth(
            pred_pts1[..., 2], pred_pts2[..., 2], mask1, mask2)[:, None, None]

        gt_pts1 = gt_pts1.at[..., 2].add(-gt_shift)
        gt_pts2 = gt_pts2.at[..., 2].add(-gt_shift)
        pred_pts1 = pred_pts1.at[..., 2].add(-pred_shift)
        pred_pts2 = pred_pts2.at[..., 2].add(-pred_shift)
        return gt_pts1, gt_pts2, pred_pts1, pred_pts2, mask1, mask2, monitoring


class Regr3D_ScaleInv(Regr3D):
    """Regr3D with median-norm scale matching (reference losses.py:267-290).

    gt_scale=True rescales predictions to the GT scale (eval criterion)."""

    def get_all_pts3d(self, gt1, gt2, pred1, pred2):
        gt_pts1, gt_pts2, pred_pts1, pred_pts2, mask1, mask2, monitoring = \
            super().get_all_pts3d(gt1, gt2, pred1, pred2)

        _, gt_scale = get_joint_pointcloud_center_scale(
            gt_pts1, gt_pts2, mask1, mask2)
        _, pred_scale = get_joint_pointcloud_center_scale(
            pred_pts1, pred_pts2, mask1, mask2)
        pred_scale = jnp.clip(pred_scale, 1e-3, 1e3)  # both (B,1,1,1)

        if self.gt_scale:
            pred_pts1 = pred_pts1 * (gt_scale / pred_scale)
            pred_pts2 = pred_pts2 * (gt_scale / pred_scale)
        else:
            gt_pts1 = gt_pts1 / gt_scale
            gt_pts2 = gt_pts2 / gt_scale
            pred_pts1 = pred_pts1 / pred_scale
            pred_pts2 = pred_pts2 / pred_scale
        return gt_pts1, gt_pts2, pred_pts1, pred_pts2, mask1, mask2, monitoring


class Regr3D_ScaleShiftInv(Regr3D_ScaleInv, Regr3D_ShiftInv):
    """Shift-invariance applied first, then scale (reference MRO)."""
    pass
