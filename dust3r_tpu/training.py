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

from .parallel.mesh import (make_mesh, batch_sharding, batch_constraint,
                            param_shardings, replicated, shard_batch)


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
    freeze: str = "none"      # 'none' | 'mask' | 'encoder' (model.py:100-107)
    clip_grad: float = 0.0    # >0: clip gradients to this global norm
    # Non-finite gradients SKIP the update (params/opt state kept) instead of
    # poisoning Adam moments - the TPU-native analogue of the reference AMP
    # GradScaler's inf-step skipping (croco NativeScalerWithGradNormCount);
    # the non-finite-loss hard abort (reference training.py:303-305) still
    # applies on the host side via check_finite_or_die.


def wd_mask(params):
    """timm rule (reference get_parameter_groups): no weight decay for
    biases and norm scales - i.e. decay only matrices/conv kernels."""
    return jax.tree.map(lambda p: p.ndim > 1, params)


def make_optimizer(spec: TrainSpec):
    """AdamW with injectable LR (set per-iteration, reference :294-295)."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=0.0, b1=spec.betas[0], b2=spec.betas[1],
        weight_decay=spec.weight_decay, mask=wd_mask)


def init_train_state(params, spec: TrainSpec):
    opt = make_optimizer(spec)
    return dict(params=params, opt_state=opt.init(params),
                step=jnp.zeros((), jnp.int32))


def _ensure_gt_pts3d(view):
    """Rebuild gt pointmaps on device for views shipped depth-only.

    _host_view drops the (B,H,W,3) gt pts3d from the host->device
    transfer when depth+K+pose are present; the criterion needs pts3d,
    so lift it here inside the jitted step (exact same f32 math as the
    loader's host path, utils/geometry.py:depth_to_world_pts3d).
    """
    if "pts3d" in view or "depthmap" not in view:
        return view
    from .utils.geometry import depth_to_world_pts3d
    pts3d = depth_to_world_pts3d(view["depthmap"],
                                 view["camera_intrinsics"],
                                 view["camera_pose"])
    return dict(view, pts3d=pts3d)


def loss_of_one_batch(model, params, criterion, batch, symmetrized=False):
    """Forward + criterion for one batch of paired views.

    batch: (view1, view2) dicts with jnp arrays:
      img (B,H,W,3), pts3d (B,H,W,3), valid_mask (B,H,W),
      camera_pose (B,4,4) [, camera_intrinsics].
    Mirrors reference loss_of_one_batch (inference.py:32-52). The batch
    interleaving itself happens upstream (make_batch_symmetric);
    `symmetrized=True` additionally tells the model the layout so it can
    take the half-encoder fast path.
    """
    view1, view2 = batch
    if criterion is not None:
        view1 = _ensure_gt_pts3d(view1)
        view2 = _ensure_gt_pts3d(view2)
    # ManyAR batches carry per-sample portrait flags (host adds the key
    # only when a batch actually contains portrait-stored samples, so
    # the all-landscape program never pays the double head pass).
    # symmetrized=True engages the reference's fast path (model.py:162-166):
    # the batch is (I,J),(J,I)-interleaved by make_batch_symmetric, so only
    # view1 is encoded and view2's features are a pair-swap - half the
    # encoder cost of the training forward AND backward.
    pred1, pred2 = model.apply(params, view1["img"], view2["img"],
                               is_portrait1=view1.get("is_portrait"),
                               is_portrait2=view2.get("is_portrait"),
                               symmetrized=symmetrized)
    if criterion is None:
        return None, (pred1, pred2)
    loss, details = criterion(view1, view2, pred1, pred2)
    return (loss, details), (pred1, pred2)


def build_train_step(model, criterion, spec: TrainSpec, mesh=None,
                     symmetrized=False):
    """Create the jitted (optionally mesh-sharded) training step.

    Returns step_fn(state, batch, epoch_f) -> (state, metrics). With a mesh,
    sharding constraints pin the params to param_shardings and the batch
    axis to 'data'; XLA emits the gradient all-reduce (replacing DDP,
    SURVEY.md §2.9). Gradient accumulation runs as a lax.scan over
    `accum_iter` micro-batches (batch leading dim = accum_iter; use
    stack_accum_batches to assemble it from loader batches).
    """
    opt = make_optimizer(spec)
    from .utils.misc import freeze_mask

    def loss_fn(params, micro_batch):
        (loss, details), _ = loss_of_one_batch(model, params, criterion,
                                               micro_batch,
                                               symmetrized=symmetrized)
        return loss, details

    def step_fn(state, batch, epoch_f):
        params = state["params"]
        if mesh is not None:
            batch = batch_constraint(mesh, batch,
                                     batch_axis=1 if spec.accum_iter > 1
                                     else 0)
            params = jax.tree.map(jax.lax.with_sharding_constraint, params,
                                  param_shardings(mesh, params))

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

        if spec.freeze != "none":
            fmask = freeze_mask(params, spec.freeze)
            grads = jax.tree.map(lambda g, m: g * m, grads, fmask)

        grad_norm = optax.global_norm(grads)
        if spec.clip_grad > 0:
            factor = jnp.minimum(1.0, spec.clip_grad /
                                 jnp.maximum(grad_norm, 1e-12))
            grads = jax.tree.map(lambda g: g * factor, grads)

        lr = cosine_warmup_lr(epoch_f, spec.lr, spec.min_lr,
                              spec.warmup_epochs, spec.epochs)
        opt_state = state["opt_state"]
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        # skip non-finite updates (see TrainSpec docstring)
        finite = jnp.isfinite(grad_norm) & jnp.isfinite(loss)
        params = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_params, params)
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old)
            if hasattr(new, "shape") else new,
            opt_state, state["opt_state"])

        new_state = dict(params=params, opt_state=opt_state,
                         step=state["step"] + 1)
        metrics = dict(loss=loss, lr=lr, grad_norm=grad_norm,
                       skipped=(~finite).astype(jnp.float32), **details)
        # every scalar also rides in ONE packed f32 vector: fetching the
        # dict is a device round trip PER LEAF (8+ tunnel round trips a
        # step); the loop fetches metrics["_packed"] in a single pull
        # (name order captured at trace time via `packed_names`)
        if not packed_names:
            packed_names.extend(k for k in sorted(metrics)
                                if jnp.ndim(metrics[k]) == 0)
        metrics["_packed"] = jnp.stack(
            [metrics[k].astype(jnp.float32) for k in packed_names])
        return new_state, metrics

    # donate the input state: params + Adam moments of the 0.6B model are
    # ~7GB fp32; donation lets XLA update them in place instead of
    # double-buffering. Sharded inputs keep their placement automatically.
    packed_names = []
    fn = jax.jit(step_fn, donate_argnums=(0,))
    fn.packed_names = packed_names
    return fn


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

    def synchronize_between_processes(self):
        """Merge this meter across JAX processes (croco SmoothedValue
        parity, reference training.py:336): count/total are summed and the
        windows are pooled so window median/avg are also global (the
        reference only syncs count/total; pooling makes checkpoint-best's
        loss_med rank-independent). No-op single-process."""
        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        ct = multihost_utils.process_allgather(
            np.asarray([self.count, self.total], np.float64))
        self.count = int(ct[:, 0].sum())
        self.total = float(ct[:, 1].sum())
        lens = multihost_utils.process_allgather(
            np.asarray(len(self.window), np.int64))
        m = int(np.max(lens))
        if m == 0:
            return
        buf = np.full(m, np.nan)
        buf[:len(self.window)] = self.window
        pooled = multihost_utils.process_allgather(buf).ravel()
        pooled = pooled[~np.isnan(pooled)]
        self.window = list(pooled[-self.window_size:])

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, value=self.value)


class MetricLogger:
    def __init__(self, delimiter="  ", window_size=20):
        self.meters = {}
        self.delimiter = delimiter
        self.window_size = window_size

    def update(self, **kwargs):
        for k, v in kwargs.items():
            if v is None:
                continue
            v = float(v)
            self.meters.setdefault(
                k, SmoothedValue(self.window_size)).update(v)

    def __getattr__(self, attr):
        meters = object.__getattribute__(self, "meters")
        if attr in meters:
            return meters[attr]
        raise AttributeError(attr)

    def synchronize_between_processes(self):
        """Sync all meters across processes (croco MetricLogger parity)."""
        for meter in self.meters.values():
            meter.synchronize_between_processes()

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


# ---------------------------------------------------------------------- #
# full training orchestration (reference training.py:92-377)
# ---------------------------------------------------------------------- #

def make_batch_symmetric(view1, view2):
    """Interleave (v1, v2) into ((v1, v2), (v2, v1)) pairs - doubles the
    batch (reference inference.py:14-29)."""
    def interleave(a, b):
        if isinstance(a, np.ndarray) or hasattr(a, "shape"):
            a, b = np.asarray(a), np.asarray(b)
            out = np.empty((2 * len(a),) + a.shape[1:], a.dtype)
            out[0::2], out[1::2] = a, b
            return out
        return [x for pair in zip(a, b) for x in pair]

    new1 = {k: interleave(view1[k], view2[k]) for k in view1}
    new2 = {k: interleave(view2[k], view1[k]) for k in view2}
    return new1, new2


_DEVICE_KEYS = ("img", "pts3d", "depthmap", "valid_mask", "camera_pose",
                "camera_intrinsics", "is_portrait")


def add_manyar_flags(view1, view2, force=False):
    """Attach per-sample `is_portrait` flags to BOTH views when either
    contains a portrait-stored sample (true_shape height > width).

    Key presence is the static signal selecting the ManyAR model program
    (double head pass + per-sample orientation, reference
    dust3r/utils/misc.py:54-100); all-landscape batches keep the plain
    program. Flags are added to both views or neither so the jit-traced
    batch structure stays consistent. force=True adds all-False flags
    even to all-landscape batches (used to keep the accum-scan batch
    structure uniform when a sibling micro-batch got flags).
    """
    flags = []
    for v in (view1, view2):
        if v.get("true_shape") is None:
            return view1, view2
        ts = np.asarray(v["true_shape"])
        if ts.ndim != 2:
            return view1, view2
        flags.append(ts[:, 0] > ts[:, 1])
    if force or any(f.any() for f in flags):
        view1 = dict(view1, is_portrait=flags[0])
        view2 = dict(view2, is_portrait=flags[1])
    return view1, view2


def _host_view(view, img_dtype=None):
    """Select and prepare the arrays a training/eval step actually ships.

    Transfer-size discipline (the host->device link is the axon tunnel
    here and PCIe in production; either way it's the scarce resource,
    CLAUDE.md tunnel rules):
    - gt pts3d (B,H,W,3 f32) is DROPPED whenever depth+K+pose are in the
      view - the step rebuilds it in-graph (_ensure_gt_pts3d), shipping
      one depth plane instead of three coordinate planes.
    - img is cast to `img_dtype` (bf16 under the amp policy) on the
      host: the model's first act is the cast to its compute dtype, so
      rounding before the wire halves the biggest transfer for free.
    """
    gt_from_depth = all(k in view for k in
                        ("depthmap", "camera_intrinsics", "camera_pose"))
    out = {}
    for k in _DEVICE_KEYS:
        if k not in view:
            continue
        if k == "pts3d" and gt_from_depth:
            continue
        if k == "depthmap" and not gt_from_depth:
            continue
        a = np.ascontiguousarray(view[k])
        if k == "img" and img_dtype is not None:
            a = a.astype(img_dtype)
        out[k] = a
    return out


def _batch_to_device(view, img_dtype=None):
    return {k: jnp.asarray(v)
            for k, v in _host_view(view, img_dtype).items()}


def stack_accum_batches(batches, img_dtype=None):
    """Stack `accum_iter` loader batches [(view1, view2), ...] into the
    (accum_iter, B, ...) layout build_train_step's lax.scan expects."""
    if len(batches) == 1:
        return (_batch_to_device(batches[0][0], img_dtype),
                _batch_to_device(batches[0][1], img_dtype))

    def stack(dicts):
        hosts = [_host_view(d, img_dtype) for d in dicts]
        return {k: jnp.asarray(np.stack([h[k] for h in hosts]))
                for k in hosts[0]}

    return (stack([v1 for v1, _ in batches]),
            stack([v2 for _, v2 in batches]))


def build_criterion(criterion_str):
    """Evaluate the criterion DSL in a restricted namespace."""
    from . import losses as L

    ns = {"__builtins__": {}}
    for name in ("L21", "Regr3D", "ConfLoss", "Regr3D_ShiftInv",
                 "Regr3D_ScaleInv", "Regr3D_ScaleShiftInv"):
        ns[name] = getattr(L, name)
    ns["inf"] = math.inf
    return eval(criterion_str, ns)  # noqa: S307 - restricted namespace


def build_model(model_str, dtype=None, attn_impl=None, scan_layers=None,
                remat=None, remat_policy=None):
    """Evaluate the model DSL string into a flax module definition."""
    from .checkpoint import model_from_arch_string

    overrides = {}
    if dtype is not None:
        overrides["dtype"] = dtype
    if attn_impl is not None:
        overrides["attn_impl"] = attn_impl
    if scan_layers is not None:
        overrides["scan_layers"] = scan_layers
    if remat is not None:
        overrides["remat"] = remat
    if remat_policy is not None:
        overrides["remat_policy"] = remat_policy
    return model_from_arch_string(model_str, landscape_only=True, **overrides)


def parse_mesh_arg(mesh_arg):
    """'8' | '4,2' | '2,2,2' -> (n_data, n_fsdp, n_model); 'auto' -> all
    visible devices on the data axis. Returns None for empty/unset."""
    if not mesh_arg:
        return None
    if mesh_arg == "auto":
        return (jax.device_count(), 1, 1)
    dims = [int(x) for x in str(mesh_arg).split(",")]
    dims += [1] * (3 - len(dims))
    return tuple(dims[:3])


def train(args):
    """Full training job: datasets, model, epochs, eval, checkpoints.

    args: argparse.Namespace from train.py's get_args_parser().
    Multi-chip: `--mesh data[,fsdp[,model]]` builds a jax.sharding.Mesh and
    shards params/batches over it (DDP/FSDP/TP equivalent of reference
    training.py:152-155); multi-host runs call jax.distributed.initialize
    via env vars (parallel/distributed.py) before building the mesh.
    """
    import json as _json
    from .datasets import get_data_loader
    from .checkpoint import save_checkpoint, load_checkpoint
    from .parallel.distributed import init_distributed_mode, get_rank, \
        get_world_size
    from .parallel.mesh import make_mesh, shard_params

    os.makedirs(args.output_dir, exist_ok=True)
    init_distributed_mode()  # no-op unless JAX_COORDINATOR_ADDRESS is set
    n_procs = get_world_size()  # JAX processes (hosts), not devices
    rank = get_rank()

    mesh = None
    mesh_dims = parse_mesh_arg(getattr(args, "mesh", ""))
    if mesh_dims is not None:
        n_data, n_fsdp, n_model = mesh_dims
        mesh = make_mesh(n_data=n_data, n_fsdp=n_fsdp, n_model=n_model)
        print(f"mesh: data={n_data} fsdp={n_fsdp} model={n_model}")
    n_data = mesh.shape["data"] if mesh is not None else 1

    print("output_dir: " + args.output_dir)
    np.random.seed(args.seed + rank)

    # args.batch_size is per data-parallel shard (reference: per GPU); each
    # process loads the batch for its local share of the data axis.
    assert n_data % n_procs == 0, (n_data, n_procs)
    loader_bs = args.batch_size * (n_data // n_procs)

    print(f"Building train dataset {args.train_dataset}")
    loader_train = get_data_loader(args.train_dataset,
                                   batch_size=loader_bs,
                                   num_workers=args.num_workers,
                                   world_size=n_procs, rank=rank)
    loaders_test = {}
    if args.test_dataset and args.test_dataset != "[None]":
        for dataset in args.test_dataset.split("+"):
            name = dataset.split("(")[0].strip()
            loaders_test[name] = get_data_loader(
                dataset, batch_size=loader_bs,
                num_workers=args.num_workers, shuffle=False, drop_last=False)

    print(f"Loading model: {args.model}")
    dtype = jnp.bfloat16 if args.amp else jnp.float32
    remat_policy = getattr(args, "remat_policy", "full")
    model = build_model(args.model, dtype=dtype,
                        scan_layers=bool(getattr(args, "scan_layers", 0))
                        or None,
                        remat=bool(getattr(args, "remat", 0)) or None,
                        remat_policy=None if remat_policy == "full"
                        else remat_policy)
    train_criterion = build_criterion(args.train_criterion)
    test_criterion = build_criterion(args.test_criterion
                                     or args.train_criterion)

    # reference lr rule: blr * eff_bs / 256, eff_bs over all data-parallel
    # shards (reference training.py:144-147, world_size = #GPUs = n_data)
    eff_batch_size = args.batch_size * args.accum_iter * n_data
    if args.lr is None:
        args.lr = args.blr * eff_batch_size / 256
    print(f"actual lr: {args.lr:.2e}  effective batch size: {eff_batch_size}")

    spec = TrainSpec(lr=args.lr, min_lr=args.min_lr,
                     warmup_epochs=args.warmup_epochs, epochs=args.epochs,
                     weight_decay=args.weight_decay,
                     accum_iter=args.accum_iter, amp=bool(args.amp))

    # init params (on a probe batch shape; batch dims don't matter). Init in
    # loop layout so torch checkpoints overlay by name, stack for scan mode.
    from .checkpoint import stack_scan_params, warm_start_params
    H, W = 64, 64
    probe = jnp.zeros((1, H, W, 3), jnp.float32)
    loop_model = model.clone(scan_layers=False) if model.scan_layers \
        else model
    params = jax.jit(loop_model.init)(jax.random.PRNGKey(args.seed),
                                      probe, probe)

    if args.pretrained:
        # arch comes from --model; the checkpoint may be a full DUSt3R .pth
        # or backbone-only (CroCo-V2) - missing parts stay at init
        print("Loading pretrained:", args.pretrained)
        params = warm_start_params(args.pretrained, model, params,
                                   verbose=True)
    elif model.scan_layers:
        params = stack_scan_params(params, model.enc_depth, model.dec_depth)

    if mesh is not None:
        params = shard_params(mesh, params)
    state = init_train_state(params, spec)
    start_epoch = 0
    best_so_far = float("inf")

    # auto-resume
    last_ckpt = os.path.join(args.output_dir, "checkpoint-last")
    if os.path.isdir(last_ckpt):
        print("auto-resuming from", last_ckpt)
        state, meta = load_checkpoint(last_ckpt, target=jax.device_get(state))
        if meta:
            start_epoch = meta.get("epoch", -1) + 1
            best_so_far = meta.get("best_so_far", float("inf"))

    step_fn = build_train_step(model, train_criterion, spec, mesh=mesh,
                               symmetrized=True)

    # TensorBoard scalars under the reference's epoch_1000x x-axis
    # (training.py:186,321-333); gated optional dep.
    log_writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        log_writer = SummaryWriter(log_dir=args.output_dir)
    except Exception:
        pass

    def save_model(epoch, fname, best):
        path = os.path.join(args.output_dir, f"checkpoint-{fname}")
        save_checkpoint(path, state,
                        metadata=dict(arch=args.model, epoch=epoch,
                                      best_so_far=best))

    def write_log_stats(epoch, train_stats, test_stats):
        log_stats = dict(epoch=epoch,
                         **{f"train_{k}": v for k, v in train_stats.items()})
        for name, stats in test_stats.items():
            log_stats.update({f"{name}_{k}": v for k, v in stats.items()})
        with open(os.path.join(args.output_dir, "log.txt"), "a") as f:
            f.write(_json.dumps(log_stats) + "\n")

    print(f"Start training for {args.epochs} epochs")
    train_stats = {}
    test_stats = {}
    t_start = time.time()
    for epoch in range(start_epoch, args.epochs + 1):
        if epoch > start_epoch:
            if args.save_freq and (epoch % args.save_freq == 0
                                   or epoch == args.epochs):
                save_model(epoch - 1, "last", best_so_far)

        new_best = False
        if epoch > 0 and args.eval_freq > 0 and epoch % args.eval_freq == 0:
            test_stats = {}
            for name, loader in loaders_test.items():
                stats = test_one_epoch(model, state["params"], test_criterion,
                                       loader, epoch,
                                       print_freq=args.print_freq,
                                       prefix=name, mesh=mesh,
                                       img_dtype=jnp.bfloat16 if spec.amp
                                       else None)
                test_stats[name] = stats
                if stats["loss_med"] < best_so_far:
                    best_so_far = stats["loss_med"]
                    new_best = True

        write_log_stats(epoch, train_stats, test_stats)

        if epoch > start_epoch:
            if args.keep_freq and epoch % args.keep_freq == 0:
                save_model(epoch - 1, str(epoch), best_so_far)
            if new_best:
                save_model(epoch - 1, "best", best_so_far)
        if epoch >= args.epochs:
            break

        state, train_stats = train_one_epoch(
            model, state, step_fn, loader_train, epoch, spec,
            print_freq=args.print_freq, log_writer=log_writer, mesh=mesh)

    print(f"Training time {time.time() - t_start:.0f}s")
    save_model(args.epochs, "final", best_so_far)
    return state


def _grouped(iterable, n):
    """Yield lists of n consecutive items, dropping any short tail
    (reference accum semantics: a partial accumulation group is skipped)."""
    group = []
    for item in iterable:
        group.append(item)
        if len(group) == n:
            yield group
            group = []


def train_one_epoch(model, state, step_fn, data_loader, epoch, spec,
                    print_freq=20, log_writer=None, mesh=None):
    from .parallel.distributed import all_reduce_mean

    metric_logger = MetricLogger()
    header = f"Epoch: [{epoch}]"
    data_loader.set_epoch(epoch)
    n_iters = len(data_loader)  # loader batches (= optimizer steps x accum)
    accum = spec.accum_iter

    img_dtype = jnp.bfloat16 if getattr(spec, "amp", True) else None
    packed_names = getattr(step_fn, "packed_names", None)

    def flush(pending):
        """Pull ONE packed metrics vector and do the host-side logging.

        Deliberately one optimizer step behind the dispatch: by the time
        this blocks on step i's scalars, step i+1 is already enqueued on
        the device and its batch upload has happened - the tunnel round
        trip hides behind compute. The non-finite abort therefore lags
        one step; the in-graph skip (build_train_step) still protects
        params/opt state on the very step.
        """
        i, epoch_f, metrics = pending
        if packed_names:
            vals = np.asarray(metrics["_packed"])
            host_metrics = dict(zip(packed_names, map(float, vals)))
        else:  # step fns without a packed vector (older/test doubles)
            host_metrics = {k: float(v) for k, v in metrics.items()
                            if not k.startswith("_") and np.ndim(v) == 0}
        check_finite_or_die(host_metrics["loss"])
        # cross-process mean for logging (reference training.py:322)
        loss_value_reduce = all_reduce_mean(host_metrics["loss"])
        metric_logger.update(epoch=epoch_f, **host_metrics)
        if log_writer is not None and print_freq and i % print_freq == 0:
            epoch_1000x = int(epoch_f * 1000)
            log_writer.add_scalar("train_loss", loss_value_reduce,
                                  epoch_1000x)
            log_writer.add_scalar("train_lr", host_metrics.get("lr", 0.0),
                                  epoch_1000x)
            for name, val in host_metrics.items():
                if name not in ("loss", "lr", "epoch"):
                    log_writer.add_scalar("train_" + name, val, epoch_1000x)

    pending = None
    groups = _grouped(iter(data_loader), accum)
    for i, group in metric_logger.log_every(groups, print_freq, header):
        epoch_f = epoch + (i * accum) / max(n_iters, 1)
        sym = [add_manyar_flags(*make_batch_symmetric(v1, v2))
               for v1, v2 in group]
        if any("is_portrait" in v1 for v1, _ in sym):
            # batch structure must be uniform across the accum scan: if
            # any micro-batch got ManyAR flags, give all of them flags
            sym = [add_manyar_flags(v1, v2, force=True)
                   if "is_portrait" not in v1 else (v1, v2)
                   for v1, v2 in sym]
        dev_batch = stack_accum_batches(sym, img_dtype)
        if mesh is not None:
            dev_batch = shard_batch(mesh, dev_batch,
                                    batch_axis=1 if accum > 1 else 0)
        state, metrics = step_fn(state, dev_batch, jnp.asarray(epoch_f))
        if pending is not None:
            flush(pending)
        pending = (i, epoch_f, metrics)

    if pending is not None:
        flush(pending)
    metric_logger.synchronize_between_processes()
    print("Averaged stats:", metric_logger)
    return state, {k: m.global_avg for k, m in metric_logger.meters.items()}


def test_one_epoch(model, params, criterion, data_loader, epoch,
                   print_freq=20, prefix="test", mesh=None, img_dtype=None):
    # test meters keep the whole epoch in window (median over everything,
    # reference test_one_epoch's window_size=9**9)
    metric_logger = MetricLogger(window_size=10 ** 9)
    header = f"Test Epoch: [{epoch}]"
    data_loader.set_epoch(epoch)

    packed_names = []  # scalar metric order, captured at trace time

    @jax.jit
    def eval_step(params, batch):
        if mesh is not None:
            batch = batch_constraint(mesh, batch)
        (loss, details), _ = loss_of_one_batch(model, params, criterion,
                                               batch, symmetrized=True)
        scalars = dict({k: v for k, v in details.items()
                        if jnp.ndim(v) == 0}, loss=loss)
        if not packed_names:
            packed_names.extend(sorted(scalars))
        # one packed vector = one host pull per batch (vs one per scalar)
        return jnp.stack([scalars[k].astype(jnp.float32)
                          for k in packed_names])

    for i, batch in metric_logger.log_every(iter(data_loader), print_freq,
                                            header):
        view1, view2 = batch
        view1, view2 = add_manyar_flags(*make_batch_symmetric(view1, view2))
        dev_batch = (_batch_to_device(view1, img_dtype),
                     _batch_to_device(view2, img_dtype))
        if mesh is not None:
            dev_batch = shard_batch(mesh, dev_batch)
        vals = np.asarray(eval_step(params, dev_batch))
        metric_logger.update(**dict(zip(packed_names, map(float, vals))))

    # global medians/averages across processes -> checkpoint-best selection
    # is rank-independent (reference training.py:336)
    metric_logger.synchronize_between_processes()
    print("Averaged stats:", metric_logger)
    aggs = [("avg", "global_avg"), ("med", "median")]
    return {f"{k}_{tag}": getattr(m, attr)
            for k, m in metric_logger.meters.items() for tag, attr in aggs}
