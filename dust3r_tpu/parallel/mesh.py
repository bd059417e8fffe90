"""Device mesh + sharding rules for multi-chip training/inference.

Replaces the reference's DDP/NCCL stack (torch DistributedDataParallel,
reference dust3r/training.py:152-155, SURVEY.md §2.9) with the TPU-native
equivalent: a jax.sharding.Mesh over ICI, parameters replicated or
FSDP/TP-sharded via NamedSharding, all collectives (gradient reduction,
TP partial-sum reduce) emitted by XLA from the sharding annotations -
no explicit collectives in user code.

Mesh axes:
  data  - batch (pure data parallelism; DDP equivalent)
  fsdp  - optional parameter sharding (ZeRO-3 style); the ~0.6B-param
          model fits one chip, so fsdp=1 is the parity default.
  model - optional tensor parallelism over the transformer MLPs
          (Megatron split: fc1 column-parallel -> local GELU -> fc2
          row-parallel, XLA inserts the partial-sum all-reduce). The MLPs
          are ~2/3 of parameters and FLOPs; attention stays data-local.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data=None, n_fsdp=1, n_model=1, devices=None):
    """Build a (data, fsdp, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // (n_fsdp * n_model)
    n_used = n_data * n_fsdp * n_model
    assert n_used <= n_total, (
        f"mesh data={n_data} x fsdp={n_fsdp} x model={n_model} needs "
        f"{n_used} devices but only {n_total} are visible")
    dev = np.asarray(devices[:n_used]).reshape(n_data, n_fsdp, n_model)
    return Mesh(dev, ("data", "fsdp", "model"))


def batch_sharding(mesh):
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def _fsdp_spec(leaf, n_fsdp, taken_axis=None):
    """Choose the largest axis divisible by n_fsdp to shard, else replicate.
    taken_axis: axis already claimed by TP (skipped)."""
    if n_fsdp <= 1 or leaf.ndim == 0:
        return [None] * leaf.ndim
    sizes = list(leaf.shape)
    order = np.argsort(sizes)[::-1]
    for ax in order:
        if ax == taken_axis:
            continue
        if sizes[ax] % n_fsdp == 0 and sizes[ax] >= n_fsdp:
            spec = [None] * leaf.ndim
            spec[ax] = "fsdp"
            return spec
    return [None] * leaf.ndim


def _tp_axis(path_keys):
    """Megatron MLP split: returns (param kind) for TP-eligible leaves.

    fc1 kernel (in, hidden): shard hidden (axis -1) -> column parallel
    fc1 bias   (hidden,):    shard axis 0
    fc2 kernel (hidden, out): shard hidden (axis 0) -> row parallel
    """
    keys = [getattr(k, "key", None) for k in path_keys]
    if "mlp" not in keys:
        return None
    leafname = keys[-1]
    if "fc1" in keys:
        return -1 if leafname == "kernel" else 0
    if "fc2" in keys and leafname == "kernel":
        return 0
    return None


def param_shardings(mesh, params):
    """Per-leaf NamedSharding pytree for the parameters."""
    n_fsdp = mesh.shape["fsdp"]
    n_model = mesh.shape.get("model", 1)

    def spec_of(path, leaf):
        tp_ax = _tp_axis(path) if n_model > 1 else None
        if tp_ax is not None:
            tp_ax = tp_ax % leaf.ndim
            if leaf.shape[tp_ax] % n_model:
                tp_ax = None
        spec = _fsdp_spec(leaf, n_fsdp, taken_axis=tp_ax)
        if tp_ax is not None:
            spec[tp_ax] = "model"
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(spec_of, params)


def replicated(mesh):
    return NamedSharding(mesh, P())


def spans_processes(mesh):
    """True when the mesh includes devices of other JAX processes
    (multi-host: ICI within a host/slice, DCN across)."""
    pid = jax.process_index()
    return any(d.process_index != pid for d in mesh.devices.flat)


def _put_global(x, sharding):
    """device_put that also works when `sharding` spans processes.

    Every process holds the FULL host value (params: same init seed or
    the same loaded checkpoint on all hosts); each contributes only its
    addressable shards and the result is one global jax.Array.
    """
    x = np.asarray(x)
    arrays = [jax.device_put(x[idx], d)
              for d, idx in sharding.addressable_devices_indices_map(
                  x.shape).items()]
    return jax.make_array_from_single_device_arrays(x.shape, sharding,
                                                    arrays)


def shard_params(mesh, params):
    """Place parameters on the mesh according to param_shardings."""
    shardings = param_shardings(mesh, params)
    if spans_processes(mesh):
        return jax.tree.map(_put_global, params, shardings)
    return jax.tree.map(jax.device_put, params, shardings)


def shard_batch(mesh, batch, batch_axis=0):
    """Place a host batch onto the mesh, `batch_axis` sharded over 'data'.

    batch_axis=1 serves gradient-accumulation batches shaped
    (accum_iter, B, ...) where the leading axis is scanned, not sharded.

    Multi-host: each process passes its LOCAL batch (the rank-sharded
    slice its sampler produced, reference batched_sampler.py:62-66) and
    the pieces are assembled into one global array along `batch_axis` -
    the data never leaves the host that loaded it.
    """
    multiproc = spans_processes(mesh)

    def put(x):
        spec = [None] * np.ndim(x)
        spec[batch_axis] = "data"
        sh = NamedSharding(mesh, P(*spec))
        if multiproc:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


def batch_constraint(mesh, batch, batch_axis=0):
    """with_sharding_constraint counterpart of shard_batch (inside jit)."""
    def cons(x):
        spec = [None] * x.ndim
        spec[batch_axis] = "data"
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(cons, batch)


def cli_pair_mesh(n_devices):
    """Build the --mesh CLI pair-axis mesh: (mesh, batch_size).

    n_devices == 0 -> (None, 1): single-device behavior. Otherwise a 1-D
    Mesh over the first n_devices devices; raises if the host has fewer
    (silently under-provisioning would misreport throughput).
    """
    if not n_devices:
        return None, 1
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices > len(devs):
        raise ValueError(
            f"--mesh {n_devices} requested but only {len(devs)} devices "
            f"visible")
    import numpy as np

    return Mesh(np.array(devs[:n_devices]), ("pairs",)), n_devices
