"""Device mesh + sharding rules for multi-chip training/inference.

Replaces the reference's DDP/NCCL stack (torch DistributedDataParallel,
reference dust3r/training.py:152-155, SURVEY.md §2.9) with the TPU-native
equivalent: a jax.sharding.Mesh over ICI, parameters replicated or
FSDP-sharded via NamedSharding, gradient reduction emitted by XLA from the
sharding annotations - no explicit collectives in user code.

Mesh axes:
  data  - batch (pure data parallelism; DDP equivalent)
  fsdp  - optional parameter sharding (ZeRO-3 style); the ~0.6B-param
          model fits one chip, so fsdp=1 is the parity default.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data=None, n_fsdp=1, devices=None):
    """Build a (data, fsdp) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_fsdp
    assert n_data * n_fsdp <= n_total
    dev = np.asarray(devices[:n_data * n_fsdp]).reshape(n_data, n_fsdp)
    return Mesh(dev, ("data", "fsdp"))


def batch_sharding(mesh):
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def _fsdp_spec(leaf, n_fsdp):
    """Choose the largest axis divisible by n_fsdp to shard, else replicate."""
    if n_fsdp <= 1 or leaf.ndim == 0:
        return P()
    sizes = list(leaf.shape)
    order = np.argsort(sizes)[::-1]
    for ax in order:
        if sizes[ax] % n_fsdp == 0 and sizes[ax] >= n_fsdp:
            spec = [None] * leaf.ndim
            spec[ax] = "fsdp"
            return P(*spec)
    return P()


def param_shardings(mesh, params):
    """Per-leaf NamedSharding pytree for the parameters."""
    n_fsdp = mesh.shape["fsdp"]
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, _fsdp_spec(leaf, n_fsdp)), params)


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_params(mesh, params):
    """Place parameters on the mesh according to param_shardings."""
    shardings = param_shardings(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)


def shard_batch(mesh, batch):
    """Place a host batch onto the mesh, batch axis over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
