"""Multi-host initialization + cross-host reductions.

Replaces croco.utils.misc's torch.distributed toolkit (reference
dust3r/training.py:93-95; SURVEY.md §2.9): one JAX process per host,
`jax.distributed.initialize` for the cluster, mesh axes spanning ICI
(and DCN for multi-slice). Collectives are emitted by XLA from shardings;
the helpers here only cover host-side scalar logging reductions.
"""
from __future__ import annotations

import os

import numpy as np
import jax


def init_distributed_mode(coordinator_address=None, num_processes=None,
                          process_id=None):
    """Initialize the JAX cluster (no-op in single-process runs).

    Env-driven like the reference's env:// rendezvous: reads
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when args
    are not given; silently stays single-process when unset.
    """
    coordinator_address = coordinator_address or \
        os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    num_processes = num_processes or int(os.environ["JAX_NUM_PROCESSES"])
    process_id = process_id if process_id is not None \
        else int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def get_rank():
    return jax.process_index()


def get_world_size():
    return jax.process_count()


def is_main_process():
    return jax.process_index() == 0


def all_reduce_mean(x):
    """Mean of a host scalar across processes (reference all_reduce_mean)."""
    if jax.process_count() == 1:
        return float(x)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray(x, np.float64))
    return float(np.mean(arr))


def save_on_master(save_fn, *args, **kwargs):
    if is_main_process():
        save_fn(*args, **kwargs)
