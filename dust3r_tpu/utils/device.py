"""Structure-recursive array transfer / collation helpers.

Behavioral contract: /root/reference/dust3r/utils/device.py:11-76, adapted
to JAX: "device" transfer is jnp.asarray placement, "cpu" is device_get.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def todevice(batch, device=None, non_blocking=False):
    """Recursively move arrays to device ('cpu'/'numpy' => host numpy)."""
    if isinstance(batch, dict):
        return {k: todevice(v, device) for k, v in batch.items()}
    if isinstance(batch, (tuple, list)):
        return type(batch)(todevice(x, device) for x in batch)
    if isinstance(batch, (np.ndarray, jnp.ndarray)) or hasattr(batch, "shape"):
        if device in ("cpu", "numpy", None):
            return np.asarray(jax.device_get(batch))
        return jnp.asarray(batch)
    return batch


def to_numpy(x):
    return todevice(x, "numpy")


def to_cpu(x):
    return todevice(x, "cpu")


def to_device(x):
    return todevice(x, "device")


def collate_with_cat(whatever, lists=False):
    """Concatenate a list of samples/result-dicts along the batch dim.

    Mirrors reference collate_with_cat: dicts merge per key, arrays concat
    (or stay lists when `lists=True` - the mixed-shapes case), tuples of
    dicts collate pointwise.
    """
    if isinstance(whatever, dict):
        return {k: collate_with_cat(vals, lists=lists)
                for k, vals in whatever.items()}

    if isinstance(whatever, (tuple, list)):
        if len(whatever) == 0:
            return whatever
        elem = whatever[0]

        if isinstance(elem, dict):
            keys = elem.keys()
            return {k: collate_with_cat([d[k] for d in whatever], lists=lists)
                    for k in keys}
        if isinstance(elem, tuple):
            return type(elem)(collate_with_cat(x, lists=lists)
                              for x in zip(*whatever))
        if hasattr(elem, "shape"):  # arrays
            if lists:
                return [x for arr in whatever
                        for x in ([arr] if arr.ndim == elem.ndim - 1
                                  else list(arr))]
            return np.concatenate([np.atleast_1d(np.asarray(a))
                                   for a in whatever])
        if isinstance(elem, (list,)):
            return [x for lst in whatever for x in lst]
        return list(whatever)
    return whatever
