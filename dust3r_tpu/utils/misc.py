"""Misc utilities: batch symmetry detection, interleaving, freezing masks.

Behavioral contract: /root/reference/dust3r/utils/misc.py. The
transpose_to_landscape head wrapper is obsolete in the TPU build (the model
runs each AR bucket at its true orientation; see models/model.py docstring)
- `freeze_mask` replaces torch requires_grad freezing with gradient masks.
"""
from __future__ import annotations

import inspect

import numpy as np
import jax
import jax.numpy as jnp


def fill_default_args(kwargs, func):
    signature = inspect.signature(func)
    for k, v in signature.parameters.items():
        if v.default is inspect.Parameter.empty:
            continue
        kwargs.setdefault(k, v.default)
    return kwargs


def is_symmetrized(gt1, gt2):
    """Detect (a, b), (b, a) interleaved batches (reference :32-40)."""
    x = gt1["instance"]
    y = gt2["instance"]
    if len(x) == len(y) == 1:
        return False
    ok = True
    for i in range(0, len(x), 2):
        ok = ok and (x[i] == y[i + 1]) and (x[i + 1] == y[i])
    return ok


def flip(arr):
    """Swap even/odd batch entries."""
    arr = np.asarray(arr)
    out = np.empty_like(arr)
    out[0::2], out[1::2] = arr[1::2], arr[0::2]
    return out


def interleave(t1, t2):
    t1, t2 = np.asarray(t1), np.asarray(t2)
    res1 = np.stack([t1, t2], axis=1).reshape((-1,) + t1.shape[1:])
    res2 = np.stack([t2, t1], axis=1).reshape((-1,) + t2.shape[1:])
    return res1, res2


def freeze_mask(params, freeze="none"):
    """Gradient-mask pytree implementing the reference's set_freeze modes
    (dust3r/model.py:100-107): 'none', 'mask' (no-op here: no mask token),
    'encoder' (patch embed + encoder blocks frozen).

    Multiply gradients by this mask in the train step.
    """
    assert freeze in ("none", "mask", "encoder")

    def mask_fn(path, leaf):
        if freeze != "encoder":
            return jnp.ones((), leaf.dtype)
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        frozen = any(str(k) == "patch_embed" or str(k).startswith("enc_blocks")
                     for k in keys)
        return jnp.zeros((), leaf.dtype) if frozen else jnp.ones((), leaf.dtype)

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def transposed(dic):
    """Swap the two spatial axes of every (B, H, W, ...) map in a dict."""
    return {k: np.swapaxes(np.asarray(v), 1, 2) for k, v in dic.items()}
