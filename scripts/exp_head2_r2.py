"""Piecewise DPT-head profile: which stage eats the 21 ms?"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from dust3r_tpu.models.heads import (ResidualConvUnit, FeatureFusionBlock,
                                     upsample2x_align_corners, _PatchExpand)


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


def timeit(f, *a, iters=10, rounds=4):
    out = f(*a)
    sync(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        sync(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def chain_time(build_fn, x0, n=6, **kw):
    def chained(m):
        @jax.jit
        def f(x):
            out = x
            for _ in range(m):
                out = build_fn(out)
                # keep shape stable for chaining
                out = out[:, :x.shape[1], :x.shape[2], :x.shape[3]] \
                    if out.shape != x.shape else out
            return out
        return f

    t1 = timeit(chained(1), x0, **kw)
    tn = timeit(chained(n), x0, **kw)
    return (tn - t1) / (n - 1)


def main():
    print("devices:", jax.devices(), flush=True)
    B = 8
    dt = jnp.float32
    r = np.random.default_rng(0)

    def arr(shape):
        return jnp.asarray(r.standard_normal(shape), dt)

    # stage shapes for 512x384, patch 16: token grid 24x32
    shapes = {
        "rcu@24x32x256": (ResidualConvUnit(256, dt), (B, 24, 32, 256)),
        "rcu@48x64x256": (ResidualConvUnit(256, dt), (B, 48, 64, 256)),
        "rcu@96x128x256": (ResidualConvUnit(256, dt), (B, 96, 128, 256)),
    }
    for name, (mod, shp) in shapes.items():
        x = arr(shp)
        p = mod.init(jax.random.PRNGKey(0), x)
        t = chain_time(lambda y, mod=mod, p=p: mod.apply(p, y), x)
        print(f"{name:18s}: {t:7.2f} ms", flush=True)

    for name, shp in [("up2x@96x128x256", (B, 96, 128, 256)),
                      ("up2x@192x256x128", (B, 192, 256, 128))]:
        x = arr(shp)

        def up_then_crop(y):
            return upsample2x_align_corners(y)[:, :y.shape[1], :y.shape[2], :]

        t = chain_time(up_then_crop, x)
        print(f"{name:18s}: {t:7.2f} ms", flush=True)

    convs = [
        ("conv3x3 256->128 @192x256", 256, 128, (B, 192, 256, 256)),
        ("conv3x3 128->32 @384x512", 128, 32, (B, 384, 512, 128)),
        ("conv1x1 256->256 @192x256", 256, 256, (B, 192, 256, 256)),
    ]
    for name, cin, cout, shp in convs:
        k = (1, 1) if "1x1" in name else (3, 3)
        pad = 0 if "1x1" in name else 1
        mod = nn.Conv(cout, k, padding=pad, dtype=dt)
        x = arr(shp)
        p = mod.init(jax.random.PRNGKey(0), x)

        def apply_pad(y, mod=mod, p=p, cin=cin):
            out = mod.apply(p, y)
            # pad channels back for chaining
            return jnp.concatenate(
                [out] + [out] * ((cin - out.shape[-1]) // out.shape[-1]),
                axis=-1) if out.shape[-1] != cin else out

        t = chain_time(apply_pad, x)
        fl = 2 * np.prod(shp[:3]) * k[0] * k[1] * cin * cout
        print(f"{name:26s}: {t:7.2f} ms  {fl / t / 1e9:6.1f} TF/s", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
