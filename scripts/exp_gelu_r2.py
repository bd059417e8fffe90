"""GELU variant cost on the real TPU at the encoder MLP shape.

Exact erf-GELU adds ~1.17 ms/layer at (12288, 4096) - more than both MLP
GEMMs. Measure tanh-approx and sigmoid-approx alternatives + their
activation-level error vs exact.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


def timeit(f, *a, iters=10, rounds=4):
    out = f(*a)
    sync(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def chain_time(fn, x0, n=8, **kw):
    def chained(m):
        @jax.jit
        def f(x):
            out = x
            for _ in range(m):
                out = fn(out)
            return out
        return f

    t1 = timeit(chained(1), x0, **kw)
    tn = timeit(chained(n), x0, **kw)
    return (tn - t1) / (n - 1)


def main():
    print("devices:", jax.devices(), flush=True)
    B, N, D = 16, 768, 1024
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.standard_normal((D, 4 * D)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((4 * D, D)) * 0.02, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B * N, D)), jnp.bfloat16)

    acts = {
        "none": lambda h: h,
        "erf-exact": lambda h: jax.nn.gelu(h, approximate=False),
        "erf-fp32": lambda h: jax.nn.gelu(
            h.astype(jnp.float32), approximate=False).astype(h.dtype),
        "tanh": lambda h: jax.nn.gelu(h, approximate=True),
        "sigmoid": lambda h: h * jax.nn.sigmoid(1.702 * h),
        "relu": nn.relu,
    }

    def mlp(act):
        def f(y):
            h = jnp.dot(y, w1, preferred_element_type=jnp.bfloat16)
            h = act(h)
            return jnp.dot(h, w2, preferred_element_type=jnp.bfloat16)
        return f

    base = None
    for name, act in acts.items():
        t = chain_time(mlp(act), x)
        if name == "none":
            base = t
        print(f"mlp + {name:10s}: {t:7.3f} ms  (+{t - base:6.3f} over gemms)",
              flush=True)

    # activation-level accuracy vs exact fp32 erf on realistic range
    h = jnp.asarray(rng.standard_normal((1 << 20,)) * 3, jnp.float32)
    exact = jax.nn.gelu(h, approximate=False)
    for name in ("tanh", "sigmoid"):
        approx = acts[name](h)
        err = float(jnp.max(jnp.abs(approx - exact)))
        rel = float(jnp.sqrt(jnp.mean((approx - exact) ** 2))
                    / jnp.sqrt(jnp.mean(exact ** 2)))
        print(f"{name:8s} vs exact: maxabs {err:.2e}  relRMSE {rel:.2e}",
              flush=True)
    # bf16 quantization floor for comparison
    hb = h.astype(jnp.bfloat16).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(hb - h)))
    print(f"bf16 input rounding itself: maxabs {err:.2e}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
