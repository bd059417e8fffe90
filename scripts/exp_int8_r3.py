"""Round-3 probe: int8 MXU rate at the model's gemm shapes.

The v5e MXU doubles its rate on int8 operands (nominal ~394 TOPS vs
~197 TF/s bf16). If XLA's dot_general actually reaches it at the
transformer's shapes, a quantized inference mode would have real
headroom (encoder gemm floor 39 ms -> ~20). This probe measures raw
int8 vs bf16 einsum rates on the encoder/decoder gemm shapes - it does
NOT claim model accuracy (unvalidatable here without real checkpoints;
per-channel calibration + the expm1 head's error amplification make
int8 a research mode, not a parity mode).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


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


# (name, M, K, N): the model's hot gemms at B=8 pairs (16 imgs x 768 tok)
SHAPES = [
    ("enc qkv   ", 12288, 1024, 3072),
    ("enc proj  ", 12288, 1024, 1024),
    ("enc fc1   ", 12288, 1024, 4096),
    ("enc fc2   ", 12288, 4096, 1024),
    ("dec fc1   ", 6144, 768, 3072),
    ("attn qk   ", 768, 64, 768),
]


def _chain(dot, reps):
    """reps dependent gemms in ONE jit: marginal per-gemm cost excludes
    the dispatch floor (in-graph chained-delta method, docs/DESIGN.md)."""
    def f(a, b):
        acc = a
        for _ in range(reps):
            out = dot(acc, b)
            # feed a cheap projection of the output back as the next lhs
            # so the chain is dependent (no cross-gemm parallelism) and
            # dtypes stay put
            acc = (out[:, :a.shape[1]]).astype(a.dtype)
        return acc
    return jax.jit(f)


def main():
    print("jax:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    r_lo, r_hi = 4, 16
    print(f"{'gemm':12s} {'GF':>7s} {'bf16/gemm':>10s} {'int8/gemm':>10s} "
          f"{'bf16 TF/s':>10s} {'int8 TOPS':>10s} {'speedup':>8s}")
    for name, M, K, N in SHAPES:
        if N < K:
            continue  # chain needs out cols >= in cols
        gf = 2 * M * K * N / 1e9
        a8 = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
        b8 = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
        ab = jax.random.normal(key, (M, K), jnp.bfloat16)
        bb = jax.random.normal(key, (K, N), jnp.bfloat16)

        def dot_bf(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        def dot_i8(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)

        t_bf = (timeit(_chain(dot_bf, r_hi), ab, bb)
                - timeit(_chain(dot_bf, r_lo), ab, bb)) / (r_hi - r_lo)
        t_i8 = (timeit(_chain(dot_i8, r_hi), a8, b8)
                - timeit(_chain(dot_i8, r_lo), a8, b8)) / (r_hi - r_lo)
        print(f"{name} {gf:7.1f} {t_bf:10.3f} {t_i8:10.3f} "
              f"{gf / t_bf:10.1f} {gf / t_i8:10.1f} {t_bf / t_i8:8.2f}x",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
