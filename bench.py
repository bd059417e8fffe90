"""Benchmark harness: image pairs/sec/chip on the flagship config.

Headline metric (BASELINE.md): pairs/sec/chip, 512_dpt @ 512x384, bf16.
Baseline: the torch reference on A100 has no published throughput; the
commonly-reported figure for DUSt3R 512 DPT pair inference on A100 is
~100 ms/pair => 10 pairs/sec. vs_baseline is measured against that
estimate; the 10x-A100 north-star therefore corresponds to value >= 100.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""
import json
import sys
import time

import numpy as np

A100_REFERENCE_PAIRS_PER_SEC = 10.0  # documented estimate, see docstring


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_pairs_per_sec(batch_size=8, H=384, W=512, iters=10, warmup=2):
    import jax
    import jax.numpy as jnp
    from dust3r_tpu.models.model import dust3r_512_dpt

    model = dust3r_512_dpt(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    img1 = jax.random.normal(rng, (batch_size, H, W, 3), jnp.float32)
    img2 = jax.random.normal(jax.random.PRNGKey(1), (batch_size, H, W, 3),
                             jnp.float32)
    log(f"init params (B={batch_size}, {H}x{W}) ...")
    params = model.init(jax.random.PRNGKey(2), img1[:1], img2[:1])
    # params in bf16 for inference (weights-only cast; heads stay fp32 at
    # compute time by design)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if x.dtype == jnp.float32 else x, params)

    @jax.jit
    def fwd(params, img1, img2):
        res1, res2 = model.apply(params, img1, img2)
        return (res1["pts3d"], res1["conf"],
                res2["pts3d_in_other_view"], res2["conf"])

    log("compiling ...")
    t0 = time.perf_counter()
    out = fwd(params, img1, img2)
    jax.block_until_ready(out)
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")

    for _ in range(warmup):
        jax.block_until_ready(fwd(params, img1, img2))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, img1, img2)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    pairs_per_sec = batch_size * iters / dt
    log(f"steady state: {dt / iters * 1e3:.1f} ms/iter, "
        f"{pairs_per_sec:.2f} pairs/s")
    return pairs_per_sec


def main():
    import jax
    log(f"devices: {jax.devices()}")
    value = None
    for bs in (8, 4, 2, 1):
        try:
            value = bench_pairs_per_sec(batch_size=bs)
            break
        except Exception as e:
            log(f"batch_size={bs} failed: {type(e).__name__}: {e}")
    if value is None:
        print(json.dumps({"metric": "pairs_per_sec_512dpt", "value": 0.0,
                          "unit": "pairs/s/chip", "vs_baseline": 0.0}))
        return
    print(json.dumps({
        "metric": "pairs_per_sec_512dpt",
        "value": round(value, 2),
        "unit": "pairs/s/chip",
        "vs_baseline": round(value / A100_REFERENCE_PAIRS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
