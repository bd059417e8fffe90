"""Round-3: FULL pair forward (512_dpt @384x512 B=8) per conv3x3 impl.

Isolated per-op timings through the tunnel are dispatch-dominated (every
formulation lands in the same 3-7 ms band, scripts/exp_conv*_r3.py); the
only trustworthy comparison is the full in-graph forward. Runs the real
model with each ops/conv3x3 impl and reports ms/iter.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dust3r_tpu.models.model import dust3r_512_dpt
from dust3r_tpu.ops import conv3x3 as convmod


def main():
    print("devices:", jax.devices(), flush=True)
    model = dust3r_512_dpt(dtype=jnp.bfloat16)
    B, H, W = 8, 384, 512
    imgs = [jax.random.normal(jax.random.PRNGKey(i), (B, H, W, 3),
                              jnp.float32) for i in range(4)]

    @jax.jit
    def init_bf16(k, i1, i2):
        p = model.init(k, i1, i2)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p)

    t0 = time.perf_counter()
    params = init_bf16(jax.random.PRNGKey(2), imgs[0][:1], imgs[1][:1])
    _ = float(jnp.sum(params["params"]["enc_norm"]["ln"]["scale"]))
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    sync = jax.jit(lambda x: jnp.sum(x[..., 0]))
    results = {}
    for impl in ("ref", "tapcat", "pallas"):
        convmod.set_default_impl(impl)

        def fwd(params, img1, img2):
            res1, res2 = model.apply(params, img1, img2)
            return (res1["pts3d"], res1["conf"],
                    res2["pts3d_in_other_view"], res2["conf"])

        f = jax.jit(fwd)
        t0 = time.perf_counter()
        try:
            out = f(params, imgs[0], imgs[1])
            _ = float(sync(out[0]))
        except Exception as e:
            print(f"{impl}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        print(f"{impl}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        for _w in range(3):
            out = f(params, imgs[_w % 4], imgs[(_w + 1) % 4])
        _ = float(sync(out[0]))
        best = float("inf")
        for r in range(3):
            t0 = time.perf_counter()
            for i in range(10):
                out = f(params, imgs[i % 4], imgs[(i + 1) % 4])
            _ = float(sync(out[0]))
            best = min(best, (time.perf_counter() - t0) / 10 * 1e3)
        results[impl] = best
        print(f"{impl}: {best:.1f} ms/iter = {B / best * 1e3:.2f} pairs/s",
              flush=True)
    print("RESULTS", results, flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
