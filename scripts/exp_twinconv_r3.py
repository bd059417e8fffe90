"""Round-3f: can the twin DPT heads' identical-shape 3x3 convs batch?

The two DPT heads run the same conv shapes with different weights
(model.py head1/head2). VERDICT r3 item 1(b) suggests batching them.
Round-2's probe used feature_group_count (XLA split the groups - lost).
Untried: batch_group_count=2 - concat the two heads' activations on
batch (2B) and stack their filters on the output-feature axis; one conv
dispatch, full lane fill on the narrow-channel tail.

Shapes (512x384, B=8): conv2 tail (B,384,512,128)->32 [4.04 ms each in
the round-2 decomposition], refinenet ResidualConvUnit
(B,96,128,256)->256, fusion out (B,192,256,256)->128.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

SHAPES = [
    ("conv2_tail", (8, 384, 512, 128), 32),
    ("rcu_96x128", (8, 96, 128, 256), 256),
    ("fusion_192x256", (8, 192, 256, 256), 128),
]
DN = ("NHWC", "HWIO", "NHWC")


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


def timeit(f, *args, iters=20, rounds=3):
    out = f(*args)
    sync(out[0] if isinstance(out, tuple) else out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        sync(out[0] if isinstance(out, tuple) else out)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best, out


def main():
    print("devices:", jax.devices(), flush=True)
    for name, (b, h, w, cin), cout in SHAPES:
        k = jax.random.PRNGKey(0)
        x1 = jax.random.normal(k, (b, h, w, cin), jnp.float32)
        x2 = x1 + 1.0
        w1 = jax.random.normal(k, (3, 3, cin, cout), jnp.float32) * 0.05
        w2 = w1 * 0.5

        @jax.jit
        def sep(x1, x2, w1, w2):
            y1 = lax.conv_general_dilated(x1, w1, (1, 1), "SAME",
                                          dimension_numbers=DN)
            y2 = lax.conv_general_dilated(x2, w2, (1, 1), "SAME",
                                          dimension_numbers=DN)
            return y1, y2

        @jax.jit
        def bgc(x1, x2, w1, w2):
            # batch_group_count=2: output batch is B, output features are
            # [head1's Cout from x1 | head2's Cout from x2]
            x = jnp.concatenate([x1, x2])  # (2B, H, W, Cin)
            wk = jnp.concatenate([w1, w2], axis=-1)  # (3,3,Cin,2*Cout)
            y = lax.conv_general_dilated(x, wk, (1, 1), "SAME",
                                         dimension_numbers=DN,
                                         batch_group_count=2)
            return y[..., :cout], y[..., cout:]

        @jax.jit
        def bgc_pre(x, wk):  # concat cost excluded (inputs pre-stacked)
            y = lax.conv_general_dilated(x, wk, (1, 1), "SAME",
                                         dimension_numbers=DN,
                                         batch_group_count=2)
            return y

        ms_sep, (y1, y2) = timeit(sep, x1, x2, w1, w2)
        try:
            ms_b, (z1, z2) = timeit(bgc, x1, x2, w1, w2)
            rel = float(jnp.max(jnp.abs(z1 - y1)) / jnp.max(jnp.abs(y1)))
            xs = jnp.concatenate([x1, x2])
            wks = jnp.concatenate([w1, w2], axis=-1)
            ms_bp, _ = timeit(bgc_pre, xs, wks)
            print(f"{name:16s}: sep {ms_sep:6.2f} ms | bgc {ms_b:6.2f} "
                  f"(pre {ms_bp:6.2f}) | rel {rel:.1e}", flush=True)
        except Exception as e:
            print(f"{name:16s}: sep {ms_sep:6.2f} ms | bgc FAILED "
                  f"{type(e).__name__}: {e}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
