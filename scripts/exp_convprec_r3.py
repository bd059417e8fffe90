"""Round-3 probe: does an EXPLICIT conv precision config escape the
terminal-pinned fp32 conv path?

Background (docs/DESIGN.md round-2): the axon terminal pins
--xla_allow_excess_precision=true, under which bf16 conv INPUTS are upcast
and convs run ~30 TF/s - consistent with the fp32 6-pass MXU decomposition.
Round 2 only varied input DTYPE. This probe varies the conv PRECISION
config (DEFAULT / HIGH=bf16x3 / HIGHEST=bf16x6) on the DPT head's four
dominant conv shapes, which together are ~2/3 of each head's 25.3 ms.

If HIGH respects the request, the conv tail halves for ~1e-6 relative
error (bf16x3 carries ~16 mantissa bits through the product) - far inside
the 1e-2 RMSE parity bar.
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


def conv2d(x, w, prec):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)


# (name, B, H, W, Cin, Cout) - the DPT head's conv workload at 512x384
SHAPES = [
    ("head_conv2 384x512 128->32", 8, 384, 512, 128, 32),
    ("head_conv1 192x256 256->128", 8, 192, 256, 256, 128),
    ("rcu1 96x128 256->256", 8, 96, 128, 256, 256),
    ("layer1_rn 96x128 96->256", 8, 96, 128, 96, 256),
]

PRECS = [
    ("default", jax.lax.Precision.DEFAULT),
    ("high", jax.lax.Precision.HIGH),
    ("highest", jax.lax.Precision.HIGHEST),
]


def main():
    print("devices:", jax.devices(), flush=True)
    r = np.random.default_rng(0)
    for name, B, H, W, Cin, Cout in SHAPES:
        x = jnp.asarray(r.standard_normal((B, H, W, Cin)), jnp.float32)
        w = jnp.asarray(r.standard_normal((3, 3, Cin, Cout)) * 0.05,
                        jnp.float32)
        flops = 2 * B * H * W * 9 * Cin * Cout
        ref = None
        print(f"-- {name}: {flops/1e9:.1f} GFLOP", flush=True)
        for pname, prec in PRECS:
            f = jax.jit(lambda x, w, p=prec: conv2d(x, w, p))
            out = f(x, w)
            if ref is None:
                pass
            ms = timeit(f, x, w)
            if pname == "highest":
                ref = out
            print(f"   f32  {pname:8s}: {ms:6.2f} ms  "
                  f"({flops/ms/1e9:6.1f} TF/s)", flush=True)
        ref = jax.jit(lambda x, w: conv2d(x, w,
                                          jax.lax.Precision.HIGHEST))(x, w)
        for pname, prec in PRECS[:2]:
            f = jax.jit(lambda x, w, p=prec: conv2d(x, w, p))
            out = f(x, w)
            err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
            print(f"   f32  {pname:8s}: rel err vs highest = {err:.2e}",
                  flush=True)
        # bf16 inputs for scale (round-2 finding: elided/upcast)
        xb, wb = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
        f = jax.jit(lambda x, w: conv2d(x, w, jax.lax.Precision.DEFAULT))
        ms = timeit(f, xb, wb)
        print(f"   bf16 default : {ms:6.2f} ms  ({flops/ms/1e9:6.1f} TF/s)",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
