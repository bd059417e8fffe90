"""Round-3 probe v2: Pallas tap-sum 3x3 conv, hang-safe formulation.

exp_convk_r3's kernel (in-kernel lax.slice at sublane offsets 1/2 on a
(Th, W+2, Cin) VMEM block) never returned from the remote Mosaic compile.
This version keeps the kernel body to THREE aligned matmuls:

  * the horizontal taps are materialized OUTSIDE as three shifted copies
    x_dx = pad(x)[:, dx:dx+W, :] (XLA slices, +2x input HBM traffic);
  * arrays are 3-D (B*H, W, Cin) with 3-D blocks (Th, W, Cin) - same
    shape class as the proven attention kernel;
  * kernel: o = sum_dx dot(x_dx, wcat_dx) with fp32 accumulation,
    N = 3*Cout lanes (the 3 vertical taps at once);
  * vertical combine = cheap XLA shifted add (exp_convk_r3 docstring).
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _tap_kernel(x0_ref, x1_ref, x2_ref, w_ref, o_ref):
    acc = jax.lax.dot_general(x0_ref[...], w_ref[0], (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(x1_ref[...], w_ref[1], (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(x2_ref[...], w_ref[2], (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def _pick_rows(total_rows, w, cin, cout, budget=12 * 1024 * 1024):
    """Rows per grid program, sized against the SCOPED vmem budget: the
    three tap blocks + the (rows, W, 3*Cout) output, each double-buffered
    (the first probe OOM'd the 16M scoped limit with input-only sizing,
    and oversized blocks additionally caused register-spill blowups)."""
    per_row = w * (3 * cin + 3 * cout) * 2 * 2
    rows = max(1, budget // per_row)
    while total_rows % rows:
        rows -= 1
    return rows


def conv3x3_pallas(x, w):
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    xb = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (0, 0), (1, 1), (0, 0)))
    taps = [jax.lax.slice(xb, (0, 0, dx, 0), (B, H, dx + W, Cin))
            .reshape(B * H, W, Cin) for dx in range(3)]
    # (dy,dx,Cin,Cout) -> (dx, Cin, dy*Cout): per-dx matrices whose
    # columns hold the 3 vertical taps dy-major
    wcat = w.astype(jnp.bfloat16).transpose(1, 2, 0, 3).reshape(
        3, Cin, 3 * Cout)
    R = B * H
    Tr = _pick_rows(R, W, Cin, Cout)
    tap_spec = pl.BlockSpec((Tr, W, Cin), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    Z = pl.pallas_call(
        _tap_kernel,
        grid=(R // Tr,),
        in_specs=[tap_spec, tap_spec, tap_spec,
                  pl.BlockSpec((3, Cin, 3 * Cout), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Tr, W, 3 * Cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, W, 3 * Cout), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * W * 3 * Cin * 3 * Cout,
            bytes_accessed=3 * R * W * Cin * 2 + R * W * 3 * Cout * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*taps, wcat)
    Z = Z.reshape(B, H, W, 3 * Cout)
    Zp = jnp.pad(Z, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return sum(jax.lax.slice(Zp, (0, dy, 0, dy * Cout),
                             (B, dy + H, W, (dy + 1) * Cout))
               for dy in range(3))


def conv_ref(x, w, prec=None):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)


SHAPES = [
    # smallest first: fail/hang fast if Mosaic dislikes the formulation
    ("rcu3 24x32 256->256", 8, 24, 32, 256, 256),
    ("rcu2 48x64 256->256", 8, 48, 64, 256, 256),
    ("rcu1 96x128 256->256", 8, 96, 128, 256, 256),
    ("layer1_rn 96x128 96->256", 8, 96, 128, 96, 256),
    ("head_conv1 192x256 256->128", 8, 192, 256, 256, 128),
    ("head_conv2 384x512 128->32", 8, 384, 512, 128, 32),
]


def main():
    print("devices:", jax.devices(), flush=True)
    r = np.random.default_rng(0)
    for name, B, H, W, Cin, Cout in SHAPES:
        x = jnp.asarray(r.standard_normal((B, H, W, Cin)), jnp.float32)
        w = jnp.asarray(r.standard_normal((3, 3, Cin, Cout)) * 0.05,
                        jnp.float32)
        flops = 2 * B * H * W * 9 * Cin * Cout
        ref = jax.jit(lambda x, w: conv_ref(
            x, w, jax.lax.Precision.HIGHEST))(x, w)
        scale = float(jnp.max(jnp.abs(ref)))
        f0 = jax.jit(conv_ref)
        ms0 = timeit(f0, x, w)
        fk = jax.jit(conv3x3_pallas)
        try:
            out = fk(x, w).astype(jnp.float32)
        except Exception as e:
            print(f"-- {name}: KERNEL FAILED: {type(e).__name__}: {e}",
                  flush=True)
            continue
        err = float(jnp.max(jnp.abs(out - ref))) / scale
        ms = timeit(fk, x, w)
        print(f"-- {name}: conv {ms0:6.2f} ms ({flops/ms0/1e9:5.1f} TF/s)"
              f" | pallas {ms:6.2f} ms ({flops/ms/1e9:5.1f} TF/s)"
              f" | x{ms0/ms:4.2f}  err={err:.1e}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
