"""Round-3 probe: Pallas tap-sum 3x3 conv for the DPT head shapes.

XLA's conv op runs the DPT convs at 13-46 TF/s (exp_convprec_r3) while
dots hit ~213 TF/s; every XLA-level dot reformulation loses to HBM tap
re-reads (exp_conv2dot_r3). This kernel keeps the taps in VMEM:

  grid (B, H/Th); per program the (Th, W+2, Cin) row block is resident
  and 3 matmuls (one per horizontal tap dx, N = 3*Cout lanes for the 3
  vertical taps at once) produce Z[.., dy*Cout+c] = sum_dx x[.., w+dx] @
  W[dy, dx]. The vertical combine y[h] = sum_dy Z_dy[h+dy-1] is a cheap
  fused XLA shifted add (3 reads of out-size, no halos anywhere).

bf16 inputs + fp32 MXU accumulation - the same numeric class as XLA's
default TPU conv (which rounds fp32 conv inputs to bf16, rel err 2.1e-3,
exp_convprec_r3).
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


def _tap_kernel(x_ref, w_ref, o_ref):
    """x: (1, Th, W+2, Cin) bf16; w: (3, Cin, 3*Cout); o: (1, Th, W, 3*Cout)."""
    W = o_ref.shape[2]
    x = x_ref[0]
    acc = None
    for dx in range(3):
        xs = jax.lax.slice(x, (0, dx, 0), (x.shape[0], dx + W, x.shape[2]))
        t = jax.lax.dot_general(xs, w_ref[dx], (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    o_ref[0] = acc.astype(o_ref.dtype)


def _pick_th(H):
    for th in (16, 12, 8, 4):
        if H % th == 0:
            return th
    return H


def conv3x3_pallas(x, w, th=None):
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    Th = th or _pick_th(H)
    xb = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (0, 0), (1, 1), (0, 0)))
    wcat = w.astype(jnp.bfloat16).transpose(1, 2, 0, 3).reshape(
        Cin, 3, 3 * Cout)  # (Cin, dx, dy*Cout)
    wcat = wcat.transpose(1, 0, 2)  # (dx, Cin, dy*Cout)
    Z = pl.pallas_call(
        _tap_kernel,
        grid=(B, H // Th),
        in_specs=[
            pl.BlockSpec((1, Th, W + 2, Cin), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Cin, 3 * Cout), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Th, W, 3 * Cout),
                               lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, 3 * Cout), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * Cin * Cout,
            bytes_accessed=xb.size * 2 + B * H * W * 3 * Cout * 2,
            transcendentals=0,
        ),
    )(xb, wcat)
    # vertical tap combine: y[h] = sum_dy Z_dy[h + dy - 1]
    Zp = jnp.pad(Z, ((0, 0), (1, 1), (0, 0), (0, 0)))
    y = sum(jax.lax.slice(Zp, (0, dy, 0, dy * Cout),
                          (B, dy + H, W, (dy + 1) * Cout))
            for dy in range(3))
    return y


def conv_ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)


SHAPES = [
    ("head_conv2 384x512 128->32", 8, 384, 512, 128, 32),
    ("head_conv1 192x256 256->128", 8, 192, 256, 256, 128),
    ("rcu1 96x128 256->256", 8, 96, 128, 256, 256),
    ("layer1_rn 96x128 96->256", 8, 96, 128, 96, 256),
    ("rcu2 48x64 256->256", 8, 48, 64, 256, 256),
    ("rcu3 24x32 256->256", 8, 24, 32, 256, 256),
]


def main():
    print("devices:", jax.devices(), flush=True)
    r = np.random.default_rng(0)
    for name, B, H, W, Cin, Cout in SHAPES:
        x = jnp.asarray(r.standard_normal((B, H, W, Cin)), jnp.float32)
        w = jnp.asarray(r.standard_normal((3, 3, Cin, Cout)) * 0.05,
                        jnp.float32)
        flops = 2 * B * H * W * 9 * Cin * Cout
        ref = jax.jit(conv_ref)(x, w)
        scale = float(jnp.max(jnp.abs(ref)))
        f0 = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
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
