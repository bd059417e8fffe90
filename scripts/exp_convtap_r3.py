"""Round-3 probe: 3x3 conv as ONE full-lane tap einsum + shifted-add.

  t = x_pad @ Wall            # (B,H,W+2,Cin) @ (Cin, 9*Cout): one matmul,
                              # x read once, N=9*Cout lanes (full MXU)
  y[h,w] = sum_{dy,dx} t[h+dy-1, w+dx, (dy,dx)-block]   # 9 shifted adds

FLOPs identical to the conv (the matmul IS the 9 taps); the cost is the
(B,H,W+2,9Cout) bf16 intermediate's write+read. vs the conv op's
15-46 TF/s that trade can win on every narrow/medium shape.
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


def conv_tapcat(x, w):
    """x: (B,H,W,Cin) f32; w: (3,3,Cin,Cout). bf16 compute, f32-free."""
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (0, 0), (1, 1), (0, 0)))
    wall = w.astype(jnp.bfloat16).transpose(2, 0, 1, 3).reshape(
        Cin, 9 * Cout)  # columns (dy, dx, cout)
    t = jnp.einsum("bhpc,cn->bhpn", xp, wall)  # (B, H, W+2, 9Cout)
    tp = jnp.pad(t, ((0, 0), (1, 1), (0, 0), (0, 0)))
    y = None
    for dy in range(3):
        for dx in range(3):
            blk = (dy * 3 + dx) * Cout
            # y[h, w] += t[h+dy-1, w+dx, blk]
            s = jax.lax.slice(tp, (0, dy, dx, blk),
                              (B, dy + H, dx + W, blk + Cout))
            y = s if y is None else y + s
    return y


def conv_ref(x, w, prec=None):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)


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
        ref = jax.jit(lambda x, w: conv_ref(
            x, w, jax.lax.Precision.HIGHEST))(x, w)
        scale = float(jnp.max(jnp.abs(ref)))
        ms0 = timeit(jax.jit(conv_ref), x, w)
        f1 = jax.jit(conv_tapcat)
        out = f1(x, w).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(out - ref))) / scale
        ms = timeit(f1, x, w)
        print(f"-- {name}: conv {ms0:6.2f} ms ({flops/ms0/1e9:5.1f} TF/s)"
              f" | tapcat {ms:6.2f} ms ({flops/ms/1e9:5.1f} TF/s)"
              f" | x{ms0/ms:4.2f}  err={err:.1e}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
