"""Round-3 probe: reformulate the DPT 3x3 convs as 9 shifted DOTS.

exp_convprec_r3 showed the conv op runs at 13-46 TF/s isolated on every
DPT head shape regardless of precision config - while jnp.dot/einsum hits
~213 TF/s bf16 (docs/DESIGN.md). A 3x3 same-pad conv is exactly

    y[h, w, :] = sum_{dy, dx in {-1,0,1}}  x[h+dy, w+dx, :] @ W[dy, dx]

i.e. 9 (B*H*W, Cin) @ (Cin, Cout) matmuls on shifted views - no im2col
materialization, the shifts are pad+slice that XLA folds into the operand.
Round 2's dead end note assumed im2col TRAFFIC kills the dot formulation;
shifted dots have no such traffic.

Also measures the twin-head variant (head1+head2 as one op, channel
concat + block-diagonal weights): doubles lane fill where Cout < 128.
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


def conv(x, w, prec=None, groups=1):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec,
        feature_group_count=groups)


def conv_as_dots(x, w):
    """3x3 same-pad conv as 9 shifted (…, Cin) @ (Cin, Cout) dots."""
    B, H, W, Cin = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for dy in range(3):
        for dx in range(3):
            win = jax.lax.slice(xp, (0, dy, dx, 0), (B, dy + H, dx + W, Cin))
            t = jnp.einsum("bhwc,cn->bhwn", win, w[dy, dx])
            out = t if out is None else out + t
    return out


SHAPES = [
    ("head_conv2 384x512 128->32", 8, 384, 512, 128, 32),
    ("head_conv1 192x256 256->128", 8, 192, 256, 256, 128),
    ("rcu1 96x128 256->256", 8, 96, 128, 256, 256),
    ("layer1_rn 96x128 96->256", 8, 96, 128, 96, 256),
]


def main():
    print("devices:", jax.devices(), flush=True)
    r = np.random.default_rng(0)
    for name, B, H, W, Cin, Cout in SHAPES:
        x = jnp.asarray(r.standard_normal((B, H, W, Cin)), jnp.float32)
        w = jnp.asarray(r.standard_normal((3, 3, Cin, Cout)) * 0.05,
                        jnp.float32)
        flops = 2 * B * H * W * 9 * Cin * Cout
        print(f"-- {name}: {flops/1e9:.1f} GFLOP", flush=True)
        ref = jax.jit(lambda x, w: conv(x, w, jax.lax.Precision.HIGHEST))(x, w)
        scale = float(jnp.max(jnp.abs(ref)))

        f0 = jax.jit(lambda x, w: conv(x, w))
        ms0 = timeit(f0, x, w)
        print(f"   conv f32 default     : {ms0:6.2f} ms ({flops/ms0/1e9:6.1f} TF/s)",
              flush=True)

        fd = jax.jit(conv_as_dots)
        out = fd(x, w)
        err = float(jnp.max(jnp.abs(out - ref))) / scale
        ms = timeit(fd, x, w)
        print(f"   9-dots f32           : {ms:6.2f} ms ({flops/ms/1e9:6.1f} TF/s)  err={err:.1e}",
              flush=True)

        fdb = jax.jit(lambda x, w: conv_as_dots(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)))
        out = fdb(x, w).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(out - ref))) / scale
        ms = timeit(fdb, x, w)
        print(f"   9-dots bf16          : {ms:6.2f} ms ({flops/ms/1e9:6.1f} TF/s)  err={err:.1e}",
              flush=True)

        # twin-head: both heads' convs in one op (channel concat input,
        # per-head weights). grouped conv + grouped 9-dots (block batched)
        x2 = jnp.concatenate([x, x], axis=-1)
        w2 = jnp.concatenate([w, w], axis=-1)  # HWIO grouped: I=Cin, O=2Cout
        fg = jax.jit(lambda x, w: conv(x, w, groups=2))
        msg = timeit(fg, x2, w2)
        print(f"   twin grouped conv f32: {msg:6.2f} ms (per-head {msg/2:6.2f}, {2*flops/msg/1e9:6.1f} TF/s)",
              flush=True)

        def twin_dots(x, w):  # x: (..., 2Cin); w: (3,3,Cin,2Cout) stacked
            B, H, W, _ = x.shape
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            xp = xp.reshape(B, H + 2, W + 2, 2, Cin)
            out = None
            for dy in range(3):
                for dx in range(3):
                    win = jax.lax.slice(
                        xp, (0, dy, dx, 0, 0), (B, dy + H, dx + W, 2, Cin))
                    wt = w[dy, dx].reshape(Cin, 2, Cout).transpose(1, 0, 2)
                    t = jnp.einsum("bhwgc,gcn->bhwgn", win, wt)
                    out = t if out is None else out + t
            return out.reshape(B, H, W, 2 * Cout)

        ftd = jax.jit(lambda x, w: twin_dots(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)))
        out = ftd(x2, w2).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(out[..., :Cout] - ref))) / scale
        ms = timeit(ftd, x2, w2)
        print(f"   twin 9-dots bf16     : {ms:6.2f} ms (per-head {ms/2:6.2f}, {2*flops/ms/1e9:6.1f} TF/s)  err={err:.1e}",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
