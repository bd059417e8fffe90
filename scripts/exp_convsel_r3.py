"""Round-3 probe: PER-SHAPE 3x3-conv impl selection for the DPT heads.

exp_conv2dot_r3 measured whole-model tapcat (9*Cout intermediate) losing
to the conv op by 2.3 ms. But the conv op's MXU rate varies wildly with
Cout (21.6 TF/s at head_conv2's Cout=32 vs ~77 TF/s at Cout=256), while
the dot formulations' overhead is traffic-proportional. A per-shape
choice may beat both global choices. This probe times, per DPT conv
shape at 512x384 B=8:

  * ref      - XLA conv op
  * tapcat   - one (Cin, 9*Cout) einsum + 9 shifted adds (ops/conv3x3)
  * dycat    - NEW: stack the 3 W-shifts on a contracted axis, one
               (3*Cin, 3*Cout) einsum producing a dy-major (.., 3*Cout)
               intermediate (3x smaller than tapcat's), then 3 H-shifted
               adds. Same FLOPs as the conv, full MXU lanes, least
               intermediate traffic of the dot family.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dust3r_tpu.ops.conv3x3 import conv3x3_ref, conv3x3_tapcat


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


def conv3x3_dycat(x, w, b=None):
    """dy-major dot formulation: z[.., dy*Cout+n] = sum_{dx,c} over the
    3 W-shifted views; y = 3 H-shifted adds of z's dy blocks."""
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (0, 0), (1, 1), (0, 0)))
    xs = jnp.stack([jax.lax.slice(xp, (0, 0, dx, 0), (B, H, dx + W, Cin))
                    for dx in range(3)], axis=3)  # (B, H, W, 3, Cin)
    # (dy,dx,Cin,Cout) -> (dx, Cin, dy*Cout)
    wd = w.astype(jnp.bfloat16).transpose(1, 2, 0, 3).reshape(3, Cin, 3 * Cout)
    z = jnp.einsum("bhwdc,dcn->bhwn", xs, wd,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    zp = jnp.pad(z, ((0, 0), (1, 1), (0, 0), (0, 0)))
    y = None
    for dy in range(3):
        s = jax.lax.slice(zp, (0, dy, 0, dy * Cout),
                          (B, dy + H, W, (dy + 1) * Cout))
        y = s if y is None else y + s
    y = y.astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


# (name, B, H, W, Cin, Cout) - every 3x3 stride-1 conv of one DPT head
SHAPES = [
    ("rn1        ", 8, 96, 128, 96, 256),
    ("rn2        ", 8, 48, 64, 192, 256),
    ("rn3        ", 8, 24, 32, 384, 256),
    ("rn4        ", 8, 12, 16, 768, 256),
    ("RCU@96x128 ", 8, 96, 128, 256, 256),
    ("RCU@48x64  ", 8, 48, 64, 256, 256),
    ("RCU@24x32  ", 8, 24, 32, 256, 256),
    ("head_conv1 ", 8, 192, 256, 256, 128),
    ("head_conv2 ", 8, 384, 512, 128, 32),
    ("hc2 twin   ", 16, 384, 512, 128, 32),
]


def main():
    print("jax:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    print(f"{'shape':30s} {'GF':>6s} {'ref':>7s} {'tapcat':>7s} "
          f"{'dycat':>7s}  best")
    total = {"ref": 0.0, "tapcat": 0.0, "dycat": 0.0}
    for name, B, H, W, Cin, Cout in SHAPES:
        x = jax.random.normal(key, (B, H, W, Cin), jnp.float32)
        w = jax.random.normal(key, (3, 3, Cin, Cout), jnp.float32) * 0.02
        gf = 2 * B * H * W * 9 * Cin * Cout / 1e9
        fns = dict(
            ref=jax.jit(lambda x, w: conv3x3_ref(x, w)),
            tapcat=jax.jit(lambda x, w: conv3x3_tapcat(x, w)),
            dycat=jax.jit(lambda x, w: conv3x3_dycat(x, w)),
        )
        # numeric check vs ref (both bf16-rounded classes)
        yr = np.asarray(fns["ref"](x, w), np.float32)
        yd = np.asarray(fns["dycat"](x, w), np.float32)
        err = np.abs(yd - yr).max() / (np.abs(yr).max() + 1e-9)
        ts = {k: timeit(f, x, w) for k, f in fns.items()}
        for k in total:
            total[k] += ts[k] * (0.5 if name.startswith("hc2 twin") else 1)
        best = min(ts, key=ts.get)
        print(f"{name} {B}x{H}x{W} {Cin}->{Cout} {gf:6.1f} "
              f"{ts['ref']:7.2f} {ts['tapcat']:7.2f} {ts['dycat']:7.2f}"
              f"  {best}  (dycat relerr {err:.1e})", flush=True)
    print("totals (per head, hc2 twin halved):", {
        k: round(v, 1) for k, v in total.items()}, flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
