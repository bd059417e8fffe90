"""Pallas align-corners 2x upsample emitting PHASE channels (B,H,W,4C).

The DPT tail's upsample-by-interp-matmul costs ~6 ms/head (middle-axis
contractions force full relayouts); XLA formulations of shift+lerp are
worse (13-20 ms: W-axis slice-concats relayout whole arrays). In Pallas
the W shifts are in-VMEM sublane ops and the per-row/column weights come
from iota, so the op should run at streaming bandwidth.

Measures: kernel alone, then kernel + s2d conv2 + block-diag conv3 +
depth-to-space + split postprocess (the full candidate tail) vs tail0.
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

from dust3r_tpu.models.heads import upsample2x_align_corners


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


def _up_kernel(x_ref, xu_ref, xd_ref, o_ref, *, Hc, Wc, hb):
    """Block (1,hb,Wc,C) of x and its +-1 H-shifted copies -> (1,hb,Wc,4C)
    phase channels (py,px,c)."""
    i = pl.program_id(1)
    x = x_ref[0]   # (hb, Wc, C)
    xu = xu_ref[0]
    xd = xd_ref[0]
    C = x.shape[-1]
    f32 = jnp.float32

    # per-row H weights: rows r = i*hb + 0..hb-1
    r = (jax.lax.broadcasted_iota(jnp.int32, (hb, 1, 1), 0)
         + i * hb).astype(f32)
    eh = r / (2 * Hc - 1)                      # even phase: eps*up + (1-eps)*x
    fh = (Hc - 1 - r) / (2 * Hc - 1)           # odd phase
    # per-column W weights
    c = jax.lax.broadcasted_iota(jnp.int32, (1, Wc, 1), 1).astype(f32)
    ew = c / (2 * Wc - 1)
    fw = (Wc - 1 - c) / (2 * Wc - 1)

    def wshift(t, delta):
        if delta == -1:
            return jnp.concatenate([t[:, :1], t[:, :-1]], axis=1)
        return jnp.concatenate([t[:, 1:], t[:, -1:]], axis=1)

    h0 = eh * xu + (1 - eh) * x
    h1 = (1 - fh) * x + fh * xd
    k = 0
    for hp in (h0, h1):
        o_ref[0, :, :, k * C:(k + 1) * C] = ew * wshift(hp, -1) + (1 - ew) * hp
        k += 1
        o_ref[0, :, :, k * C:(k + 1) * C] = (1 - fw) * hp + fw * wshift(hp, 1)
        k += 1


def up2x_phase_pallas(x, hb=4):
    B, Hc, Wc, C = x.shape
    xu = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    xd = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    kern = functools.partial(_up_kernel, Hc=Hc, Wc=Wc, hb=hb)
    spec = pl.BlockSpec((1, hb, Wc, C), lambda b, i: (b, i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B, Hc // hb),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((1, hb, Wc, 4 * C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hc, Wc, 4 * C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=16 * B * Hc * Wc * C,
            bytes_accessed=5 * x.size * x.dtype.itemsize,
            transcendentals=0),
    )(x, xu, xd)


# phase ordering note: kernel writes (py major, px minor, c) groups of C.
# conv weights must use matching (py,px,ci) channel blocks.
def conv2_weight_s2d(w):
    Cin, Cout = w.shape[2], w.shape[3]
    wc = np.zeros((3, 3, 2, 2, Cin, 2, 2, Cout), np.float32)
    for ay in range(3):
        for p in range(2):
            for py in range(2):
                dy = 2 * (ay - 1) + p - py
                if abs(dy) > 1:
                    continue
                for ax in range(3):
                    for q in range(2):
                        for px in range(2):
                            dx = 2 * (ax - 1) + q - px
                            if abs(dx) > 1:
                                continue
                            wc[ay, ax, p, q, :, py, px, :] += np.asarray(
                                w[dy + 1, dx + 1])
    return jnp.asarray(wc.reshape(3, 3, 4 * Cin, 4 * Cout))


def conv3_weight_bd(w):
    Cin, Cout = w.shape
    wc = np.zeros((2, 2, Cin, 2, 2, Cout), np.float32)
    for p in range(2):
        for q in range(2):
            wc[p, q, :, p, q, :] = np.asarray(w)
    return jnp.asarray(wc.reshape(4 * Cin, 4 * Cout))


def conv2d(x, w, pad=1):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def post_split(x, y, z, c):
    d = jnp.sqrt(x * x + y * y + z * z)
    s = jnp.expm1(d) / jnp.clip(d, 1e-8)
    pts = jnp.stack([x * s, y * s, z * s], axis=-1)
    conf = 1.0 + jnp.exp(c)
    return pts, conf


def post_packed(fmap):
    xyz = fmap[..., :3]
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    pts = xyz / jnp.clip(d, 1e-8) * jnp.expm1(d)
    conf = 1.0 + jnp.exp(fmap[..., 3])
    return pts, conf


def main():
    print("devices:", jax.devices(), flush=True)
    B, H, W = 8, 192, 256
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((B, H, W, 128)), jnp.float32)
    w2 = jnp.asarray(r.standard_normal((3, 3, 128, 32)) * 0.05, jnp.float32)
    b2 = jnp.asarray(r.standard_normal((32,)) * 0.01, jnp.float32)
    w3 = jnp.asarray(r.standard_normal((32, 4)) * 0.05, jnp.float32)
    b3 = jnp.asarray(r.standard_normal((4,)) * 0.01, jnp.float32)

    # correctness vs matmul upsample
    up_ref = jax.jit(upsample2x_align_corners)
    up_pl = jax.jit(up2x_phase_pallas)
    t0 = time.perf_counter()
    uph = up_pl(x)
    sync(uph)
    print(f"pallas compile {time.perf_counter() - t0:.1f}s", flush=True)
    uref = up_ref(x)
    # reassemble
    uph5 = uph.reshape(B, H, W, 2, 2, 128)
    fine = uph5.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, 128)
    print(f"up maxdiff {float(jnp.max(jnp.abs(fine - uref))):.2e}", flush=True)

    print(f"up2x matmul      : {timeit(up_ref, x):7.2f} ms", flush=True)
    print(f"up2x pallas-phase: {timeit(up_pl, x):7.2f} ms", flush=True)

    @jax.jit
    def tail0(x):
        u = upsample2x_align_corners(x)
        o = conv2d(u, w2) + b2
        o = jax.nn.relu(o)
        o = jnp.einsum("bhwc,cn->bhwn", o, w3) + b3
        return post_packed(o)

    w2c = conv2_weight_s2d(w2)
    b2c = jnp.tile(b2, 4)
    w3c = conv3_weight_bd(w3)
    b3c = jnp.tile(b3, 4)

    @jax.jit
    def tail_pl(x):
        u = up2x_phase_pallas(x)
        o = conv2d(u, w2c) + b2c
        o = jax.nn.relu(o)
        o = jnp.einsum("bhwc,cn->bhwn", o, w3c) + b3c
        o = o.reshape(B, H, W, 2, 2, 4)
        o = o.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, 4)
        return post_split(o[..., 0], o[..., 1], o[..., 2], o[..., 3])

    r0 = tail0(x)
    r1 = tail_pl(x)
    dp = float(jnp.max(jnp.abs(r1[0] - r0[0])))
    rel = dp / float(jnp.max(jnp.abs(r0[0])))
    print(f"tail maxdiff {dp:.2e} (rel {rel:.2e})", flush=True)
    print(f"tail0 (current)  : {timeit(tail0, x):7.2f} ms", flush=True)
    print(f"tail pallas+s2d  : {timeit(tail_pl, x):7.2f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
