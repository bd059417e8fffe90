"""Tail kernel iteration 2.

v1 (exp_tailk_r2) was 12.2 ms vs 7.7 XLA: in-kernel jnp.pad copies and the
(RB,W,C)->(RB*W,C) reshape relayout dominate. Variants here:
  P  : conv3(1x1 32->4) + postprocess ONLY (input = relu'd conv2 output
       (B,H,W,32)); conv2 stays XLA. The postprocess lane underfill
       (4.49 ms) and conv3 (0.45) are the cleanly-fusable part.
  F3 : full conv2 kernel, 3D dot_general (no reshape), halo via two extra
       row inputs, W shifts by pltpu.roll-free slicing on a PRE-PADDED W
       axis (pad W once outside: (B,H,W+2,C) - one cheap XLA pad).
"""
import functools, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


def timeit(f, *a, iters=10, rounds=4):
    out = f(*a); sync(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        sync(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


# ---- variant P: conv3 + postprocess --------------------------------------
RBP = 32


def _post_kernel(h_ref, w3_ref, b3_ref, pts_ref, conf_ref):
    h = h_ref[0]                      # (RBP, W, 32) fp32
    o4 = jax.lax.dot_general(
        h, w3_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b3_ref[0]  # (RBP, W, 4)
    xyz = o4[..., :3]
    d = jnp.sqrt(jnp.sum(xyz * xyz, axis=-1, keepdims=True))
    pts_ref[0] = xyz / jnp.maximum(d, 1e-8) * (jnp.exp(d) - 1.0)
    conf_ref[0] = 1.0 + jnp.exp(o4[..., 3])


@jax.jit
def post_pallas(h, w3, b3):
    B, H, W, C = h.shape
    return pl.pallas_call(
        _post_kernel,
        grid=(B, H // RBP),
        in_specs=[
            pl.BlockSpec((1, RBP, W, C), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 4), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RBP, W, 3), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RBP, W), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, H, W, 3), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, W), jnp.float32)],
    )(h, w3, b3.reshape(1, 4))


@jax.jit
def post_xla(h, w3, b3):
    o4 = jnp.einsum("bhwc,cd->bhwd", h, w3) + b3
    xyz = o4[..., :3]
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    return (xyz / jnp.clip(d, 1e-8) * jnp.expm1(d), 1.0 + jnp.exp(o4[..., 3]))


# ---- variant F3: full tail, 3D dots, pre-padded W ------------------------
RBF = 16


def _tail3_kernel(y_ref, top_ref, bot_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                  pts_ref, conf_ref, *, W, mm_dtype):
    Cin = y_ref.shape[-1]
    ycat = jnp.concatenate([top_ref[0, 0], y_ref[0], bot_ref[0, 0]],
                           axis=0).astype(mm_dtype)  # (RBF+2, W+2, Cin)
    acc = jnp.zeros((RBF, W, 32), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sh = ycat[dy:dy + RBF, dx:dx + W]          # (RBF, W, Cin)
            acc = acc + jax.lax.dot_general(
                sh, w2_ref[dy * 3 + dx].astype(mm_dtype),
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    h = jnp.maximum(acc + b2_ref[0], 0.0)
    o4 = jax.lax.dot_general(h.astype(mm_dtype),
                             w3_ref[...].astype(mm_dtype),
                             (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) + b3_ref[0]
    xyz = o4[..., :3]
    d = jnp.sqrt(jnp.sum(xyz * xyz, axis=-1, keepdims=True))
    pts_ref[0] = xyz / jnp.maximum(d, 1e-8) * (jnp.exp(d) - 1.0)
    conf_ref[0] = 1.0 + jnp.exp(o4[..., 3])


@functools.partial(jax.jit, static_argnames=("mm",))
def tail3_pallas(y, w2, b2, w3, b3, mm="bf16"):
    B, H, W, C = y.shape
    NB = H // RBF
    yp = jnp.pad(y, ((0, 0), (0, 0), (1, 1), (0, 0)))  # W+2
    z = jnp.zeros((B, 1, W + 2, C), y.dtype)
    top = jnp.concatenate([z, yp[:, RBF - 1::RBF][:, :-1]], 1).reshape(
        B, NB, 1, W + 2, C)
    bot = jnp.concatenate([yp[:, RBF::RBF], z], 1).reshape(
        B, NB, 1, W + 2, C)
    w2r = w2.reshape(9, C, 32)
    mm_dtype = jnp.bfloat16 if mm == "bf16" else jnp.float32
    kernel = functools.partial(_tail3_kernel, W=W, mm_dtype=mm_dtype)
    return pl.pallas_call(
        kernel,
        grid=(B, NB),
        in_specs=[
            pl.BlockSpec((1, RBF, W + 2, C), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, W + 2, C), lambda b, r: (b, r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, W + 2, C), lambda b, r: (b, r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, C, 32), lambda b, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 4), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RBF, W, 3), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RBF, W), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, H, W, 3), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, W), jnp.float32)],
    )(yp, top, bot, w2r, b2.reshape(1, 32), w3, b3.reshape(1, 4))


def tail_xla(y, w2, b2, w3, b3):
    out = jax.lax.conv_general_dilated(
        y, w2, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2
    out = jnp.maximum(out, 0.0)
    return post_xla(out, w3, b3)


def main():
    print("devices:", jax.devices(), flush=True)
    B, H, W, C = 8, 384, 512, 128
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.3, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C, 32)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(32) * 0.05, jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((32, 4)) * 0.2, jnp.float32)
    b3 = jnp.asarray(rng.standard_normal(4) * 0.1, jnp.float32)

    # variant P inputs
    hrelu = jnp.maximum(jax.lax.conv_general_dilated(
        y, w2, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2, 0.0)
    refp = post_xla(hrelu, w3, b3)
    t = timeit(post_xla, hrelu, w3, b3)
    print(f"post xla          : {t:7.3f} ms", flush=True)
    outp = post_pallas(hrelu, w3, b3)
    err = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(outp, refp)]
    t = timeit(post_pallas, hrelu, w3, b3)
    print(f"post pallas       : {t:7.3f} ms  maxdiff {err}", flush=True)

    reft = tail_xla(y, w2, b2, w3, b3)
    t = timeit(jax.jit(tail_xla), y, w2, b2, w3, b3)
    print(f"tail xla          : {t:7.3f} ms", flush=True)
    for mm in ("bf16", "f32"):
        t0 = time.perf_counter()
        out = tail3_pallas(y, w2, b2, w3, b3, mm=mm)
        sync(out[0])
        print(f"  compile[{mm}]: {time.perf_counter() - t0:.1f}s", flush=True)
        rel = [float(jnp.sqrt(jnp.mean((a - b) ** 2))
                     / jnp.maximum(jnp.sqrt(jnp.mean(b ** 2)), 1e-9))
               for a, b in zip(out, reft)]
        t = timeit(functools.partial(tail3_pallas, mm=mm), y, w2, b2, w3, b3)
        print(f"tail3 pallas[{mm:4}]: {t:7.3f} ms  relRMSE {rel}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
