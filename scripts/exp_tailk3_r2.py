"""Tail v3: pure-XLA layout fixes, no pallas.

Insight from v1/v2 failures: narrow-lane (C=4, C=1) tensors are 128-lane
padded in VMEM even inside pallas kernels - the fix is to keep the
transcendental chain on DENSE (B, H, W) arrays (lanes = W), touching
narrow layouts only for single mul/reduce ops.

  base  : current tail (conv2 fp32 -> relu -> conv3 -> postprocess w/
          keepdims norm chain on (B,H,W,1))
  postD : postprocess computes d/expm1 on squeezed (B,H,W) arrays
  bf16c : postD + conv2/conv3 matmul inputs cast to bf16 (fp32 accum)
"""
import functools, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp


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


def conv2d(y, w, dtype=None):
    if dtype is not None:
        y, w = y.astype(dtype), w.astype(dtype)
    return jax.lax.conv_general_dilated(
        y, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


@jax.jit
def tail_base(y, w2, b2, w3, b3):
    out = jnp.maximum(conv2d(y, w2) + b2, 0.0)
    o4 = jnp.einsum("bhwc,cd->bhwd", out, w3) + b3
    xyz = o4[..., :3]
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    pts = xyz / jnp.clip(d, 1e-8) * jnp.expm1(d)
    conf = 1.0 + jnp.exp(o4[..., 3])
    return pts, conf


@jax.jit
def tail_postD(y, w2, b2, w3, b3):
    out = jnp.maximum(conv2d(y, w2) + b2, 0.0)
    o4 = jnp.einsum("bhwc,cd->bhwd", out, w3) + b3
    xyz = o4[..., :3]
    d2 = jnp.sum(xyz * xyz, axis=-1)          # (B,H,W) dense
    d = jnp.sqrt(d2)
    r = jnp.expm1(d) / jnp.clip(d, 1e-8)      # dense transcendentals
    pts = xyz * r[..., None]
    conf = 1.0 + jnp.exp(o4[..., 3])          # (B,H,W) dense
    return pts, conf


@jax.jit
def tail_bf16c(y, w2, b2, w3, b3):
    out = jnp.maximum(conv2d(y, w2, jnp.bfloat16) + b2, 0.0)
    o4 = jnp.einsum("bhwc,cd->bhwd", out.astype(jnp.bfloat16),
                    w3.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + b3
    xyz = o4[..., :3]
    d2 = jnp.sum(xyz * xyz, axis=-1)
    d = jnp.sqrt(d2)
    r = jnp.expm1(d) / jnp.clip(d, 1e-8)
    pts = xyz * r[..., None]
    conf = 1.0 + jnp.exp(o4[..., 3])
    return pts, conf


def main():
    print("devices:", jax.devices(), flush=True)
    B, H, W, C = 8, 384, 512, 128
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.3, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C, 32)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(32) * 0.05, jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((32, 4)) * 0.2, jnp.float32)
    b3 = jnp.asarray(rng.standard_normal(4) * 0.1, jnp.float32)

    ref = tail_base(y, w2, b2, w3, b3)
    for name, f in (("base", tail_base), ("postD", tail_postD),
                    ("bf16c", tail_bf16c)):
        out = f(y, w2, b2, w3, b3)
        rel = [float(jnp.sqrt(jnp.mean((a - b) ** 2))
                     / jnp.maximum(jnp.sqrt(jnp.mean(b ** 2)), 1e-9))
               for a, b in zip(out, ref)]
        t = timeit(f, y, w2, b2, w3, b3)
        print(f"tail {name:6}: {t:7.3f} ms  relRMSE {rel[0]:.2e}/{rel[1]:.2e}",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()


@jax.jit
def tail_bf16s(y_bf, w2_bf, b2, w3_bf, b3):
    """bf16 STORED inputs/weights (casts cannot be elided by
    --xla_allow_excess_precision, unlike in-graph f32->bf16->f32)."""
    out = jnp.maximum(conv2d(y_bf, w2_bf) + b2, 0.0)  # fp32 accum
    o4 = jnp.einsum("bhwc,cd->bhwd", out.astype(jnp.bfloat16), w3_bf,
                    preferred_element_type=jnp.float32) + b3
    xyz = o4[..., :3]
    d = jnp.sqrt(jnp.sum(xyz * xyz, axis=-1))
    r = jnp.expm1(d) / jnp.clip(d, 1e-8)
    pts = xyz * r[..., None]
    conf = 1.0 + jnp.exp(o4[..., 3])
    return pts, conf


def main2():
    print("devices:", jax.devices(), flush=True)
    B, H, W, C = 8, 384, 512, 128
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.3, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C, 32)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(32) * 0.05, jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((32, 4)) * 0.2, jnp.float32)
    b3 = jnp.asarray(rng.standard_normal(4) * 0.1, jnp.float32)
    ref = tail_base(y, w2, b2, w3, b3)
    yb, w2b, w3b = (t.astype(jnp.bfloat16) for t in (y, w2, w3))
    out = tail_bf16s(yb, w2b, b2, w3b, b3)
    rel = [float(jnp.sqrt(jnp.mean((a - b) ** 2))
                 / jnp.maximum(jnp.sqrt(jnp.mean(b ** 2)), 1e-9))
           for a, b in zip(out, ref)]
    t = timeit(tail_bf16s, yb, w2b, b2, w3b, b3)
    print(f"tail bf16-stored: {t:7.3f} ms  relRMSE {rel[0]:.2e}/{rel[1]:.2e}",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__" and "--stored" in sys.argv:
    main2()
