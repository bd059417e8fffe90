"""Patchify lowering: conv(16x16, stride 16) vs unfold+matmul.

encode() minus 24 block marginals leaves ~7 ms unaccounted at
(16, 384, 512, 3) -> (16, 768, 1024); the patchify gemm floor is ~0.1 ms.
A stride=kernel 'conv' is exactly a block reshape + one dense matmul -
measure whether XLA's conv lowering wastes the difference.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import flax.linen as nn


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


B, H, W, P, D = 16, 384, 512, 16, 1024
rng = np.random.default_rng(0)
img = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)
k = jnp.asarray(rng.standard_normal((P, P, 3, D)) * 0.02, jnp.bfloat16)
b = jnp.asarray(rng.standard_normal(D) * 0.02, jnp.bfloat16)
print("devices:", jax.devices(), flush=True)


@jax.jit
def conv_patchify(img):
    x = jax.lax.conv_general_dilated(
        img.astype(jnp.bfloat16), k, (P, P), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (x + b).reshape(B, -1, D)


@jax.jit
def matmul_patchify(img):
    Ht, Wt = H // P, W // P
    x = img.astype(jnp.bfloat16).reshape(B, Ht, P, Wt, P, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Ht * Wt, P * P * 3)
    w = k.reshape(P * P * 3, D)
    return jnp.dot(x, w, preferred_element_type=jnp.bfloat16) + b


o1 = conv_patchify(img)
o2 = matmul_patchify(img)
err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))
print(f"maxdiff: {err:.2e}", flush=True)
print(f"conv patchify   : {timeit(conv_patchify, img):7.3f} ms", flush=True)
print(f"matmul patchify : {timeit(matmul_patchify, img):7.3f} ms", flush=True)
print("DONE", flush=True)


@jax.jit
def matmul_patchify_dense(img):
    """Reshape (B,H,W,3)->(B,H,W*3) FIRST: row-major compatible, so the
    lane dim becomes dense (1536) before any heavy op touches the data."""
    Ht, Wt = H // P, W // P
    x = img.reshape(B, H, W * 3)
    x = x.astype(jnp.bfloat16)
    x = x.reshape(B, Ht, P, Wt, P * 3)
    x = x.transpose(0, 1, 3, 2, 4).reshape(B, Ht * Wt, P * P * 3)
    w = k.reshape(P * P * 3, D)
    return jnp.dot(x, w, preferred_element_type=jnp.bfloat16) + b


img_flat = jnp.asarray(np.asarray(img).reshape(B, H, W * 3))


@jax.jit
def matmul_patchify_preflat(x):
    """Input arrives already (B, H, W*3) (host-side reshape is free)."""
    Ht, Wt = H // P, W // P
    x = x.astype(jnp.bfloat16)
    x = x.reshape(B, Ht, P, Wt, P * 3)
    x = x.transpose(0, 1, 3, 2, 4).reshape(B, Ht * Wt, P * P * 3)
    w = k.reshape(P * P * 3, D)
    return jnp.dot(x, w, preferred_element_type=jnp.bfloat16) + b


if "--dense" in sys.argv:
    o3 = matmul_patchify_dense(img)
    err = float(jnp.max(jnp.abs(o2.astype(jnp.float32) - o3.astype(jnp.float32))))
    print(f"dense maxdiff: {err:.2e}", flush=True)
    print(f"matmul dense    : {timeit(matmul_patchify_dense, img):7.3f} ms",
          flush=True)
    print(f"matmul preflat  : {timeit(matmul_patchify_preflat, img_flat):7.3f} ms",
          flush=True)
    print("DONE2", flush=True)
