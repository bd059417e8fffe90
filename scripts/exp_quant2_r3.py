"""Round-3 probe 2: where does the int8 QuantDense lose its gemm win?

Full-model int8 measured 0.97x bf16 (exp_quant_r3). This isolates one
Dense at the encoder MLP shapes (the biggest quantized gemms) and times:
  a) bf16 Dense (production path)
  b) QuantDense as shipped (fp32 quant math, per-token scales)
  c) bf16 quant math with power-of-2 scales (exact in bf16; halves the
     quantization pass HBM traffic)
  d) int8 dot alone on pre-quantized activations (the ideal floor)
Chained in-graph (dependent reps) so dispatch overhead is excluded.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

M, K, N = 12288, 1024, 4096  # enc fc1 at B=8 pairs


def log(*a):
    print(*a, flush=True)


def timeit(f, *a, iters=8, rounds=3):
    out = f(*a)
    _ = float(jnp.sum(jnp.ravel(out)[:1]))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        _ = float(jnp.sum(jnp.ravel(out)[:1]))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def chain(step, reps):
    def f(x, *w):
        acc = x
        for _ in range(reps):
            y = step(acc, *w)
            acc = (y[:, :x.shape[1]]).astype(x.dtype)
        return acc
    return jax.jit(f)


def marginal(step, x, *w, lo=2, hi=8):
    return (timeit(chain(step, hi), x, *w)
            - timeit(chain(step, lo), x, *w)) / (hi - lo)


def main():
    log(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    xb = jax.random.normal(key, (M, K), jnp.bfloat16)
    wb = jax.random.normal(key, (K, N), jnp.bfloat16)
    wq = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
    sw = jnp.abs(jax.random.normal(key, (N,))) + 0.01

    def dense_bf16(x, w):
        return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def qdense_f32(x, w, s):
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), -1, keepdims=True),
                         1e-12) / 127.0
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * sx * s

    def qdense_bf16_po2(x, w, s):
        amax = jnp.max(jnp.abs(x), -1, keepdims=True).astype(jnp.float32)
        # power-of-2 scale: bf16 multiply by 2^-e is EXACT
        e = jnp.ceil(jnp.log2(jnp.maximum(amax, 1e-12) / 127.0))
        inv = jnp.exp2(-e).astype(jnp.bfloat16)
        xq = jnp.round(x * inv).astype(jnp.int8)  # |xq| <= 127 by scale
        acc = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * jnp.exp2(e) * s

    def int8_dot(xq, w):
        return jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    gf = 2 * M * K * N / 1e9
    t_b = marginal(dense_bf16, xb, wb)
    log(f"a) bf16 dense        : {t_b:7.3f} ms  {gf / t_b:6.1f} TF/s")
    t_q = marginal(qdense_f32, xb, wq, sw)
    log(f"b) qdense fp32 math  : {t_q:7.3f} ms  {gf / t_q:6.1f} TOPS-eq")
    t_p = marginal(qdense_bf16_po2, xb, wq, sw)
    log(f"c) qdense bf16 po2   : {t_p:7.3f} ms  {gf / t_p:6.1f} TOPS-eq")
    xq8 = jax.random.randint(key, (M, K), -127, 127, jnp.int8)

    def int8_chain(x, w):
        acc = x
        for _ in range(8):
            y = int8_dot(acc, w)
            acc = jnp.clip(y[:, :K] >> 8, -127, 127).astype(jnp.int8)
        return acc

    def int8_chain2(x, w):
        acc = x
        for _ in range(2):
            y = int8_dot(acc, w)
            acc = jnp.clip(y[:, :K] >> 8, -127, 127).astype(jnp.int8)
        return acc

    t8 = (timeit(jax.jit(int8_chain), xq8, wq)
          - timeit(jax.jit(int8_chain2), xq8, wq)) / 6
    log(f"d) int8 dot floor    : {t8:7.3f} ms  {gf / t8:6.1f} TOPS")
    log("DONE")


if __name__ == "__main__":
    main()
