"""Round-3 probe: int8 quantized inference, full 512_dpt model, real v5e.

Measures the shipped quantized mode (ops/quant.py) against the bf16
production path at the headline shape (512x384, B=8): pairs/s for both,
plus the on-device pointmap delta between the two paths on identical
inputs/weights. Run as a background task WITHOUT a kill timeout
(CLAUDE.md tunnel rules).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from dust3r_tpu.models.model import dust3r_512_dpt
from dust3r_tpu.ops.quant import quantize_for_inference

B, H, W = 8, 384, 512


def log(*a):
    print(*a, flush=True)


def bench_fwd(model, params, tag, iters=20):
    imgs = [jax.random.normal(jax.random.PRNGKey(i), (B, H, W, 3),
                              jnp.float32) for i in range(4)]

    @jax.jit
    def fwd(p, i1, i2):
        r1, r2 = model.apply(p, i1, i2)
        return (r1["pts3d"], r1["conf"],
                r2["pts3d_in_other_view"], r2["conf"])

    sync = jax.jit(lambda x: jnp.sum(x[..., 0]))
    t0 = time.perf_counter()
    out = fwd(params, imgs[0], imgs[1])
    _ = float(sync(out[0]))
    log(f"[{tag}] compile+first: {time.perf_counter() - t0:.1f}s")
    for i in range(3):
        out = fwd(params, imgs[i % 4], imgs[(i + 1) % 4])
    _ = float(sync(out[0]))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fwd(params, imgs[i % 4], imgs[(i + 1) % 4])
    _ = float(sync(out[0]))
    dt = time.perf_counter() - t0
    log(f"[{tag}] {dt / iters * 1e3:.1f} ms/iter, "
        f"{B * iters / dt:.2f} pairs/s")
    return fwd, imgs, B * iters / dt


def main():
    log(f"devices: {jax.devices()}")
    model = dust3r_512_dpt(dtype=jnp.bfloat16)

    @jax.jit
    def init_bf16(k, i1, i2):
        p = model.init(k, i1, i2)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p)

    probe = jnp.zeros((1, H, W, 3), jnp.float32)
    t0 = time.perf_counter()
    params = init_bf16(jax.random.PRNGKey(2), probe, probe)
    _ = float(jnp.sum(params["params"]["enc_norm"]["ln"]["scale"]))
    log(f"init: {time.perf_counter() - t0:.1f}s")

    fwd_b, imgs, pps_bf16 = bench_fwd(model, params, "bf16")

    t0 = time.perf_counter()
    qmodel, qparams = quantize_for_inference(model, params)
    _ = float(jnp.sum(qparams["params"]["enc_norm"]["ln"]["scale"]))
    log(f"quantize_for_inference: {time.perf_counter() - t0:.1f}s")

    fwd_q, _, pps_int8 = bench_fwd(qmodel, qparams, "int8")

    # on-device accuracy delta between the two paths, one fused program
    @jax.jit
    def delta(p, qp, i1, i2):
        r1, _ = model.apply(p, i1, i2)
        q1, _ = qmodel.apply(qp, i1, i2)
        a = r1["pts3d"].astype(jnp.float32)
        b = q1["pts3d"].astype(jnp.float32)
        rel = jnp.linalg.norm(a - b) / (jnp.linalg.norm(a) + 1e-12)
        crel = (jnp.linalg.norm(r1["conf"] - q1["conf"])
                / (jnp.linalg.norm(r1["conf"]) + 1e-12))
        return rel, crel

    rel, crel = delta(params, qparams, imgs[0], imgs[1])
    log(f"int8 vs bf16 pts3d rel err: {float(rel):.4f}, "
        f"conf rel err: {float(crel):.4f}")
    log(f"SUMMARY bf16={pps_bf16:.2f} int8={pps_int8:.2f} pairs/s "
        f"({pps_int8 / pps_bf16:.2f}x)")
    log("DONE")


if __name__ == "__main__":
    main()
