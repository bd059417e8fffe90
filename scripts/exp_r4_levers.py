"""Round-4 perf levers, measured on the real v5e (VERDICT r3 item 2).

Configs on the full 512_dpt pair forward @384x512 B=8 (params shared):
  a. baseline: bf16 compute, fp32 heads, matmul upsample  (r3 headline)
  b. + lerp upsample (real-FLOP formulation, heads fp32)
  c. + bf16 heads (matmul upsample)
  d. + bf16 heads + lerp upsample
  e. int8 blocks (current serving mode), fp32 heads, matmul
  f. int8 + bf16 heads + lerp (max serving config)
Plus: int8-vs-bf16 isolation at the DPT 1x1 shapes (K=256/128), and the
scene-graph engine (bs=16) under baseline vs max-serving.

Run as a background task WITHOUT a kill timeout (CLAUDE.md tunnel rules).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, flush=True)


def sync_scalar(x):
    import jax.numpy as jnp
    return float(jnp.sum(x[..., 0] if x.ndim else x))


def gemm_yardstick():
    import jax, jax.numpy as jnp
    a = jax.random.normal(jax.random.PRNGKey(0), (8192, 8192), jnp.bfloat16)
    f = jax.jit(lambda a, b: a @ b)
    c = f(a, a); _ = float(jnp.sum(c[:1, :1]))
    for _i in range(3):
        c = f(a, c)
    _ = float(jnp.sum(c[:1, :1]))
    best = float("inf")
    for _r in range(2):
        t0 = time.perf_counter()
        for _i in range(15):
            c = f(a, c)
        _ = float(jnp.sum(c[:1, :1]))
        best = min(best, (time.perf_counter() - t0) / 15)
    tf = 2 * 8192 ** 3 / best / 1e12
    log(f"gemm yardstick: {tf:.1f} TF/s (healthy ~154-213)")
    return tf


def full_model(params, head_dtype, upsample, quantize, tag,
               B=8, H=384, W=512, iters=15):
    import jax, jax.numpy as jnp
    from dust3r_tpu.models.model import dust3r_512_dpt
    from dust3r_tpu.models import heads as heads_mod

    heads_mod.set_upsample_impl(upsample)
    model = dust3r_512_dpt(dtype=jnp.bfloat16, head_dtype=head_dtype)
    p = params
    if quantize:
        from dust3r_tpu.ops.quant import quantize_for_inference
        model, p = quantize_for_inference(model, params)
        _ = float(jnp.sum(p["params"]["enc_norm"]["ln"]["scale"]))

    imgs = [jax.random.normal(jax.random.PRNGKey(i), (B, H, W, 3),
                              jnp.float32) for i in range(4)]

    @jax.jit
    def fwd(p, i1, i2):
        r1, r2 = model.apply(p, i1, i2)
        return (r1["pts3d"], r1["conf"], r2["pts3d_in_other_view"],
                r2["conf"])

    t0 = time.perf_counter()
    out = fwd(p, imgs[0], imgs[1])
    _ = sync_scalar(out[0])
    log(f"[{tag}] compile+first: {time.perf_counter() - t0:.1f}s")
    for i in range(3):
        out = fwd(p, imgs[i % 4], imgs[(i + 1) % 4])
    _ = sync_scalar(out[0])
    t0 = time.perf_counter()
    for i in range(iters):
        out = fwd(p, imgs[i % 4], imgs[(i + 1) % 4])
    _ = sync_scalar(out[0])
    dt = (time.perf_counter() - t0) / iters
    log(f"[{tag}] {dt * 1e3:.1f} ms/iter = {B / dt:.2f} pairs/s")
    heads_mod.set_upsample_impl(None)
    return B / dt


def int8_isolation():
    """int8 vs bf16 dot at the DPT 1x1 shapes (K=256 out_convs, K=128
    head tail); exp_int8_r3 measured K>=1024 good / K=64 bad."""
    import jax, jax.numpy as jnp

    def bench_dot(M, K, N, dtype):
        if dtype == "int8":
            x = jax.random.randint(jax.random.PRNGKey(0), (M, K), -127, 127,
                                   jnp.int8)
            w = jax.random.randint(jax.random.PRNGKey(1), (K, N), -127, 127,
                                   jnp.int8)
            f = jax.jit(lambda x, w: jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32))
        else:
            x = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
            w = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16)
            f = jax.jit(lambda x, w: jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        y = f(x, w); _ = sync_scalar(y[:1, :1].astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(30):
            y = f(x, w)
        _ = sync_scalar(y[:1, :1].astype(jnp.float32))
        dt = (time.perf_counter() - t0) / 30
        return 2 * M * K * N / dt / 1e12

    for (M, K, N, name) in (
            (8 * 96 * 128, 256, 256, "rn1 out_conv"),
            (8 * 192 * 256, 256, 256, "rn1-res out_conv"),
            (8 * 48 * 64, 256, 256, "rn2 out_conv"),
            (8 * 192 * 256, 256, 128, "head_conv1-as-dot"),
            (8 * 384 * 512, 128, 32, "head_conv2-as-dot"),
    ):
        t8 = bench_dot(M, K, N, "int8")
        tb = bench_dot(M, K, N, "bf16")
        log(f"[int8-iso] {name} ({M}x{K}x{N}): int8 {t8:.0f} vs bf16 "
            f"{tb:.0f} T/s -> {t8 / tb:.2f}x")


def scene_graph(params32, quantize, head_dtype, upsample, tag, n_imgs=10,
                H=384, W=512):
    import jax, jax.numpy as jnp
    from dust3r_tpu.models.model import dust3r_512_dpt
    from dust3r_tpu.models import heads as heads_mod
    from dust3r_tpu.inference import InferenceEngine
    from dust3r_tpu.image_pairs import make_pairs

    heads_mod.set_upsample_impl(upsample)
    model = dust3r_512_dpt(dtype=jnp.bfloat16, head_dtype=head_dtype)
    rng = np.random.default_rng(0)
    views = [dict(img=jnp.asarray(
                      rng.standard_normal((1, H, W, 3)).astype(np.float32)),
                  true_shape=np.int32([[H, W]]), idx=i, instance=str(i))
             for i in range(n_imgs)]
    engine = InferenceEngine(model, params32, batch_size=16,
                             quantize=quantize)
    pairs = make_pairs(views, "complete", symmetrize=True)
    warm = engine.infer_pairs(pairs, to_cpu=False)
    _ = float(jnp.sum(warm["pred1"]["pts3d"][-1][0, 0]))
    best = 0.0
    for rep in range(2):
        t0 = time.perf_counter()
        out = engine.infer_pairs(pairs, to_cpu=False)
        _ = float(jnp.sum(out["pred1"]["pts3d"][-1][0, 0]))
        dt = time.perf_counter() - t0
        best = max(best, len(pairs) / dt)
    log(f"[scene-graph {tag}] {best:.2f} pairs/s ({len(pairs)} pairs)")
    heads_mod.set_upsample_impl(None)
    return best


def main():
    import jax, jax.numpy as jnp
    from dust3r_tpu.models.model import dust3r_512_dpt

    log(f"devices: {jax.devices()}")
    gemm_yardstick()

    model = dust3r_512_dpt(dtype=jnp.bfloat16)

    @jax.jit
    def init_bf16(k, i1, i2):
        p = model.init(k, i1, i2)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32
            else x, p)

    t0 = time.perf_counter()
    probe = jnp.zeros((1, 384, 512, 3), jnp.float32)
    params = init_bf16(jax.random.PRNGKey(2), probe, probe)
    _ = float(jnp.sum(params["params"]["enc_norm"]["ln"]["scale"]))
    log(f"param init: {time.perf_counter() - t0:.1f}s")

    f32 = jnp.float32
    b16 = jnp.bfloat16
    res = {}
    res["a_base"] = full_model(params, f32, "matmul", False, "a base")
    res["b_lerp"] = full_model(params, f32, "lerp", False, "b lerp")
    res["c_bf16h"] = full_model(params, b16, "matmul", False, "c bf16-heads")
    res["d_bf16h_lerp"] = full_model(params, b16, "lerp", False,
                                     "d bf16-heads+lerp")
    res["e_int8"] = full_model(params, f32, "matmul", True, "e int8")
    res["f_int8_max"] = full_model(params, b16, "lerp", True,
                                   "f int8+bf16h+lerp")
    gemm_yardstick()  # chip state after the big section

    int8_isolation()

    scene_graph(params, None, f32, "matmul", "base")
    scene_graph(params, "int8", f32, "matmul", "int8")
    scene_graph(params, "int8", b16, "lerp", "int8+bf16h+lerp")
    gemm_yardstick()

    log("RESULTS " + " ".join(f"{k}={v:.2f}" for k, v in res.items()))


if __name__ == "__main__":
    main()
