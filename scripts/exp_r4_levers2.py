"""Round-4 follow-up: the best serving combo (int8 + bf16 heads + MATMUL
upsample — exp_r4_levers showed lerp loses ~6 ms), full model and
scene-graph. Background task, no kill timeout (tunnel rules)."""
import sys
import time

sys.path.insert(0, "/root/repo")

from exp_r4_levers import (gemm_yardstick, full_model, scene_graph, log)


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

    f32, b16 = jnp.float32, jnp.bfloat16
    a = full_model(params, f32, "matmul", False, "a base (recheck)")
    g = full_model(params, b16, "matmul", True, "g int8+bf16h+matmul")
    gemm_yardstick()
    sg_base = scene_graph(params, None, f32, "matmul", "base (recheck)")
    sg_best = scene_graph(params, "int8", b16, "matmul", "int8+bf16h")
    gemm_yardstick()
    log(f"RESULTS a={a:.2f} g={g:.2f} sg_base={sg_base:.2f} "
        f"sg_best={sg_best:.2f}")


if __name__ == "__main__":
    main()
