"""Scene-graph serving batch-size sweep (int8 + bf16 heads halve HBM per
pair vs round-2's bf16 sweep, so the bs=16 optimum may have moved) + one
real-chip exercise of bench.py's --mesh aligner path (1-device mesh).
Background task, no kill timeout."""
import sys
import time

sys.path.insert(0, "/root/repo")

from exp_r4_levers import gemm_yardstick, log


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

    probe = jnp.zeros((1, 384, 512, 3), jnp.float32)
    params = init_bf16(jax.random.PRNGKey(2), probe, probe)
    _ = float(jnp.sum(params["params"]["enc_norm"]["ln"]["scale"]))

    results = {}
    for bs in (16, 24, 32, 8):
        # same timing protocol as exp_r4_levers.scene_graph (sweep numbers
        # must stay comparable to the levers-table numbers), with the
        # engine batch size as the swept variable
        import numpy as np
        from dust3r_tpu.inference import InferenceEngine
        from dust3r_tpu.image_pairs import make_pairs

        m = dust3r_512_dpt(dtype=jnp.bfloat16, head_dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        views = [dict(img=jnp.asarray(rng.standard_normal(
                          (1, 384, 512, 3)).astype(np.float32)),
                      true_shape=np.int32([[384, 512]]), idx=i,
                      instance=str(i)) for i in range(10)]
        engine = InferenceEngine(m, params, batch_size=bs, quantize="int8")
        pairs = make_pairs(views, "complete", symmetrize=True)
        warm = engine.infer_pairs(pairs, to_cpu=False)
        _ = float(jnp.sum(warm["pred1"]["pts3d"][-1][0, 0]))
        best = 0.0
        for rep in range(2):
            t0 = time.perf_counter()
            out = engine.infer_pairs(pairs, to_cpu=False)
            _ = float(jnp.sum(out["pred1"]["pts3d"][-1][0, 0]))
            best = max(best, len(pairs) / (time.perf_counter() - t0))
        log(f"[sg serving bs={bs}] {best:.2f} pairs/s")
        results[bs] = best

    gemm_yardstick()
    log("SWEEP " + " ".join(f"bs{k}={v:.2f}" for k, v in results.items()))

    # --mesh aligner flag on the real chip (1-device image-axis mesh)
    import bench
    bench.BUDGET_S = 1e9  # not the driver run; no gating
    res = bench.bench_aligner_iters_per_sec(n_imgs=10, dtypes=("bf16",),
                                            mesh=True)
    log(f"aligner --mesh (1-dev): {res['bf16-obs']:.1f} it/s")


if __name__ == "__main__":
    main()
