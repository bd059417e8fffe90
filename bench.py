"""Benchmark harness: image pairs/sec/chip on the flagship config.

Headline metric (BASELINE.md): pairs/sec/chip, 512_dpt @ 512x384, bf16.
Baseline: the torch reference on A100 has no published throughput; the
commonly-reported figure for DUSt3R 512 DPT pair inference on A100 is
~100 ms/pair => 10 pairs/sec. vs_baseline is measured against that
estimate; the 10x-A100 north-star therefore corresponds to value >= 100.

Prints ONE JSON line on stdout; diagnostics go to stderr.

Note: on the axon-tunneled TPU, block_until_ready returns at dispatch
time, so synchronization is forced by fetching a device-computed scalar.
"""
import json
import sys
import time

import numpy as np

A100_REFERENCE_PAIRS_PER_SEC = 10.0  # documented estimate, see docstring


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_PARAMS_CACHE = {}


def _bench_params(model, H, W):
    """Init bf16 params once and reuse across buckets/batch sizes (params
    are shape-independent; re-initializing costs ~2.5 min each on the
    tunneled chip)."""
    import jax
    import jax.numpy as jnp

    key = id(type(model)), model.head_type
    if key in _PARAMS_CACHE:
        return _PARAMS_CACHE[key]

    @jax.jit
    def init_bf16(k, i1, i2):
        p = model.init(k, i1, i2)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, p)

    log(f"init params ({H}x{W}) ...")
    t0 = time.perf_counter()
    probe = jnp.zeros((1, H, W, 3), jnp.float32)
    params = init_bf16(jax.random.PRNGKey(2), probe, probe)
    _ = float(jnp.sum(params["params"]["enc_norm"]["ln"]["scale"]))  # sync
    log(f"init: {time.perf_counter() - t0:.1f}s")
    _PARAMS_CACHE[key] = params
    return params


def bench_pairs_per_sec(batch_size=8, H=384, W=512, iters=20, warmup=3,
                        quantize=False):
    import jax
    import jax.numpy as jnp
    from dust3r_tpu.models.model import dust3r_512_dpt

    model = dust3r_512_dpt(dtype=jnp.bfloat16)

    # several distinct inputs to defeat any dispatch-level caching
    imgs = [jax.random.normal(jax.random.PRNGKey(i), (batch_size, H, W, 3),
                              jnp.float32) for i in range(4)]
    params = _bench_params(model, H, W)
    if quantize:  # int8 serving mode (ops/quant.py; beyond-parity)
        from dust3r_tpu.ops.quant import quantize_for_inference

        model, params = quantize_for_inference(model, params)
        _ = float(jnp.sum(params["params"]["enc_norm"]["ln"]["scale"]))

    @jax.jit
    def fwd(params, img1, img2):
        res1, res2 = model.apply(params, img1, img2)
        return (res1["pts3d"], res1["conf"],
                res2["pts3d_in_other_view"], res2["conf"])

    sync = jax.jit(lambda x: jnp.sum(x[..., 0]))

    log("compiling ...")
    t0 = time.perf_counter()
    out = fwd(params, imgs[0], imgs[1])
    _ = float(sync(out[0]))
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")

    for i in range(warmup):
        out = fwd(params, imgs[i % 4], imgs[(i + 1) % 4])
    _ = float(sync(out[0]))

    t0 = time.perf_counter()
    for i in range(iters):
        out = fwd(params, imgs[i % 4], imgs[(i + 1) % 4])
    _ = float(sync(out[0]))  # scalar fetch = true device sync
    dt = time.perf_counter() - t0
    pairs_per_sec = batch_size * iters / dt
    log(f"steady state: {dt / iters * 1e3:.1f} ms/iter, "
        f"{pairs_per_sec:.2f} pairs/s")
    return pairs_per_sec


def bench_chip_gemm_tf_s(n=8192, iters=20):
    """Chip-state yardstick: sustained bf16 8192^3 gemm TF/s.

    The tunneled v5e has been measured at BOTH ~213 TF/s and ~154 TF/s on
    this exact program hours apart (clock/throttle state; the wedge
    tail CLAUDE.md warns about). Reporting the yardstick next to the
    model numbers makes cross-run comparisons interpretable: pairs/s
    scales with it (128.3 vs 112.1 ms/iter on an identical binary)."""
    import jax
    import jax.numpy as jnp

    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (n, n), jnp.bfloat16)
    f = jax.jit(lambda a, b: a @ b)
    c = f(a, a)
    _ = float(jnp.sum(c[:1, :1]))
    for _i in range(3):
        c = f(a, c)
    _ = float(jnp.sum(c[:1, :1]))
    best = float("inf")
    for _r in range(3):
        t0 = time.perf_counter()
        for _i in range(iters):
            c = f(a, c)
        _ = float(jnp.sum(c[:1, :1]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return 2 * n ** 3 / best / 1e12


def bench_aligner_iters_per_sec(n_imgs=10, H=384, W=512, niter=300,
                                graph="complete", dtypes=("fp32", "bf16")):
    """Global-alignment iterations/sec on a synthetic n-image scene.

    The torch reference runs its 300-iter Adam loop as a python loop
    (~15-30 it/s on GPU); here the whole loop is one lax.scan.
    graph: 'complete' (N*(N-1) edges) or 'swin-k' (the demo's scalable
    window graph) - large N scenes use swin exactly like the reference.
    """
    import numpy as np
    import jax.numpy as jnp
    from dust3r_tpu.cloud_opt import global_aligner, GlobalAlignerMode
    from dust3r_tpu.cloud_opt.commons import make_lr_schedule
    from dust3r_tpu.cloud_opt.optimizer import _run_alignment

    rng = np.random.default_rng(0)
    if graph == "complete":
        edges = [(i, j) for i in range(n_imgs) for j in range(n_imgs)
                 if i != j]
    else:  # swin-k, symmetrized, noncyclic
        k = int(graph.split("-")[1])
        fwd = {(i, min(i + d, n_imgs - 1)) for i in range(n_imgs)
               for d in range(1, k + 1)}
        edges = sorted({e for i, j in fwd if i != j
                        for e in ((i, j), (j, i))})
    E = len(edges)
    out = dict(
        view1=dict(idx=[i for i, j in edges]),
        view2=dict(idx=[j for i, j in edges]),
        pred1=dict(pts3d=rng.uniform(-2, 2, (E, H, W, 3)).astype(np.float32),
                   conf=1 + rng.uniform(1, 5, (E, H, W)).astype(np.float32)),
        pred2=dict(
            pts3d_in_other_view=rng.uniform(-2, 2, (E, H, W, 3)).astype(np.float32),
            conf=1 + rng.uniform(1, 5, (E, H, W)).astype(np.float32)),
    )
    lrs = make_lr_schedule("cosine", niter, 0.01, 1e-6)
    res = {}
    all_dt = [(jnp.bfloat16, "bf16-obs"), (jnp.float32, "fp32-obs")]
    for obs_dtype, tag in [d for d in all_dt if d[1][:4] in dtypes]:
        scene = global_aligner(out,
                               mode=GlobalAlignerMode.PointCloudOptimizer,
                               verbose=False, obs_dtype=obs_dtype)
        t0 = time.perf_counter()
        params, losses = _run_alignment(scene.pts3d_fn, scene.loss_spec,
                                        dict(scene.params),
                                        dict(scene.masks), lrs,
                                        dict(scene.consts))
        _ = float(losses[-1])
        log(f"aligner[{tag}] compile+first {niter} iters: "
            f"{time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        params, losses = _run_alignment(scene.pts3d_fn, scene.loss_spec,
                                        dict(scene.params),
                                        dict(scene.masks), lrs,
                                        dict(scene.consts))
        _ = float(losses[-1])
        dt = time.perf_counter() - t0
        log(f"aligner[{tag}] {graph}: {n_imgs} imgs, {E} edges @ {H}x{W}: "
            f"{niter / dt:.1f} iters/s ({dt:.2f}s for {niter})")
        res[tag] = niter / dt
    # headline value = the product default (bf16 observations, defended
    # by TestBf16ObsAccuracyDelta); fp32 reported alongside
    return res


def bench_scene_graph(n_imgs=10, H=384, W=512, batch_size=8,
                      quantize=None):
    """Pairs/sec through the encoder-caching engine on a complete
    symmetrized scene graph (the aligner/demo workload).

    Each unique image is encoded once and reused across its N-1 pairs -
    the architectural win over the reference's per-pair encoding."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dust3r_tpu.models.model import dust3r_512_dpt
    from dust3r_tpu.inference import InferenceEngine
    from dust3r_tpu.image_pairs import make_pairs

    model = dust3r_512_dpt(dtype=jnp.bfloat16)

    @jax.jit
    def init_bf16(key, i1, i2):
        p = model.init(key, i1, i2)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, p)

    rng = np.random.default_rng(0)
    # stage the images on device up front: through the axon tunnel the
    # host->device copy is slow and would otherwise dominate the timing
    # (irrelevant to real deployments where PCIe/DMA feeds the chip)
    views = [dict(img=jnp.asarray(
                      rng.standard_normal((1, H, W, 3)).astype(np.float32)),
                  true_shape=np.int32([[H, W]]), idx=i, instance=str(i))
             for i in range(n_imgs)]
    probe = views[0]["img"]
    params = init_bf16(jax.random.PRNGKey(0), probe, probe)
    engine = InferenceEngine(model, params, batch_size=batch_size,
                             quantize=quantize)

    pairs = make_pairs(views, "complete", symmetrize=True)
    log(f"scene graph: {n_imgs} images, {len(pairs)} pairs; warmup ...")
    warm = engine.infer_pairs(pairs, to_cpu=False)  # compile + warmup
    _ = float(jnp.sum(warm["pred1"]["pts3d"][-1][0, 0]))  # sync warmup
    best = 0.0
    for rep in range(2):  # tunnel throughput fluctuates; report best rep
        t0 = time.perf_counter()
        out = engine.infer_pairs(pairs, to_cpu=False)
        # device-side sync (results stay on device for the aligner hand-off)
        _ = float(jnp.sum(out["pred1"]["pts3d"][-1][0, 0]))
        dt = time.perf_counter() - t0
        best = max(best, len(pairs) / dt)
        log(f"scene-graph rep{rep}: {len(pairs)} pairs in {dt:.2f}s "
            f"=> {len(pairs) / dt:.2f} pairs/s")
    log(f"scene-graph inference: {best:.2f} pairs/s "
        f"(encoder cached, preds on device)")
    return best


def main():
    import jax
    log(f"devices: {jax.devices()}")
    extras = {}
    try:
        tf_s = bench_chip_gemm_tf_s()
        extras["chip_gemm_tf_s"] = round(tf_s, 1)
        log(f"chip gemm yardstick: {tf_s:.1f} TF/s "
            f"(measured range on this chip: ~154-213)")
    except Exception as e:
        log(f"gemm yardstick failed: {type(e).__name__}: {e}")
    # aligner at the scales the demo actually sees (VERDICT r1 item 5):
    # complete graphs at 10/25 images; 50 images uses the swin graph the
    # reference recommends for large scenes (complete@50 = 2450 edges
    # would need ~15 GB of observation tensors alone).
    for n, graph, dtypes in ((10, "complete", ("fp32", "bf16")),
                             (25, "complete", ("fp32", "bf16")),
                             (50, "swin-3", ("fp32", "bf16"))):
        try:
            res = bench_aligner_iters_per_sec(n_imgs=n, graph=graph,
                                              dtypes=dtypes)
            extras[f"aligner_iters_per_sec_n{n}"] = round(
                res["bf16-obs"], 1)
            if "fp32-obs" in res:
                extras[f"aligner_iters_per_sec_n{n}_fp32obs"] = round(
                    res["fp32-obs"], 1)
        except Exception as e:
            log(f"aligner bench n={n} failed: {type(e).__name__}: {e}")
    try:
        # bs=16 measured +2% over 8 on the 90-pair demo workload
        extras["scene_graph_pairs_per_sec"] = round(
            bench_scene_graph(batch_size=16), 2)
    except Exception as e:
        log(f"scene-graph bench failed: {type(e).__name__}: {e}")
    try:
        # same demo workload through the int8 serving mode (ops/quant.py)
        extras["scene_graph_pairs_per_sec_int8"] = round(
            bench_scene_graph(batch_size=16, quantize="int8"), 2)
    except Exception as e:
        log(f"scene-graph int8 bench failed: {type(e).__name__}: {e}")
    value = None
    good_bs = None
    for bs in (8, 4, 2, 1):
        try:
            value = bench_pairs_per_sec(batch_size=bs)
            good_bs = bs
            break
        except Exception as e:
            log(f"batch_size={bs} failed: {type(e).__name__}: {e}")
    # per-AR-bucket table (the 512 training/inference buckets,
    # README.md:102 / visloc utils.py:23); params shared via _bench_params.
    # Reuse the batch size that worked for the headline - retrying a
    # failed bs costs a full remote compile per bucket.
    if value is not None:
        try:
            # int8 serving mode at the headline shape (measured 1.12x the
            # bf16 path; accuracy contract in tests/test_quant.py)
            extras["pairs_per_sec_512dpt_int8"] = round(
                bench_pairs_per_sec(batch_size=good_bs, quantize=True), 2)
        except Exception as e:
            log(f"int8 bench failed: {type(e).__name__}: {e}")
    if value is not None:
        from dust3r_tpu.utils.flops import mfu_pct, pair_forward_flops

        buckets = {}
        mfu = {}
        for bh, bw in ((336, 512), (288, 512), (256, 512), (160, 512)):
            try:
                pps = bench_pairs_per_sec(batch_size=good_bs, H=bh, W=bw,
                                          iters=10)
                buckets[f"{bw}x{bh}"] = round(pps, 2)
                mfu[f"{bw}x{bh}"] = round(mfu_pct(pps, bh, bw, "dpt"), 1)
            except Exception as e:
                log(f"bucket {bw}x{bh} failed: {type(e).__name__}: {e}")
        buckets["512x384"] = round(value, 2)
        mfu["512x384"] = round(mfu_pct(value, 384, 512, "dpt"), 1)
        extras["pairs_per_sec_by_bucket"] = buckets
        # analytic model-FLOPs utilization vs the v5e nominal bf16 peak
        # (197 TF/s); FLOPs counted as executed (dense upsample matmuls
        # at full matmul cost) - see dust3r_tpu/utils/flops.py
        extras["mfu_pct"] = mfu["512x384"]
        extras["mfu_pct_by_bucket"] = mfu
        extras["model_gflop_per_pair"] = round(
            pair_forward_flops(384, 512, "dpt") / 1e9, 1)
    if value is None:
        print(json.dumps({"metric": "pairs_per_sec_512dpt", "value": 0.0,
                          "unit": "pairs/s/chip", "vs_baseline": 0.0,
                          **extras}))
        return
    print(json.dumps({
        "metric": "pairs_per_sec_512dpt",
        "value": round(value, 2),
        "unit": "pairs/s/chip",
        "vs_baseline": round(value / A100_REFERENCE_PAIRS_PER_SEC, 2),
        **extras,
    }))


if __name__ == "__main__":
    main()
