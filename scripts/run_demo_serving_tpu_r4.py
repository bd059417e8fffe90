"""Drive the SERVING config (int8 block gemms + bf16 heads — the
demo/visloc `--serving` flag added in round 4) end-to-end on the real
TPU: get_reconstructed_scene with the full 512_dpt model (random init),
4 synthetic images, complete symmetrized graph, 300-iter alignment,
scene export. Fresh on-chip evidence for the product path behind the
104.6 pairs/s scene-graph serving number (scripts/exp_r4_levers2.py).

Run as a background task WITHOUT a kill timeout (tunnel rules).
"""
import os
import os.path as osp
import sys
import tempfile
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import cv2

    print("devices:", jax.devices(), flush=True)

    from dust3r_tpu.models.model import dust3r_512_dpt
    from dust3r_tpu.inference import InferenceEngine
    import dust3r_tpu.demo as demo_mod

    # the --serving model config (demo.py/visloc.py flag)
    model = dust3r_512_dpt(dtype=jnp.bfloat16, head_dtype=jnp.bfloat16)

    @jax.jit
    def init_bf16(k, i1, i2):
        p = model.init(k, i1, i2)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p)

    probe = jnp.zeros((1, 384, 512, 3), jnp.float32)
    t0 = time.perf_counter()
    params = init_bf16(jax.random.PRNGKey(0), probe, probe)
    _ = float(jnp.sum(params["params"]["enc_norm"]["ln"]["scale"]))
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)
    engine = InferenceEngine(model, params, batch_size=8, quantize="int8")

    out_dir = tempfile.mkdtemp(prefix="demo_serving_tpu_")
    rng = np.random.default_rng(0)
    files = []
    for i in range(4):
        img = rng.integers(0, 255, (600, 800, 3), dtype=np.uint8)
        p = osp.join(out_dir, f"img{i}.jpg")
        cv2.imwrite(p, img)
        files.append(p)

    t0 = time.perf_counter()
    scene, outfile, gallery = demo_mod.get_reconstructed_scene(
        out_dir, engine, "tpu", False, 512, files,
        schedule="cosine", niter=300, min_conf_thr=3.0,
        as_pointcloud=True, mask_sky=False, clean_depth=True,
        transparent_cams=False, cam_size=0.05,
        scenegraph_type="complete", winsize=1, refid=0)
    dt = time.perf_counter() - t0
    size = osp.getsize(outfile) / 1e6 if osp.isfile(outfile) else 0
    print(f"demo serving e2e: {dt:.1f}s total (incl. first-run compiles); "
          f"scene file {outfile} ({size:.1f} MB); "
          f"gallery entries {len(gallery)}", flush=True)
    assert len(gallery) == 12 and size > 0.5
    print("OK", flush=True)


if __name__ == "__main__":
    main()
