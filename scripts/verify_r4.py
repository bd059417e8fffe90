"""/verify driver (round 4): end-to-end train CLI + inference pipeline on
the CPU virtual mesh, per .claude/skills/verify/SKILL.md.

Run: XLA_FLAGS="--xla_force_host_platform_device_count=8" \
     DUST3R_TPU_NO_PALLAS=1 python scripts/verify_r4.py
"""
import jax
jax.config.update("jax_platforms", "cpu")  # must precede any jnp use

import json
import os
import os.path as osp
import sys
import tempfile

import numpy as np
import cv2

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))


from co3d_fixture import make_co3d_fixture  # noqa: E402 - shared fixture


def drive_train_cli(fixture, outdir):
    sys.argv = [
        "train.py",
        "--model",
        "AsymmetricCroCo3DStereo(pos_embed='RoPE100', img_size=(64, 64), "
        "head_type='linear', output_mode='pts3d', "
        "depth_mode=('exp', -inf, inf), conf_mode=('exp', 1, inf), "
        "enc_embed_dim=32, enc_depth=1, enc_num_heads=2, dec_embed_dim=32, "
        "dec_depth=1, dec_num_heads=2)",
        "--train_dataset",
        f"16 @ Co3d(split='train', ROOT='{fixture}', resolution=(64,48), "
        "seed=3)",
        "--mesh", "4", "--accum_iter", "2", "--batch_size", "1",
        "--epochs", "2", "--warmup_epochs", "0", "--lr", "1e-4",
        "--output_dir", outdir,
    ]
    with open("/root/repo/train.py") as f:
        code = f.read()
    exec(compile(code, "train.py", "exec"), {"__name__": "__main__"})
    for want in ("checkpoint-last", "checkpoint-final", "log.txt"):
        hits = [p for p in os.listdir(outdir) if p.startswith(want)]
        assert hits, f"missing {want} in {outdir}: {os.listdir(outdir)}"
    print("[verify] train CLI OK:", sorted(os.listdir(outdir))[:6])


def drive_inference_dpt(tmp):
    """images -> load_images -> make_pairs -> inference with a tiny DPT
    model, exercising BOTH upsample impls (matmul + lerp)."""
    import jax.numpy as jnp
    from dust3r_tpu.utils.image import load_images
    from dust3r_tpu.image_pairs import make_pairs
    from dust3r_tpu.inference import inference
    from dust3r_tpu.models.model import AsymmetricCroCo3DStereo
    from dust3r_tpu.models import heads as heads_mod

    rng = np.random.default_rng(1)
    paths = []
    for i in range(3):
        p = osp.join(tmp, f"im{i}.jpg")
        cv2.imwrite(p, rng.integers(0, 255, (120, 160, 3), dtype=np.uint8))
        paths.append(p)
    imgs = load_images(paths, size=224)
    pairs = make_pairs(imgs, "complete", symmetrize=True)
    model = AsymmetricCroCo3DStereo(
        img_size=(224, 224), patch_size=16, enc_embed_dim=64, enc_depth=2,
        enc_num_heads=2, dec_embed_dim=48, dec_depth=12, dec_num_heads=2,
        head_type="dpt", attn_impl="ref")
    probe = jnp.asarray(imgs[0]["img"])
    params = model.init(jax.random.PRNGKey(0), probe, probe)
    outs = {}
    for impl in ("matmul", "lerp"):
        heads_mod.set_upsample_impl(impl)
        jax.clear_caches()
        out = inference(pairs, model, params, batch_size=4, verbose=False)
        pts = np.asarray(out["pred1"]["pts3d"])
        assert np.isfinite(pts).all() and pts.shape[-1] == 3
        outs[impl] = pts
    heads_mod.set_upsample_impl(None)
    # raw-level agreement is ~1e-6; the expm1 postprocess amplifies by
    # ~|d| on random-init weights (tests/test_heads.py discussion)
    d = np.sqrt(np.mean((outs["matmul"] - outs["lerp"]) ** 2))
    assert d < 2e-3, f"upsample impl divergence {d}"
    print(f"[verify] inference pipeline OK (pairs={len(pairs)}, "
          f"upsample impls agree, rmse={d:.2e})")


def main():
    with tempfile.TemporaryDirectory() as tmp:
        fixture = osp.join(tmp, "co3d")
        os.makedirs(fixture)
        make_co3d_fixture(fixture)
        drive_train_cli(fixture, osp.join(tmp, "out"))
        drive_inference_dpt(tmp)
    print("[verify] ALL OK")


if __name__ == "__main__":
    main()
