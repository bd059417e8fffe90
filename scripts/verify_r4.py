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


def make_co3d_fixture(root):
    rng = np.random.default_rng(0)
    H, W = 96, 128
    focal = 100.0
    selected = {}
    for cat, seq in [("apple", "seq0"), ("apple", "seq1")]:
        frames = list(range(100))
        selected.setdefault(cat, {})[seq] = frames
        base = osp.join(root, cat, seq)
        os.makedirs(osp.join(base, "images"), exist_ok=True)
        os.makedirs(osp.join(base, "depths"), exist_ok=True)
        os.makedirs(osp.join(base, "masks"), exist_ok=True)
        for fn in frames:
            img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            cv2.imwrite(osp.join(base, "images", f"frame{fn:06d}.jpg"), img)
            depth = rng.uniform(1, 4, (H, W)).astype(np.float32)
            max_depth = float(depth.max())
            d16 = (depth / max_depth * 65535).astype(np.uint16)
            cv2.imwrite(osp.join(base, "depths",
                                 f"frame{fn:06d}.jpg.geometric.png"), d16)
            mask = (rng.uniform(size=(H, W)) > 0.2).astype(np.uint8) * 255
            cv2.imwrite(osp.join(base, "masks", f"frame{fn:06d}.png"), mask)
            K = np.float32([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]])
            pose = np.eye(4, dtype=np.float32)
            pose[:3, 3] = rng.standard_normal(3)
            np.savez(osp.join(base, "images", f"frame{fn:06d}.npz"),
                     camera_intrinsics=K, camera_pose=pose,
                     maximum_depth=max_depth)
    with open(osp.join(root, "selected_seqs_train.json"), "w") as f:
        json.dump(selected, f)


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
