"""Generate the committed golden artifacts (tests/golden/*.npz).

VERDICT r1 item 6: the 32x48 tiny-model golden only guards the trivial
path. These goldens cover the real 512-bucket shape (512x384 input -> the
full DPT resolution cascade and the 24x32 RoPE position table) for BOTH
head types, plus a 300-iter aligner loss trajectory on a fixed synthetic
scene (reference global alignment defaults, base_opt.py:326,337).

Weights are generated with fixed JAX PRNG keys (threefry is stable across
versions), so the test can rebuild them exactly; the npz stores an
every-4th-pixel subsample of the outputs plus full-tensor moments.

Run on CPU (results are platform-pinned to the CPU backend the test suite
uses): python scripts/make_goldens.py
"""
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

GOLDEN_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                      "tests", "golden")

# small embed dims (speed), REAL structure: dec_depth=12 so the DPT hooks
# sit at the published (0, 6, 9, 12) layers, 512-bucket resolution
BUCKET_CFGS = {
    "dpt": dict(img_size=(512, 512), patch_size=16, head_type="dpt",
                enc_embed_dim=128, enc_depth=4, enc_num_heads=4,
                dec_embed_dim=96, dec_depth=12, dec_num_heads=4,
                attn_impl="ref"),
    "linear": dict(img_size=(512, 512), patch_size=16, head_type="linear",
                   enc_embed_dim=128, enc_depth=4, enc_num_heads=4,
                   dec_embed_dim=96, dec_depth=2, dec_num_heads=4,
                   attn_impl="ref"),
}
H, W = 384, 512
STRIDE = 4


def bucket_model_and_inputs(head_type):
    from dust3r_tpu.models.model import AsymmetricCroCo3DStereo

    model = AsymmetricCroCo3DStereo(**BUCKET_CFGS[head_type])
    img1 = jax.random.normal(jax.random.PRNGKey(100), (1, H, W, 3))
    img2 = jax.random.normal(jax.random.PRNGKey(101), (1, H, W, 3))
    variables = model.init(jax.random.PRNGKey(102), img1, img2)
    return model, variables, img1, img2


def outputs_to_golden(res1, res2):
    out = {}
    for name, arr in (("pts3d1", res1["pts3d"]), ("conf1", res1["conf"]),
                      ("pts3d2", res2["pts3d_in_other_view"]),
                      ("conf2", res2["conf"])):
        a = np.asarray(arr)
        out[name] = a[:, ::STRIDE, ::STRIDE]
        out[name + "_mean"] = np.float64(a.mean())
        out[name + "_absmean"] = np.float64(np.abs(a).mean())
    return out


def make_bucket_golden(head_type):
    model, variables, img1, img2 = bucket_model_and_inputs(head_type)
    res1, res2 = jax.jit(model.apply)(variables, img1, img2)
    out = outputs_to_golden(res1, res2)
    path = osp.join(GOLDEN_DIR, f"bucket512_{head_type}.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: pts3d1 subsample {out['pts3d1'].shape}, "
          f"mean {out['pts3d1_mean']:+.6f}")


def make_aligner_golden():
    sys.path.insert(0, osp.join(osp.dirname(GOLDEN_DIR)))
    from test_cloud_opt import make_synthetic_scene
    from dust3r_tpu.cloud_opt import global_aligner, GlobalAlignerMode

    out, poses, depths, focal = make_synthetic_scene(n_imgs=5, seed=0)
    # fp32 observations: the golden pins exact-reference numerics (bf16
    # is the product default, defended by its own accuracy-delta test)
    scene = global_aligner(out, mode=GlobalAlignerMode.PointCloudOptimizer,
                           verbose=False, obs_dtype=jnp.float32)
    final = scene.compute_global_alignment(init="mst", niter=300,
                                           schedule="cosine", lr=0.01)
    losses = np.asarray(scene.last_losses)
    path = osp.join(GOLDEN_DIR, "aligner_trajectory.npz")
    np.savez_compressed(
        path,
        losses_every10=losses[::10], final_loss=np.float64(final),
        focals=np.asarray(scene.get_focals()).reshape(-1),
        im_poses=np.asarray(scene.get_im_poses()))
    print(f"wrote {path}: final loss {final:.6g}, "
          f"{len(losses)} iters recorded")


if __name__ == "__main__":
    make_bucket_golden("dpt")
    make_bucket_golden("linear")
    make_aligner_golden()
