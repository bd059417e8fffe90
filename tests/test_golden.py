"""Golden-value regression: fixed-seed models must reproduce committed
outputs (guards against silent numeric drift across refactors - the role
of the reference parity tests, SURVEY.md §4).

Three tiers (VERDICT r1 item 6):
  1. tiny 32x48 model (cheap, runs everywhere)
  2. 512-bucket goldens: 384x512 input through the REAL structural path -
     ManyAR position table, 24x32 patch grid, full DPT resolution cascade
     with hooks at (0, 6, 9, 12) - for BOTH head types, cross-checked
     against the independent torch reimplementation at the same shape
  3. a 300-iter aligner loss trajectory on a fixed synthetic scene
     (reference defaults: Adam(0.9,0.9), cosine, lr=0.01 -
     dust3r/cloud_opt/base_opt.py:326,337)

Artifacts are produced by scripts/make_goldens.py on the CPU backend.
"""
import os.path as osp
import sys

import numpy as np
import pytest
import jax

from dust3r_tpu.models.model import AsymmetricCroCo3DStereo

# multi-minute file: excluded from the quick (-m quick) suite
pytestmark = pytest.mark.slow

GOLDEN_DIR = osp.join(osp.dirname(__file__), "golden")

TINY = dict(img_size=(32, 32), patch_size=16, enc_embed_dim=64, enc_depth=2,
            enc_num_heads=2, dec_embed_dim=48, dec_depth=2, dec_num_heads=2,
            attn_impl="ref")


def test_golden_outputs():
    model = AsymmetricCroCo3DStereo(**TINY)
    img1 = jax.random.normal(jax.random.PRNGKey(10), (1, 32, 48, 3))
    img2 = jax.random.normal(jax.random.PRNGKey(11), (1, 32, 48, 3))
    params = model.init(jax.random.PRNGKey(12), img1, img2)
    r1, r2 = model.apply(params, img1, img2)

    golden = np.load(osp.join(GOLDEN_DIR, "tiny_model_outputs.npz"))
    np.testing.assert_allclose(np.asarray(r1["pts3d"]), golden["pts3d"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1["conf"]), golden["conf"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r2["pts3d_in_other_view"]),
                               golden["pts3d2"], rtol=1e-5, atol=1e-5)


class TestBucket512Golden:
    """Drift guard at the real 512-bucket shape, both heads, plus a live
    cross-implementation check against the torch reference model."""

    @pytest.mark.parametrize("head_type", ["dpt", "linear"])
    def test_bucket_golden(self, head_type):
        import sys
        sys.path.insert(0, osp.join(osp.dirname(osp.dirname(
            osp.abspath(__file__))), "scripts"))
        from make_goldens import bucket_model_and_inputs, outputs_to_golden

        model, variables, img1, img2 = bucket_model_and_inputs(head_type)
        res1, res2 = jax.jit(model.apply)(variables, img1, img2)
        out = outputs_to_golden(res1, res2)

        golden = np.load(osp.join(GOLDEN_DIR, f"bucket512_{head_type}.npz"))
        for k in ("pts3d1", "conf1", "pts3d2", "conf2"):
            scale = max(float(golden[k + "_absmean"]), 1e-6)
            np.testing.assert_allclose(
                out[k] / scale, golden[k] / scale, rtol=2e-4, atol=2e-4,
                err_msg=f"{head_type}/{k} drifted from committed golden")
            # full-tensor moments guard the un-sampled pixels too
            np.testing.assert_allclose(
                out[k + "_mean"] / scale, golden[k + "_mean"] / scale,
                rtol=1e-4, atol=1e-4)

    def test_dpt_bucket_torch_cross_check(self):
        """Export the golden DPT weights to a torch state dict, run the
        independent torch reimplementation at the same 512-bucket shape,
        and require pointmap agreement well inside the 1e-2 RMSE budget
        (BASELINE.md). This exercises the converter + both implementations
        at the REAL resolution cascade, not the 32x48 toy path."""
        import sys
        import torch
        sys.path.insert(0, osp.join(osp.dirname(osp.dirname(
            osp.abspath(__file__))), "scripts"))
        sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
        from make_goldens import bucket_model_and_inputs, BUCKET_CFGS
        from torch_ref_model import TorchDust3R
        from dust3r_tpu.checkpoint import (to_torch_state_dict,
                                           )

        model, variables, img1, img2 = bucket_model_and_inputs("dpt")
        cfg = BUCKET_CFGS["dpt"]
        sd = to_torch_state_dict(variables, enc_depth=cfg["enc_depth"],
                                 dec_depth=cfg["dec_depth"], head_type="dpt")
        tmodel = TorchDust3R(
            patch_size=16, enc_embed_dim=cfg["enc_embed_dim"],
            enc_depth=cfg["enc_depth"], enc_num_heads=cfg["enc_num_heads"],
            dec_embed_dim=cfg["dec_embed_dim"], dec_depth=cfg["dec_depth"],
            dec_num_heads=cfg["dec_num_heads"], head_type="dpt").eval()
        # the exporter emits the attr-registration form scratch.layer{k}_rn;
        # TorchDust3R registers the ModuleList form (both appear in the
        # wild; the converter accepts either - test_ckpt_name_map.py)
        for k in list(sd):
            for idx in range(1, 5):
                if f"scratch.layer{idx}_rn" in k:
                    sd[k.replace(f"scratch.layer{idx}_rn",
                                 f"scratch.layer_rn.{idx - 1}")] = sd.pop(k)
        missing, unexpected = tmodel.load_state_dict(
            {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
            strict=False)
        assert not unexpected, unexpected
        # refinenet4.resConfUnit1 is dead weight a flax init never has
        assert all("refinenet4.resConfUnit1" in k for k in missing), missing

        res1, res2 = jax.jit(model.apply)(variables, img1, img2)
        with torch.no_grad():
            tp1, tc1, tp2, tc2 = tmodel(
                torch.from_numpy(np.asarray(img1)).permute(0, 3, 1, 2),
                torch.from_numpy(np.asarray(img2)).permute(0, 3, 1, 2))

        for jax_out, torch_out, name in (
                (res1["pts3d"], tp1, "pts3d1"),
                (res2["pts3d_in_other_view"], tp2, "pts3d2"),
                (res1["conf"], tc1, "conf1"), (res2["conf"], tc2, "conf2")):
            a, b = np.asarray(jax_out), torch_out.numpy()
            scale = max(float(np.sqrt(np.mean(b ** 2))), 1e-6)
            rmse = float(np.sqrt(np.mean((a - b) ** 2)))
            assert rmse / scale < 1e-3, \
                f"{name}: relative RMSE {rmse / scale:.2e} vs torch"


class TestAlignerTrajectoryGolden:
    def test_trajectory(self):
        import sys
        sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
        from test_cloud_opt import make_synthetic_scene
        from dust3r_tpu.cloud_opt import global_aligner, GlobalAlignerMode

        import jax.numpy as jnp

        out, poses, depths, focal = make_synthetic_scene(n_imgs=5, seed=0)
        # golden recorded with fp32 observations; pin it (bf16 is the
        # product default, defended by TestBf16ObsAccuracyDelta)
        scene = global_aligner(out,
                               mode=GlobalAlignerMode.PointCloudOptimizer,
                               verbose=False, obs_dtype=jnp.float32)
        final = scene.compute_global_alignment(init="mst", niter=300,
                                               schedule="cosine", lr=0.01)
        golden = np.load(osp.join(GOLDEN_DIR, "aligner_trajectory.npz"))
        losses = np.asarray(scene.last_losses)[::10]
        ref = golden["losses_every10"]
        # early iterations are large and tightly pinned; the tail is tiny
        # (1e-4) where float reassociation differences show - compare in
        # log space with a loose-but-meaningful tolerance
        np.testing.assert_allclose(np.log10(losses), np.log10(ref),
                                   atol=0.05)
        np.testing.assert_allclose(float(final), float(golden["final_loss"]),
                                   rtol=0.1)
        np.testing.assert_allclose(
            np.asarray(scene.get_focals()).reshape(-1), golden["focals"],
            rtol=1e-3)
        np.testing.assert_allclose(np.asarray(scene.get_im_poses()),
                                   golden["im_poses"], atol=1e-3)


class TestServingConfigGoldenAnchor:
    """Accuracy anchor for the SERVING config (int8 block gemms + bf16
    heads — the demo/visloc --serving flag; measured 1.16x the parity
    config, docs/DESIGN.md round-4) against the committed fp32 512-bucket
    goldens. These are random structural weights, so |raw xyz| is larger
    than trained pointmaps and the expm1 postprocess amplifies the
    quantization/rounding noise accordingly — measured rel-RMSE at commit
    time: dpt pts3d 5.6e-2/8.1e-2, linear 2.1e-2/2.3e-2, conf <=1.3e-2.
    Bounds are ~1.5x those values: a silent regression in the quant or
    bf16-head path (e.g. a scale bug) trips this long before it reaches
    the 4x-noise contracts. The PARITY config (fp32 heads, no quant)
    remains the one held to the 1e-2 budget (test_bucket_golden)."""

    BOUNDS = {  # head_type -> {key: max rel RMSE}
        "dpt": {"pts3d1": 0.09, "pts3d2": 0.12, "conf1": 0.01},
        "linear": {"pts3d1": 0.04, "pts3d2": 0.04, "conf1": 0.025},
    }

    @pytest.mark.parametrize("head_type", ["dpt", "linear"])
    def test_serving_vs_golden(self, head_type):
        import jax.numpy as jnp
        from dust3r_tpu.ops.quant import quantize_for_inference

        sys.path.insert(0, osp.join(osp.dirname(osp.dirname(
            osp.abspath(__file__))), "scripts"))
        from make_goldens import bucket_model_and_inputs, outputs_to_golden

        model, variables, img1, img2 = bucket_model_and_inputs(head_type)
        serving = model.clone(dtype=jnp.bfloat16, head_dtype=jnp.bfloat16)
        qmodel, qparams = quantize_for_inference(serving, variables)
        r1, r2 = jax.jit(qmodel.apply)(qparams, img1, img2)
        out = outputs_to_golden(r1, r2)
        golden = np.load(osp.join(GOLDEN_DIR, f"bucket512_{head_type}.npz"))
        for k, bound in self.BOUNDS[head_type].items():
            a = out[k].astype(np.float64)
            b = golden[k].astype(np.float64)
            rel = (np.sqrt(np.mean((a - b) ** 2))
                   / max(np.sqrt(np.mean(b ** 2)), 1e-9))
            assert rel < bound, f"{head_type}/{k}: {rel:.3e} > {bound}"
