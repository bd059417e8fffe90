"""int8 quantized inference mode (ops/quant.py).

Beyond-parity serving feature; the accuracy contract defended here is
relative to THIS framework's own fp32 path (the reference has no
quantized mode to compare against): the int8 full-model pointmap error
must stay within a small multiple of the error the default bf16 compute
mode already accepts.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dust3r_tpu.models.model import AsymmetricCroCo3DStereo
from dust3r_tpu.ops.quant import (QuantDense, quantize_dense_params,
                                  quantize_for_inference, quantize_params)


def _relerr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))


def _tiny_model(**kw):
    kw.setdefault("img_size", (32, 32))
    kw.setdefault("enc_embed_dim", 64)
    kw.setdefault("enc_depth", 2)
    kw.setdefault("enc_num_heads", 4)
    kw.setdefault("dec_embed_dim", 48)
    kw.setdefault("dec_depth", 2)
    kw.setdefault("dec_num_heads", 4)
    kw.setdefault("head_type", "linear")
    return AsymmetricCroCo3DStereo(**kw)


class TestQuantDense:
    def test_matches_dense(self):
        """Per-token/per-channel int8 on gaussian data: ~0.5% error."""
        import flax.linen as nn

        key = jax.random.PRNGKey(0)
        dense = nn.Dense(96)
        x = jax.random.normal(key, (4, 17, 64))
        p = dense.init(key, x)
        ref = dense.apply(p, x)
        qp = {"params": quantize_dense_params(p["params"])}
        out = QuantDense(96).apply(qp, x)
        assert _relerr(out, ref) < 2e-2

    def test_zero_token_safe(self):
        """An all-zero token must not produce NaN/inf (scale floor)."""
        key = jax.random.PRNGKey(1)
        dense_p = jax.random.normal(key, (8, 16))
        leaf = {"kernel": dense_p, "bias": jnp.zeros((16,))}
        qp = {"params": quantize_dense_params(leaf)}
        x = jnp.zeros((2, 3, 8))
        out = QuantDense(16).apply(qp, x)
        assert np.isfinite(np.asarray(out)).all()

    def test_scan_stacked_kernel(self):
        """(depth, K, N) kernels quantize with per-(depth, channel) scales."""
        w = jax.random.normal(jax.random.PRNGKey(2), (3, 8, 16))
        q = quantize_dense_params({"kernel": w, "bias": jnp.zeros((3, 16))})
        assert q["kernel_q"].shape == (3, 8, 16)
        assert q["kernel_q"].dtype == jnp.int8
        assert q["kernel_scale"].shape == (3, 16)
        back = q["kernel_q"].astype(jnp.float32) * q["kernel_scale"][:, None, :]
        assert _relerr(back, w) < 1e-2


class TestQuantModel:
    @pytest.fixture(scope="class")
    def setup(self):
        model = _tiny_model()
        img1 = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        img2 = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        params = model.init(jax.random.PRNGKey(2), img1, img2)
        ref1, ref2 = model.apply(params, img1, img2)
        return model, params, img1, img2, ref1, ref2

    def test_structure_matches_init(self, setup):
        """quantize_params must produce exactly the tree the quant model
        declares (every Dense targeted, nothing else touched)."""
        model, params, img1, img2, *_ = setup
        qmodel, qparams = quantize_for_inference(model, params)
        want = jax.eval_shape(qmodel.init, jax.random.PRNGKey(0), img1, img2)
        got_paths = {jax.tree_util.keystr(p): (v.shape, v.dtype)
                     for p, v in jax.tree_util.tree_leaves_with_path(qparams)}
        want_paths = {jax.tree_util.keystr(p): (v.shape, v.dtype)
                      for p, v in jax.tree_util.tree_leaves_with_path(want)}
        assert got_paths == want_paths
        # the transformer denses really are int8 now
        n_int8 = sum(1 for v in jax.tree.leaves(qparams)
                     if v.dtype == jnp.int8)
        # enc: 2 layers x (qkv, attn proj, fc1, fc2) = 8; dec: 2 layers x
        # 2 streams x (qkv, attn proj, projq, projk, projv, cross proj,
        # fc1, fc2) = 32; decoder_embed = 1
        assert n_int8 == 8 + 32 + 1

    def test_accuracy_vs_fp32_within_bf16_noise(self, setup):
        """The int8 path's pointmap error vs fp32 must be within 4x the
        bf16 compute mode's (the noise the product already accepts)."""
        model, params, img1, img2, ref1, ref2 = setup
        qmodel, qparams = quantize_for_inference(model, params)
        q1, q2 = qmodel.apply(qparams, img1, img2)
        b1, b2 = model.clone(dtype=jnp.bfloat16).apply(params, img1, img2)
        for key, ref, q, b in (("pts3d", ref1, q1, b1),):
            e_q = _relerr(q[key], ref[key])
            e_b = _relerr(b[key], ref[key])
            assert e_q < max(4 * e_b, 2e-2), (e_q, e_b)
        e_q = _relerr(q2["pts3d_in_other_view"], ref2["pts3d_in_other_view"])
        e_b = _relerr(b2["pts3d_in_other_view"], ref2["pts3d_in_other_view"])
        assert e_q < max(4 * e_b, 2e-2), (e_q, e_b)
        assert _relerr(q1["conf"], ref1["conf"]) < 2e-2

    def test_scan_layers_parity(self, setup):
        """Quantizing scan-stacked params == quantizing unrolled params."""
        from dust3r_tpu.checkpoint import stack_scan_params

        model, params, img1, img2, *_ = setup
        qmodel, qparams = quantize_for_inference(model, params)
        q1, _ = qmodel.apply(qparams, img1, img2)
        smodel = model.clone(scan_layers=True)
        sparams = stack_scan_params(params, model.enc_depth, model.dec_depth)
        sqmodel, sqparams = quantize_for_inference(smodel, sparams)
        s1, _ = sqmodel.apply(sqparams, img1, img2)
        np.testing.assert_allclose(np.asarray(s1["pts3d"]),
                                   np.asarray(q1["pts3d"]),
                                   rtol=1e-4, atol=1e-5)

    def test_engine_integration(self, setup):
        """quantize='int8' converts inside the engine; pre-quantized
        (qmodel, qparams) also drop in unchanged."""
        from dust3r_tpu.image_pairs import make_pairs
        from dust3r_tpu.inference import InferenceEngine

        model, params, *_ = setup
        qmodel, qparams = quantize_for_inference(model, params)
        # pre-quantized params + fp32 module: the engine flips the flag
        eng2 = InferenceEngine(model, qparams, batch_size=2,
                               quantize="int8")
        assert eng2.model.quant and eng2.params is qparams
        rng = np.random.default_rng(0)
        views = [dict(img=rng.standard_normal((1, 32, 32, 3)).astype(
                          np.float32),
                      true_shape=np.int32([[32, 32]]), idx=i,
                      instance=str(i)) for i in range(3)]
        pairs = make_pairs(views, "complete", symmetrize=True)
        engine = InferenceEngine(model, params, batch_size=2,
                                 quantize="int8")
        out = engine.infer_pairs(pairs)
        assert out["pred1"]["pts3d"].shape == (len(pairs), 32, 32, 3)
        assert np.isfinite(np.asarray(out["pred1"]["pts3d"])).all()

    def test_untargeted_leaves_untouched(self, setup):
        """Heads, patchify, LayerNorms pass through quantize_params
        bit-identically (only transformer denses are rewritten)."""
        model, params, *_ = setup
        qparams = quantize_params(params)
        for name in ("downstream_head1", "patch_embed", "enc_norm"):
            ref_leaves = jax.tree.leaves(params["params"][name])
            q_leaves = jax.tree.leaves(qparams["params"][name])
            assert len(ref_leaves) == len(q_leaves)
            for r, q in zip(ref_leaves, q_leaves):
                np.testing.assert_array_equal(np.asarray(r), np.asarray(q))
