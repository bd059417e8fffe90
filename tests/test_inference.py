import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dust3r_tpu.image_pairs import build_edges, make_pairs, filter_pairs_seq
from dust3r_tpu.inference import InferenceEngine, inference, find_opt_scaling
from dust3r_tpu.models.model import AsymmetricCroCo3DStereo
from dust3r_tpu.utils.image import normalize_img, rgb

TINY = dict(img_size=(32, 32), patch_size=16, enc_embed_dim=64, enc_depth=2,
            enc_num_heads=2, dec_embed_dim=48, dec_depth=2, dec_num_heads=2,
            attn_impl="ref")


def make_views(n, H=32, W=32, seed=0):
    rng = np.random.default_rng(seed)
    return [dict(img=rng.standard_normal((1, H, W, 3)).astype(np.float32),
                 true_shape=np.int32([[H, W]]), idx=i, instance=str(i))
            for i in range(n)]


class TestSceneGraphs:
    def test_complete(self):
        edges = build_edges(4, "complete")
        assert len(edges) == 6
        assert all(i > j for i, j in edges)

    def test_swin(self):
        edges = build_edges(6, "swin-2")
        # cyclic window 2: each i pairs with i+1, i+2 mod 6
        assert (0, 1) in edges and (0, 5) in edges and (0, 4) in edges
        assert len(edges) == 12

    def test_swin_noncyclic(self):
        edges = build_edges(6, "swin-2-noncyclic")
        assert (0, 5) not in edges
        assert len(edges) == 9

    def test_logwin(self):
        edges = build_edges(8, "logwin-3-noncyclic")
        assert (0, 1) in edges and (0, 2) in edges and (0, 4) in edges
        assert (0, 3) not in edges

    def test_oneref(self):
        edges = build_edges(5, "oneref-2")
        assert edges == [(2, 0), (2, 1), (2, 3), (2, 4)]

    def test_symmetrize_and_filter(self):
        views = make_views(5)
        pairs = make_pairs(views, "complete", symmetrize=True)
        assert len(pairs) == 20
        filtered = filter_pairs_seq(pairs, 1)
        assert all(abs(a["idx"] - b["idx"]) <= 1 for a, b in filtered)


class TestEngine:
    @pytest.fixture(scope="class")
    def setup(self):
        model = AsymmetricCroCo3DStereo(**TINY)
        views = make_views(3)
        img = jnp.asarray(views[0]["img"])
        params = model.init(jax.random.PRNGKey(0), img, img)
        return model, params, views

    def test_output_contract(self, setup):
        model, params, views = setup
        pairs = make_pairs(views, "complete", symmetrize=True)
        out = inference(pairs, model, params, batch_size=4, verbose=False)
        n = len(pairs)
        assert out["pred1"]["pts3d"].shape == (n, 32, 32, 3)
        assert out["pred1"]["conf"].shape == (n, 32, 32)
        assert out["pred2"]["pts3d_in_other_view"].shape == (n, 32, 32, 3)
        assert out["view1"]["img"].shape == (n, 32, 32, 3)
        assert list(out["view1"]["idx"]) == [p[0]["idx"] for p in pairs]

    def test_matches_direct_forward(self, setup):
        model, params, views = setup
        pairs = [(views[0], views[1])]
        out = inference(pairs, model, params, batch_size=2, verbose=False)
        r1, r2 = model.apply(params, jnp.asarray(views[0]["img"]),
                             jnp.asarray(views[1]["img"]))
        np.testing.assert_allclose(out["pred1"]["pts3d"][0],
                                   np.asarray(r1["pts3d"])[0], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(out["pred2"]["pts3d_in_other_view"][0],
                                   np.asarray(r2["pts3d_in_other_view"])[0],
                                   rtol=1e-4, atol=1e-4)

    def test_encoder_cache_single_encode_per_image(self, setup):
        model, params, views = setup
        engine = InferenceEngine(model, params, batch_size=4)
        calls = []
        orig = engine._encode

        def counting(p, img):
            calls.append(img.shape)
            return orig(p, img)

        engine._encode = counting
        pairs = make_pairs(views, "complete", symmetrize=True)  # 6 pairs, 3 imgs
        engine.infer_pairs(pairs)
        # 3 unique images, batch 4 -> exactly one encode batch
        assert len(calls) == 1

    def test_mixed_shape_buckets(self, setup):
        model, params, _ = setup
        v_land = make_views(2, 32, 48, seed=1)
        v_port = make_views(2, 48, 32, seed=2)
        pairs = [(v_land[0], v_land[1]), (v_land[0], v_port[0]),
                 (v_port[0], v_port[1])]
        out = inference(pairs, model, params, batch_size=2, verbose=False)
        # mixed shapes -> list outputs
        assert isinstance(out["pred1"]["pts3d"], list)
        assert out["pred1"]["pts3d"][0].shape == (32, 48, 3)
        assert out["pred2"]["pts3d_in_other_view"][1].shape == (48, 32, 3)

    def test_mixed_shape_to_device_keeps_view_imgs_on_device(self, setup):
        """to_cpu=False must keep view images as device arrays in the
        mixed-shape path too — the numpy flag has to reach _collate_views
        (one host copy per image through the tunnel otherwise)."""
        import jax
        model, params, _ = setup
        from dust3r_tpu.inference import InferenceEngine
        engine = InferenceEngine(model, params, batch_size=2)
        v_land = make_views(2, 32, 48, seed=1)
        v_port = make_views(2, 48, 32, seed=2)
        for v in v_land + v_port:  # device-resident inputs
            v["img"] = jnp.asarray(v["img"])
        pairs = [(v_land[0], v_land[1]), (v_port[0], v_port[1])]
        out = engine.infer_pairs(pairs, to_cpu=False)
        for v in (out["view1"], out["view2"]):
            assert all(isinstance(im, jax.Array) for im in v["img"])
        assert all(isinstance(p, jax.Array) for p in out["pred1"]["pts3d"])


class TestOptScaling:
    def test_recovers_scale(self):
        rng = np.random.default_rng(0)
        gt = rng.uniform(0.5, 2, (2, 8, 8, 3)).astype(np.float32)
        pr = 1.8 * gt
        for mode in ["avg", "median", "weiszfeld_stop_grad"]:
            s = np.asarray(find_opt_scaling(jnp.asarray(gt), None,
                                            jnp.asarray(pr), None, fit_mode=mode))
            np.testing.assert_allclose(s, 1.8, rtol=1e-4)

    def test_masked(self):
        rng = np.random.default_rng(1)
        gt = rng.uniform(0.5, 2, (1, 8, 8, 3)).astype(np.float32)
        pr = 2.5 * gt
        pr_bad = pr.copy()
        pr_bad[0, :2] = 1000.0
        valid = np.ones((1, 8, 8), bool)
        valid[0, :2] = False
        s = np.asarray(find_opt_scaling(jnp.asarray(gt), None,
                                        jnp.asarray(pr_bad), None,
                                        valid1=jnp.asarray(valid)))
        np.testing.assert_allclose(s, 2.5, rtol=1e-4)


class TestImageUtils:
    def test_normalize_roundtrip(self):
        arr = (np.arange(24).reshape(2, 4, 3) * 10).astype(np.uint8)
        normed = normalize_img(arr)
        assert normed.min() >= -1 and normed.max() <= 1
        back = rgb(normed)
        np.testing.assert_allclose(back, arr / 255.0, atol=1e-6)

    def test_load_images_resize(self, tmp_path):
        import PIL.Image
        from dust3r_tpu.utils.image import load_images
        # 640x480 landscape -> 512 long edge: 512x384
        img = PIL.Image.fromarray(
            np.random.default_rng(0).integers(0, 255, (480, 640, 3), dtype=np.uint8))
        p = tmp_path / "a.png"
        img.save(p)
        views = load_images([str(p)], size=512, verbose=False)
        assert views[0]["img"].shape == (1, 384, 512, 3)
        views = load_images([str(p)], size=224, verbose=False)
        assert views[0]["img"].shape == (1, 224, 224, 3)

    def test_load_images_square_to_3_4(self, tmp_path):
        import PIL.Image
        from dust3r_tpu.utils.image import load_images
        img = PIL.Image.fromarray(
            np.random.default_rng(1).integers(0, 255, (600, 600, 3), dtype=np.uint8))
        p = tmp_path / "sq.png"
        img.save(p)
        views = load_images([str(p)], size=512, verbose=False)
        assert views[0]["img"].shape == (1, 384, 512, 3)


class TestPrefilters:
    def test_cyc_prefilter(self):
        views = make_views(6)
        pairs = make_pairs(views, "complete", prefilter="cyc1",
                           symmetrize=True)
        # cyclic distance 1: (0,5) is kept, (0,2) dropped
        idx_pairs = {(a["idx"], b["idx"]) for a, b in pairs}
        assert (5, 0) in idx_pairs or (0, 5) in idx_pairs
        assert not any({i, j} == {0, 2} for i, j in idx_pairs)

    def test_seq_prefilter(self):
        views = make_views(6)
        pairs = make_pairs(views, "complete", prefilter="seq2",
                           symmetrize=False)
        assert all(abs(a["idx"] - b["idx"]) <= 2 for a, b in pairs)

    def test_filter_edges_seq_on_output(self):
        """Post-hoc edge filtering of a collated inference output."""
        from dust3r_tpu.image_pairs import filter_edges_seq
        import numpy as np
        view1 = dict(idx=[0, 0, 3, 5], x=np.arange(4))
        view2 = dict(idx=[1, 3, 4, 0], x=np.arange(4) * 10)
        pred1 = dict(pts3d=np.arange(4)[:, None])
        pred2 = dict(conf=np.arange(4)[:, None])
        v1, v2, p1, p2 = filter_edges_seq(view1, view2, pred1, pred2,
                                          seq_dis_thr=1, verbose=False)
        assert v1["idx"] == [0, 3]  # edges (0,1) and (3,4) kept
        assert p1["pts3d"].shape == (2, 1)


class TestMeshEngine:
    """Data-parallel pair fan-out: InferenceEngine(mesh=...) shards each
    pair batch over all mesh devices (params/features replicated). Output
    must match the single-device engine."""

    def test_mesh_matches_single_device(self):
        import jax
        from jax.sharding import Mesh
        from dust3r_tpu.inference import InferenceEngine

        model = AsymmetricCroCo3DStereo(**TINY)
        views = make_views(4)
        img = jnp.asarray(views[0]["img"])
        params = model.init(jax.random.PRNGKey(0), img, img)
        pairs = make_pairs(views, "complete", symmetrize=True)

        ref = InferenceEngine(model, params, batch_size=8)
        out_ref = ref.infer_pairs(pairs, verbose=False)

        mesh = Mesh(np.array(jax.devices()), ("pairs",))
        eng = InferenceEngine(model, params, batch_size=8, mesh=mesh)
        assert eng.params["params"]["enc_norm"]["ln"][
            "scale"].sharding.num_devices == 8
        out = eng.infer_pairs(pairs, verbose=False)

        np.testing.assert_allclose(out["pred1"]["pts3d"],
                                   out_ref["pred1"]["pts3d"],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(out["pred2"]["pts3d_in_other_view"],
                                   out_ref["pred2"]["pts3d_in_other_view"],
                                   rtol=1e-5, atol=1e-5)

    def test_batch_size_must_divide(self):
        import jax
        from jax.sharding import Mesh
        from dust3r_tpu.inference import InferenceEngine

        model = AsymmetricCroCo3DStereo(**TINY)
        img = jnp.zeros((1, 32, 32, 3))
        params = model.init(jax.random.PRNGKey(0), img, img)
        mesh = Mesh(np.array(jax.devices()), ("pairs",))
        with pytest.raises(AssertionError):
            InferenceEngine(model, params, batch_size=3, mesh=mesh)
