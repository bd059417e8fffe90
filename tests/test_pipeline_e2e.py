"""Full-pipeline integration: images -> make_pairs -> InferenceEngine ->
global_aligner (MST init + scan Adam) -> scene accessors.

Uses an untrained tiny model, so only structural/finiteness properties are
asserted - the geometric recovery quality is covered by the synthetic
aligner tests (test_cloud_opt.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dust3r_tpu.models.model import AsymmetricCroCo3DStereo
from dust3r_tpu.inference import InferenceEngine, inference
from dust3r_tpu.image_pairs import make_pairs
from dust3r_tpu.cloud_opt import global_aligner, GlobalAlignerMode

# multi-minute file: excluded from the quick (-m quick) suite
pytestmark = pytest.mark.slow

TINY = dict(img_size=(32, 32), patch_size=16, enc_embed_dim=64, enc_depth=2,
            enc_num_heads=2, dec_embed_dim=48, dec_depth=2, dec_num_heads=2,
            attn_impl="ref")


@pytest.fixture(scope="module")
def engine():
    model = AsymmetricCroCo3DStereo(**TINY)
    probe = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), probe, probe)
    return InferenceEngine(model, params, batch_size=4)


def make_views(n, H=32, W=32, seed=0):
    rng = np.random.default_rng(seed)
    return [dict(img=rng.standard_normal((1, H, W, 3)).astype(np.float32),
                 true_shape=np.int32([[H, W]]), idx=i, instance=str(i))
            for i in range(n)]


class TestPipeline:
    def test_images_to_scene(self, engine):
        views = make_views(4)
        pairs = make_pairs(views, scene_graph="complete", symmetrize=True)
        output = inference(pairs, engine, verbose=False)

        scene = global_aligner(output,
                               mode=GlobalAlignerMode.PointCloudOptimizer,
                               verbose=False)
        loss = scene.compute_global_alignment(init="mst", niter=12,
                                              schedule="cosine", lr=0.01)
        assert np.isfinite(loss)
        assert len(scene.get_pts3d()) == 4
        poses = np.asarray(scene.get_im_poses())
        assert poses.shape == (4, 4, 4)
        assert np.isfinite(poses).all()
        focals = np.asarray(scene.get_focals())
        assert np.isfinite(focals).all() and (focals > 0).all()
        # scene snapshot roundtrip
        sd = scene.state_dict()
        scene.load_state_dict(sd)
        assert np.isfinite(scene.forward())

    def test_two_image_pair_viewer(self, engine):
        views = make_views(2, seed=3)
        pairs = make_pairs(views, scene_graph="complete", symmetrize=True)
        output = inference(pairs, engine, verbose=False)
        scene = global_aligner(output, mode=GlobalAlignerMode.PairViewer,
                               verbose=False)
        assert len(scene.get_pts3d()) == 2
        assert np.asarray(scene.get_im_poses()).shape == (2, 4, 4)

    def test_device_handoff(self, engine):
        """to_cpu=False output feeds the aligner without errors."""
        views = make_views(3, seed=5)
        pairs = make_pairs(views, scene_graph="complete", symmetrize=True)
        output = engine.infer_pairs(pairs, to_cpu=False)
        assert not isinstance(output["pred1"]["pts3d"], np.ndarray)
        scene = global_aligner(output,
                               mode=GlobalAlignerMode.PointCloudOptimizer,
                               verbose=False)
        loss = scene.compute_global_alignment(init="mst", niter=5, lr=0.01)
        assert np.isfinite(loss)
