"""Demo pipeline logic (gradio/trimesh-free parts): reconstruction flow,
scene-graph option handling, gallery generation."""
import numpy as np
import PIL.Image
import pytest
import jax
import jax.numpy as jnp

import dust3r_tpu.demo as demo_mod
from dust3r_tpu.models.model import AsymmetricCroCo3DStereo
from dust3r_tpu.inference import InferenceEngine

TINY = dict(img_size=(32, 32), patch_size=16, enc_embed_dim=64, enc_depth=2,
            enc_num_heads=2, dec_embed_dim=48, dec_depth=2, dec_num_heads=2,
            attn_impl="ref")


@pytest.fixture(scope="module")
def engine():
    model = AsymmetricCroCo3DStereo(**TINY)
    probe = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), probe, probe)
    return InferenceEngine(model, params, batch_size=4)


@pytest.fixture
def imagefiles(tmp_path):
    rng = np.random.default_rng(0)
    files = []
    for i in range(3):
        img = PIL.Image.fromarray(
            rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
        p = tmp_path / f"img{i}.png"
        img.save(p)
        files.append(str(p))
    return files


def test_get_reconstructed_scene(engine, imagefiles, tmp_path, monkeypatch):
    exported = {}

    def fake_glb(outdir, imgs, pts3d, mask, focals, cams2world, **kw):
        exported["n_imgs"] = len(imgs)
        return str(tmp_path / "scene.glb")

    monkeypatch.setattr(demo_mod, "_convert_scene_output_to_glb", fake_glb)

    scene, outfile, gallery = demo_mod.get_reconstructed_scene(
        str(tmp_path), engine, "tpu", True, 32, imagefiles,
        schedule="cosine", niter=5, min_conf_thr=3.0, as_pointcloud=True,
        mask_sky=False, clean_depth=False, transparent_cams=False,
        cam_size=0.05, scenegraph_type="complete", winsize=1, refid=0)

    assert exported["n_imgs"] == 3
    assert outfile.endswith("scene.glb")
    # gallery: rgb, depth, conf per image
    assert len(gallery) == 9
    assert all(np.isfinite(np.asarray(g)).all() for g in gallery)
    # conf threshold got transformed through conf_trf (reference quirk)
    assert np.isclose(scene.min_conf_thr, np.log(3.0), atol=1e-5)


def test_single_image_duplicated(engine, imagefiles, tmp_path, monkeypatch):
    monkeypatch.setattr(demo_mod, "_convert_scene_output_to_glb",
                        lambda *a, **k: "x.glb")
    scene, outfile, gallery = demo_mod.get_reconstructed_scene(
        str(tmp_path), engine, "tpu", True, 32, imagefiles[:1],
        schedule="linear", niter=0, min_conf_thr=3.0, as_pointcloud=True,
        mask_sky=False, clean_depth=False, transparent_cams=False,
        cam_size=0.05, scenegraph_type="complete", winsize=1, refid=0)
    # single image duplicated -> 2-image PairViewer scene
    assert len(gallery) == 6


def test_ply_fallback_export(tmp_path):
    """trimesh-free PLY export: valid header, vertex count matches masked
    points + 8 frustum segments x 16 samples per camera."""
    rng = np.random.default_rng(0)
    n, h, w = 2, 8, 10
    imgs = [rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
            for _ in range(n)]
    pts3d = [rng.standard_normal((h, w, 3)).astype(np.float32)
             for _ in range(n)]
    mask = [np.ones((h, w), bool), np.zeros((h, w), bool)]
    mask[1][:4] = True
    cams2world = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    cams2world[1, :3, 3] = (1, 0, 0)
    out = demo_mod._export_scene_ply(
        str(tmp_path), imgs, pts3d, mask, np.float32([100.0, 100.0]),
        cams2world, silent=True)
    assert out.endswith("scene.ply")
    raw = open(out, "rb").read()
    header, body = raw.split(b"end_header\n", 1)
    n_pts = int(mask[0].sum() + mask[1].sum()) + n * 8 * 16
    assert f"element vertex {n_pts}".encode() in header
    assert len(body) == n_pts * (3 * 4 + 3)
    xyz = np.frombuffer(body, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
    assert np.isfinite(xyz["xyz"]).all()
