"""Viz geometry helpers (mesh construction, sky segmentation) - the parts
of viz.py that don't need trimesh/gradio (reference dust3r/viz.py)."""
import numpy as np
import pytest

from dust3r_tpu.viz import (pts3d_to_trimesh, cat_meshes, auto_cam_size,
                            uint8, segment_sky)


def test_pts3d_to_trimesh_counts():
    H, W = 5, 7
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(H, W, 3)).astype(np.float32)
    pts = rng.standard_normal((H, W, 3)).astype(np.float32)
    m = pts3d_to_trimesh(img, pts)
    assert m["vertices"].shape == (H * W, 3)
    # 2 double-sided triangles per interior quad
    assert m["faces"].shape == ((H - 1) * (W - 1) * 4, 3)
    assert m["face_colors"].shape == m["faces"].shape
    assert m["faces"].max() < H * W


def test_pts3d_to_trimesh_valid_mask():
    H, W = 4, 4
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(H, W, 3)).astype(np.float32)
    pts = rng.standard_normal((H, W, 3)).astype(np.float32)
    valid = np.ones((H, W), bool)
    valid[0, 0] = False  # kills every face touching vertex 0
    m_all = pts3d_to_trimesh(img, pts)
    m = pts3d_to_trimesh(img, pts, valid)
    assert len(m["faces"]) < len(m_all["faces"])
    assert not (m["faces"] == 0).any()


def test_cat_meshes_offsets():
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(3, 3, 3)).astype(np.float32)
    pts = rng.standard_normal((3, 3, 3)).astype(np.float32)
    m1 = pts3d_to_trimesh(img, pts)
    m2 = pts3d_to_trimesh(img, pts + 5)
    cat = cat_meshes([m1, m2])
    assert len(cat["vertices"]) == 18
    # second mesh's faces reference the offset vertex block
    assert cat["faces"][len(m1["faces"]):].min() >= 9


def test_auto_cam_size_and_uint8():
    poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    poses[:, :3, 3] = [[0, 0, 0], [1, 0, 0], [0, 2, 0]]
    s = auto_cam_size(poses)
    assert 0 < s < 10
    assert uint8(np.array([0.0, 0.5, 1.0])).dtype == np.uint8


def test_segment_sky():
    cv2 = pytest.importorskip("cv2")
    pytest.importorskip("scipy")
    H, W = 64, 64
    # pipeline images are RGB (the hue window [0, 30] targets blue under
    # the BGR2HSV convert applied to RGB data, matching the reference)
    img = np.zeros((H, W, 3), np.uint8)
    img[:24] = (135, 206, 235)  # RGB sky blue, top band
    img[24:] = (30, 80, 30)     # dark ground
    mask = segment_sky(img)
    assert mask.shape == (H, W)
    assert mask[:20].mean() > 0.9   # sky found
    assert mask[30:].mean() < 0.1   # ground untouched


def test_lr_schedules():
    """cloud_opt.commons LR schedules (reference commons.py:77-90)."""
    from dust3r_tpu.cloud_opt.commons import (cosine_schedule,
                                              linear_schedule,
                                              make_lr_schedule)
    assert cosine_schedule(0.0, 0.1, 0.001) == pytest.approx(0.1)
    assert cosine_schedule(1.0, 0.1, 0.001) == pytest.approx(0.001)
    assert linear_schedule(0.5, 0.1, 0.0) == pytest.approx(0.05)
    lrs = make_lr_schedule("cosine", 300, 0.01, 1e-6)
    assert len(lrs) == 300
    assert lrs[0] == pytest.approx(0.01)
    assert np.all(np.diff(lrs) <= 0)
    lrs = make_lr_schedule("linear", 10, 0.01, 0.0)
    assert lrs[0] == pytest.approx(0.01)


def test_show_duster_pairs_headless(monkeypatch):
    """Drive the interactive pair viewer (reference viz.py:90-113) with a
    non-interactive backend and a mocked prompt."""
    import matplotlib
    matplotlib.use("Agg", force=True)
    from dust3r_tpu.viz import show_duster_pairs, cat

    H, W = 8, 12
    rng = np.random.default_rng(0)
    n = 2
    view = lambda: dict(instance=[str(k) for k in range(n)],
                        idx=list(range(n)),
                        img=rng.uniform(-1, 1, (n, H, W, 3)).astype(np.float32))
    pred1 = dict(conf=1 + rng.uniform(0, 1, (n, H, W)).astype(np.float32),
                 pts3d=rng.normal(size=(n, H, W, 3)).astype(np.float32))
    pred2 = dict(conf=1 + rng.uniform(0, 1, (n, H, W)).astype(np.float32),
                 pts3d_in_other_view=rng.normal(
                     size=(n, H, W, 3)).astype(np.float32))
    monkeypatch.setattr("builtins.input", lambda *a: "n")
    show_duster_pairs(view(), view(), pred1, pred2)

    assert cat(pred1["pts3d"][0], pred2["pts3d_in_other_view"][0]).shape \
        == (2 * H * W, 3)
