"""The Gradio UI itself (VERDICT r3 item 6): gradio is not installed in
this container, so a faithful Blocks/component stub is installed in
sys.modules and `main_demo` is EXECUTED — building every component,
registering every event, launching — and then the recorded `run_btn`
click handler is driven end-to-end with real images through a real tiny
engine, so the UI wiring is no longer dead code.

Reference surface: dust3r/demo.py:135-287 (get_reconstructed_scene +
set_scenegraph_options + main_demo Blocks wiring).
"""
import sys
import types

import numpy as np
import PIL.Image
import pytest
import jax
import jax.numpy as jnp


# ------------------------------------------------------------ gradio stub
class _Component:
    """Records constructor kwargs and event registrations."""

    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs
        self.events = []
        _STUB.components.append(self)

    def _register(self, name, fn=None, inputs=None, outputs=None):
        self.events.append(dict(event=name, fn=fn, inputs=inputs,
                                outputs=outputs))

    def change(self, fn=None, inputs=None, outputs=None):
        self._register("change", fn, inputs, outputs)

    def release(self, fn=None, inputs=None, outputs=None):
        self._register("release", fn, inputs, outputs)

    def click(self, fn=None, inputs=None, outputs=None):
        self._register("click", fn, inputs, outputs)


class _Container(_Component):
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _Blocks(_Container):
    def launch(self, **kwargs):
        _STUB.launched.append(kwargs)


class _Stub(types.ModuleType):
    def __init__(self):
        super().__init__("gradio")
        self.components = []
        self.launched = []
        self.Blocks = _Blocks
        self.Column = _Container
        self.Row = _Container
        for name in ("State", "HTML", "File", "Dropdown", "Number",
                     "Slider", "Button", "Checkbox", "Model3D", "Gallery"):
            setattr(self, name, type(name, (_Component,), {}))

    def reset(self):
        self.components.clear()
        self.launched.clear()


_STUB = _Stub()


@pytest.fixture
def gradio_stub(monkeypatch):
    _STUB.reset()
    monkeypatch.setitem(sys.modules, "gradio", _STUB)
    return _STUB


@pytest.fixture(scope="module")
def engine():
    from dust3r_tpu.models.model import AsymmetricCroCo3DStereo
    from dust3r_tpu.inference import InferenceEngine

    model = AsymmetricCroCo3DStereo(
        img_size=(32, 32), patch_size=16, enc_embed_dim=64, enc_depth=2,
        enc_num_heads=2, dec_embed_dim=48, dec_depth=2, dec_num_heads=2,
        attn_impl="ref")
    probe = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), probe, probe)
    return InferenceEngine(model, params, batch_size=4)


def _find(stub, cls_name, **kwargs):
    hits = [c for c in stub.components
            if type(c).__name__ == cls_name
            and all(c.kwargs.get(k) == v for k, v in kwargs.items())]
    return hits


def test_main_demo_builds_and_run_click_drives_pipeline(
        gradio_stub, engine, tmp_path, monkeypatch):
    import dust3r_tpu.demo as demo_mod

    monkeypatch.setattr(demo_mod, "_convert_scene_output_to_glb",
                        lambda outdir, *a, **k: str(tmp_path / "scene.glb"))

    demo_mod.main_demo(str(tmp_path), engine, "tpu", 32,
                       server_name="127.0.0.1", server_port=7860,
                       silent=True)

    # launched exactly once with the requested binding
    assert gradio_stub.launched == [dict(share=False,
                                         server_name="127.0.0.1",
                                         server_port=7860)]

    # the Run button is wired: 12 inputs -> (scene, model, gallery)
    (run_btn,) = _find(gradio_stub, "Button")
    (click,) = run_btn.events
    assert click["event"] == "click"
    assert len(click["inputs"]) == 12
    assert len(click["outputs"]) == 3

    # scenegraph dropdown + file input both re-derive the slider options
    dropdowns = _find(gradio_stub, "Dropdown", label="Scenegraph")
    assert len(dropdowns) == 1 and len(dropdowns[0].events) == 1
    (files,) = _find(gradio_stub, "File")
    assert files.events and files.events[0]["event"] == "change"

    # post-hoc sliders re-export WITHOUT re-running inference
    post_ctls = (_find(gradio_stub, "Slider", label="min_conf_thr")
                 + _find(gradio_stub, "Slider", label="cam_size")
                 + _find(gradio_stub, "Checkbox"))
    assert len(post_ctls) == 6
    for ctl in post_ctls:
        assert len(ctl.events) == 1
        ev = ctl.events[0]
        # each post-hoc control re-exports the 3D model only (7 inputs:
        # scene + 6 control values), never re-triggering inference
        assert ev["fn"] is not click["fn"]
        assert len(ev["inputs"]) == 7

    # drive the recorded click handler end-to-end with real images
    rng = np.random.default_rng(0)
    imgfiles = []
    for i in range(2):
        p = tmp_path / f"im{i}.png"
        PIL.Image.fromarray(
            rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)).save(p)
        imgfiles.append(str(p))
    scene, outfile, gallery = click["fn"](
        imgfiles, "cosine", 3, 3.0, True, False, False, False, 0.05,
        "complete", 1, 0)
    assert outfile.endswith("scene.glb")
    assert len(gallery) == 6  # rgb, depth, conf per image


def test_set_scenegraph_options_logic(gradio_stub):
    import dust3r_tpu.demo as demo_mod

    files = [f"im{i}.png" for i in range(7)]
    win, ref = demo_mod.set_scenegraph_options(files, 1, 0, "swin")
    assert win.kwargs["visible"] is True and ref.kwargs["visible"] is False
    assert win.kwargs["maximum"] == 3  # ceil((7-1)/2)

    win, ref = demo_mod.set_scenegraph_options(files, 1, 0, "oneref")
    assert win.kwargs["visible"] is False and ref.kwargs["visible"] is True
    assert ref.kwargs["maximum"] == 6

    win, ref = demo_mod.set_scenegraph_options(None, 1, 0, "complete")
    assert win.kwargs["visible"] is False and ref.kwargs["visible"] is False
