"""demo.py CLI contract: flag plumbing from argv to the built engine.

Pins the --serving config (bf16 BODY + bf16 heads + int8 gemms — the
measured 1.16x configuration, docs/DESIGN.md round-4 table row g) at the
CLI level: a --serving that only set head_dtype once shipped an
unmeasured fp32-body config. The sibling visloc CLI is pinned the same
way in tests/test_visloc.py::TestVislocMain.

Reference CLI surface: /root/reference/demo.py:9-15 + dust3r/demo.py:20-45.
"""
import argparse
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tiny_ckpt(tmp_path):
    import torch
    from dust3r_tpu.models.model import AsymmetricCroCo3DStereo
    from dust3r_tpu.checkpoint import to_torch_state_dict

    kw = dict(img_size=(64, 64), patch_size=16, enc_embed_dim=64,
              enc_depth=2, enc_num_heads=2, dec_embed_dim=48,
              dec_depth=2, dec_num_heads=2)
    model = AsymmetricCroCo3DStereo(**kw)
    img = jnp.zeros((1, 48, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img)
    sd = to_torch_state_dict(variables, enc_depth=2, dec_depth=2,
                             head_type="linear")
    arch = ("AsymmetricCroCo3DStereo(pos_embed='RoPE100', "
            "img_size=(64, 64), head_type='linear', "
            "output_mode='pts3d', depth_mode=('exp', -inf, inf), "
            "conf_mode=('exp', 1, inf), enc_embed_dim=64, enc_depth=2, "
            "enc_num_heads=2, dec_embed_dim=48, dec_depth=2, "
            "dec_num_heads=2)")
    ckpt = tmp_path / "tiny.pth"
    torch.save({"model": {k: torch.from_numpy(np.asarray(v))
                          for k, v in sd.items()},
                "args": argparse.Namespace(model=arch)}, ckpt)
    return str(ckpt)


@pytest.mark.parametrize("serving", [False, True])
def test_main_builds_the_measured_engine_config(tmp_path, monkeypatch,
                                                serving):
    import demo as demo_cli  # root demo.py

    captured = {}

    def fake_main_demo(tmpdirname, engine, device, image_size, server_name,
                       server_port, silent=False):
        captured["engine"] = engine

    monkeypatch.setattr(demo_cli, "main_demo", fake_main_demo)
    argv = ["demo.py", "--weights", _tiny_ckpt(tmp_path), "--silent"]
    if serving:
        argv.append("--serving")
    monkeypatch.setattr(sys, "argv", argv)
    demo_cli.main()

    model = captured["engine"].model
    if serving:
        assert model.dtype == jnp.bfloat16   # the body dtype, NOT just heads
        assert model.head_dtype == jnp.bfloat16
        assert model.quant is True           # int8 block gemms engaged
        # engine params actually hold int8 leaves
        assert any(v.dtype == jnp.int8
                   for v in jax.tree.leaves(captured["engine"].params))
    else:
        assert model.dtype == jnp.float32    # reference default (no AMP)
        assert model.head_dtype == jnp.float32
        assert model.quant is False
