import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from torch_ref_model import TorchDust3R
from dust3r_tpu.checkpoint import (convert_torch_state_dict,
                                   parse_arch_string,
                                   model_from_arch_string,
                                   save_checkpoint, load_checkpoint)
from dust3r_tpu.models.model import AsymmetricCroCo3DStereo

TINY = dict(patch_size=16, enc_embed_dim=64, enc_depth=2, enc_num_heads=2,
            dec_embed_dim=48, dec_depth=2, dec_num_heads=2)


class TestArchString:
    def test_published_512_dpt_string(self):
        arch = ("AsymmetricCroCo3DStereo(pos_embed='RoPE100', "
                "patch_embed_cls='ManyAR_PatchEmbed', "
                "img_size=(512, 512), head_type='dpt', output_mode='pts3d', "
                "depth_mode=('exp', -inf, inf), conf_mode=('exp', 1, inf), "
                "enc_embed_dim=1024, enc_depth=24, enc_num_heads=16, "
                "dec_embed_dim=768, dec_depth=12, dec_num_heads=12, "
                "landscape_only=False)")
        kw = parse_arch_string(arch)
        assert kw["head_type"] == "dpt"
        assert kw["img_size"] == (512, 512)
        assert kw["depth_mode"] == ("exp", -np.inf, np.inf)
        assert kw["enc_depth"] == 24
        assert "patch_embed_cls" not in kw
        model = model_from_arch_string(arch)
        assert isinstance(model, AsymmetricCroCo3DStereo)
        assert model.landscape_only is False


@pytest.fixture(scope="module")
def converted():
    torch.manual_seed(0)
    tmodel = TorchDust3R(**TINY).eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_torch_state_dict(sd, enc_depth=2, dec_depth=2,
                                         head_type="linear")
    jmodel = AsymmetricCroCo3DStereo(
        img_size=(32, 32), head_type="linear", attn_impl="ref", **TINY)
    return tmodel, jmodel, variables


class TestTorchConversion:
    def test_full_forward_parity(self, converted):
        """Independent torch implementation vs JAX model through the
        converter: outputs must match to float tolerance."""
        tmodel, jmodel, variables = converted
        rng = np.random.default_rng(0)
        img1 = rng.standard_normal((2, 32, 48, 3)).astype(np.float32)
        img2 = rng.standard_normal((2, 32, 48, 3)).astype(np.float32)

        with torch.no_grad():
            tp1, tc1, tp2, tc2 = tmodel(
                torch.from_numpy(img1).permute(0, 3, 1, 2),
                torch.from_numpy(img2).permute(0, 3, 1, 2))

        res1, res2 = jmodel.apply(variables, jnp.asarray(img1),
                                  jnp.asarray(img2))

        np.testing.assert_allclose(np.asarray(res1["pts3d"]), tp1.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(res1["conf"]), tc1.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(res2["pts3d_in_other_view"]),
                                   tp2.numpy(), rtol=1e-4, atol=1e-4)

    def test_single_decoder_duplication(self, converted):
        tmodel, jmodel, _ = converted
        sd = {k: v.numpy() for k, v in tmodel.state_dict().items()
              if not k.startswith("dec_blocks2")}
        variables = convert_torch_state_dict(sd, enc_depth=2, dec_depth=2,
                                             head_type="linear")
        p = variables["params"]
        a = np.asarray(p["dec_blocks_0"]["attn"]["qkv"]["kernel"])
        b = np.asarray(p["dec_blocks2_0"]["attn"]["qkv"]["kernel"])
        np.testing.assert_array_equal(a, b)

    def test_dpt_full_forward_parity(self):
        """DPT-head variant: torch reimplementation vs JAX through the
        converter - validates the entire DPT trunk mapping + composition
        (the highest-risk parity component, SURVEY.md §7)."""
        torch.manual_seed(1)
        cfg = dict(TINY, dec_depth=12)
        tmodel = TorchDust3R(head_type="dpt", **cfg).eval()
        sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
        variables = convert_torch_state_dict(sd, enc_depth=2, dec_depth=12,
                                             head_type="dpt")
        jmodel = AsymmetricCroCo3DStereo(
            img_size=(32, 32), head_type="dpt", attn_impl="ref", **cfg)

        rng = np.random.default_rng(2)
        img1 = rng.standard_normal((1, 32, 48, 3)).astype(np.float32)
        img2 = rng.standard_normal((1, 32, 48, 3)).astype(np.float32)
        with torch.no_grad():
            tp1, tc1, tp2, tc2 = tmodel(
                torch.from_numpy(img1).permute(0, 3, 1, 2),
                torch.from_numpy(img2).permute(0, 3, 1, 2))
        res1, res2 = jmodel.apply(variables, jnp.asarray(img1),
                                  jnp.asarray(img2))
        np.testing.assert_allclose(np.asarray(res1["pts3d"]), tp1.numpy(),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(res1["conf"]), tc1.numpy(),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(res2["pts3d_in_other_view"]),
                                   tp2.numpy(), rtol=1e-3, atol=1e-4)

    def test_warm_start_backbone_only(self, converted, tmp_path):
        """--pretrained with a backbone-only checkpoint (CroCo-V2 style: no
        downstream heads, extra mask_token): backbone weights load, heads
        stay at init, scan layout stacks."""
        from dust3r_tpu.checkpoint import warm_start_params
        tmodel, jmodel, _ = converted
        sd = {k: v for k, v in tmodel.state_dict().items()
              if not k.startswith(("downstream_head", "dec_blocks2"))}
        sd["mask_token"] = torch.zeros(1, 1, 64)
        path = str(tmp_path / "croco.pth")
        torch.save({"model": sd}, path)

        init = jmodel.init(jax.random.PRNGKey(1), jnp.ones((1, 32, 32, 3)),
                           jnp.ones((1, 32, 32, 3)))
        merged = warm_start_params(path, jmodel, init, verbose=False)
        # backbone from the checkpoint
        np.testing.assert_allclose(
            np.asarray(merged["params"]["enc_blocks_0"]["attn"]["qkv"]["kernel"]),
            tmodel.state_dict()["enc_blocks.0.attn.qkv.weight"].numpy().T,
            rtol=1e-6)
        # dec_blocks duplicated into dec_blocks2
        np.testing.assert_array_equal(
            np.asarray(merged["params"]["dec_blocks2_0"]["attn"]["qkv"]["kernel"]),
            np.asarray(merged["params"]["dec_blocks_0"]["attn"]["qkv"]["kernel"]))
        # heads kept at init
        np.testing.assert_array_equal(
            np.asarray(merged["params"]["downstream_head1"]["proj"]["kernel"]),
            np.asarray(init["params"]["downstream_head1"]["proj"]["kernel"]))

        # scan-mode stacking path
        scan_model = jmodel.clone(scan_layers=True)
        stacked = warm_start_params(path, scan_model, init, verbose=False)
        assert "enc_blocks_scan" in stacked["params"]
        assert stacked["params"]["enc_blocks_scan"]["block"]["attn"]["qkv"][
            "kernel"].shape[0] == 2

    def test_param_tree_matches_model_init(self, converted):
        """Converted tree must have exactly the structure model.init makes."""
        tmodel, jmodel, variables = converted
        ref = jmodel.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)),
                          jnp.ones((1, 32, 32, 3)))
        ref_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                     jax.tree_util.tree_flatten_with_path(ref)[0]}
        got_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                     jax.tree_util.tree_flatten_with_path(variables)[0]}
        assert ref_paths == got_paths


class TestReverseConversion:
    def test_torch_roundtrip_linear(self, converted):
        """torch sd -> flax -> torch sd must be bit-exact."""
        from dust3r_tpu.checkpoint import to_torch_state_dict
        tmodel, jmodel, variables = converted
        orig = {k: v.numpy() for k, v in tmodel.state_dict().items()}
        back = to_torch_state_dict(variables, enc_depth=2, dec_depth=2,
                                   head_type="linear")
        assert set(back) == set(orig)
        for k in orig:
            np.testing.assert_array_equal(back[k], orig[k], err_msg=k)

    def test_torch_roundtrip_dpt(self):
        from dust3r_tpu.checkpoint import to_torch_state_dict
        torch.manual_seed(3)
        cfg = dict(TINY, dec_depth=12)
        tmodel = TorchDust3R(head_type="dpt", **cfg).eval()
        orig = {k: v.numpy() for k, v in tmodel.state_dict().items()}
        variables = convert_torch_state_dict(orig, enc_depth=2, dec_depth=12,
                                             head_type="dpt")
        back = to_torch_state_dict(variables, enc_depth=2, dec_depth=12,
                                   head_type="dpt")
        # forward converter accepts both layer_rn namings; inverse emits
        # the layer{k}_rn one - compare values modulo that aliasing
        def canon(k):
            import re
            return re.sub(r"scratch\.layer_rn\.(\d+)",
                          lambda m: f"scratch.layer{int(m.group(1)) + 1}_rn",
                          k)
        orig_c = {canon(k): v for k, v in orig.items()}
        assert set(back) == set(orig_c)
        for k in back:
            np.testing.assert_array_equal(back[k], orig_c[k], err_msg=k)

    def test_save_torch_checkpoint_loads_back(self, converted, tmp_path):
        """save_torch_checkpoint output loads through load_torch_checkpoint
        and reproduces the model outputs."""
        from dust3r_tpu.checkpoint import (save_torch_checkpoint,
                                           load_torch_checkpoint)
        tmodel, jmodel, variables = converted
        p = str(tmp_path / "export.pth")
        save_torch_checkpoint(p, jmodel, variables)
        model2, vars2 = load_torch_checkpoint(p, verbose=False)
        assert model2.enc_depth == jmodel.enc_depth
        assert model2.head_type == "linear"
        for a, b in zip(jax.tree.leaves(vars2), jax.tree.leaves(variables)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestHubLoader:
    """Hub-mixin snapshot loading (reference model.py:47-52,76-85): bare
    state dict in model.safetensors / pytorch_model.bin + config.json
    carrying the constructor kwargs — no {args, model} wrapper."""

    CFG = dict(output_mode="pts3d", head_type="linear",
               depth_mode=["exp", -float("inf"), float("inf")],
               conf_mode=["exp", 1, float("inf")],
               freeze="none", landscape_only=True,
               patch_embed_cls="ManyAR_PatchEmbed",
               img_size=[32, 32], pos_embed="RoPE100", mlp_ratio=4.0,
               **{k: v for k, v in TINY.items()})

    def _write_config(self, tmp_path):
        import json
        cpath = str(tmp_path / "config.json")
        with open(cpath, "w") as f:
            json.dump(self.CFG, f)  # writes -Infinity / Infinity literals
        return cpath

    def test_safetensors_snapshot(self, converted, tmp_path):
        from safetensors.torch import save_file
        from dust3r_tpu.checkpoint import load_hub_checkpoint
        tmodel, jmodel, variables = converted
        wpath = str(tmp_path / "model.safetensors")
        save_file({k: v.contiguous() for k, v in
                   tmodel.state_dict().items()}, wpath)
        model, vars2 = load_hub_checkpoint(
            wpath, self._write_config(tmp_path), verbose=False)
        assert model.head_type == "linear"
        assert model.enc_depth == TINY["enc_depth"]
        assert model.depth_mode == ("exp", -np.inf, np.inf)
        assert model.landscape_only is False  # forced off for inference
        for a, b in zip(jax.tree.leaves(vars2), jax.tree.leaves(variables)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_legacy_bin_snapshot(self, converted, tmp_path):
        from dust3r_tpu.checkpoint import load_hub_checkpoint
        tmodel, jmodel, variables = converted
        wpath = str(tmp_path / "pytorch_model.bin")
        torch.save(tmodel.state_dict(), wpath)
        model, vars2 = load_hub_checkpoint(
            wpath, self._write_config(tmp_path), verbose=False)
        assert model.enc_embed_dim == TINY["enc_embed_dim"]
        for a, b in zip(jax.tree.leaves(vars2), jax.tree.leaves(variables)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bin_full_checkpoint_delegates(self, converted, tmp_path):
        """A .bin that is really a full reference checkpoint (args+model)
        must go through the arch-string path, config.json not needed."""
        from dust3r_tpu.checkpoint import (load_hub_checkpoint,
                                           save_torch_checkpoint)
        tmodel, jmodel, variables = converted
        wpath = str(tmp_path / "pytorch_model.bin")
        save_torch_checkpoint(wpath, jmodel, variables)
        model, vars2 = load_hub_checkpoint(wpath, None, verbose=False)
        assert model.head_type == "linear"

    def test_from_pretrained_local_snapshot_dir(self, converted, tmp_path):
        """from_pretrained must route a LOCAL hub snapshot directory
        (snapshot_download layout) through the mixin loader, not orbax."""
        from safetensors.torch import save_file
        from dust3r_tpu.checkpoint import from_pretrained
        tmodel, jmodel, variables = converted
        save_file({k: v.contiguous() for k, v in
                   tmodel.state_dict().items()},
                  str(tmp_path / "model.safetensors"))
        self._write_config(tmp_path)
        model, vars2 = from_pretrained(str(tmp_path), verbose=False)
        assert model.enc_depth == TINY["enc_depth"]
        for a, b in zip(jax.tree.leaves(vars2), jax.tree.leaves(variables)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_from_pretrained_local_safetensors_file(self, converted,
                                                    tmp_path):
        """...and a direct path to the .safetensors file, sniffing the
        sibling config.json."""
        from safetensors.torch import save_file
        from dust3r_tpu.checkpoint import from_pretrained
        tmodel, jmodel, variables = converted
        wpath = str(tmp_path / "model.safetensors")
        save_file({k: v.contiguous() for k, v in
                   tmodel.state_dict().items()}, wpath)
        self._write_config(tmp_path)
        model, vars2 = from_pretrained(wpath, verbose=False)
        assert model.head_type == "linear"

    def test_from_pretrained_plain_pth_ignores_neighbor_config(
            self, converted, tmp_path):
        """A plain .pth next to an unrelated config.json must go through
        the arch-string path (the neighbor must not define the arch)."""
        from dust3r_tpu.checkpoint import (from_pretrained,
                                           save_torch_checkpoint)
        import json
        tmodel, jmodel, variables = converted
        p = str(tmp_path / "release.pth")
        save_torch_checkpoint(p, jmodel, variables)
        with open(tmp_path / "config.json", "w") as f:
            json.dump({"head_type": "dpt", "unrelated": True}, f)
        model, _ = from_pretrained(p, verbose=False)
        assert model.head_type == "linear"  # from the arch string

    def test_training_style_wrapper_without_arch(self, converted, tmp_path):
        """{model, optimizer, epoch} wrappers (no args/arch) must unwrap
        the inner state dict and take the architecture from config.json."""
        from dust3r_tpu.checkpoint import load_hub_checkpoint
        tmodel, jmodel, variables = converted
        wpath = str(tmp_path / "pytorch_model.bin")
        torch.save({"model": tmodel.state_dict(), "optimizer": {},
                    "epoch": 7}, wpath)
        model, vars2 = load_hub_checkpoint(
            wpath, self._write_config(tmp_path), verbose=False)
        for a, b in zip(jax.tree.leaves(vars2), jax.tree.leaves(variables)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bf16_tensors_upcast_everywhere(self, converted, tmp_path):
        """bf16 tensors (numpy-unrepresentable) must load through BOTH the
        bare-sd path and the wrapped {args, model} path."""
        from dust3r_tpu.checkpoint import (load_hub_checkpoint,
                                           load_torch_checkpoint,
                                           save_torch_checkpoint)
        tmodel, jmodel, variables = converted
        sd_bf16 = {k: v.to(torch.bfloat16) for k, v in
                   tmodel.state_dict().items()}
        wpath = str(tmp_path / "pytorch_model.bin")
        torch.save(sd_bf16, wpath)
        model, vars2 = load_hub_checkpoint(
            wpath, self._write_config(tmp_path), verbose=False)
        leaf = jax.tree.leaves(vars2)[0]
        assert np.isfinite(np.asarray(leaf)).all()
        # wrapped path: reuse the saved arch string, swap in bf16 tensors
        p2 = str(tmp_path / "release.pth")
        save_torch_checkpoint(p2, jmodel, variables)
        ckpt = torch.load(p2, weights_only=False)
        ckpt["model"] = {k: v.to(torch.bfloat16)
                         for k, v in ckpt["model"].items()}
        torch.save(ckpt, p2)
        model2, vars3 = load_torch_checkpoint(p2, verbose=False)
        assert np.isfinite(np.asarray(jax.tree.leaves(vars3)[0])).all()

    def test_hub_config_string_inf_and_nested_kwargs(self):
        """Defensive parsing: string 'inf' forms and croco_kwargs nesting."""
        from dust3r_tpu.checkpoint import model_from_hub_config
        cfg = dict(output_mode="pts3d", head_type="dpt",
                   depth_mode=["exp", "-inf", "inf"],
                   conf_mode=None, patch_embed_cls="PatchEmbedDust3R",
                   croco_kwargs=dict(img_size=224, **TINY))
        model = model_from_hub_config(cfg)
        assert model.head_type == "dpt"
        assert model.img_size == (224, 224)
        assert model.depth_mode == ("exp", -np.inf, np.inf)
        assert model.conf_mode is None


class TestAllowMissingWholeComponent:
    def test_partial_block_skipped_whole(self, converted):
        """allow_missing must skip a half-present component ENTIRELY: no
        silent half-checkpoint/half-init hybrid (a block with qkv present
        but mlp.fc2 missing contributes nothing to the tree)."""
        tmodel, jmodel, _ = converted
        sd = {k: v.numpy() for k, v in tmodel.state_dict().items()
              if k != "enc_blocks.1.mlp.fc2.weight"}
        tree = convert_torch_state_dict(sd, enc_depth=2, dec_depth=2,
                                        head_type="linear",
                                        allow_missing=True, verbose=False)
        params = tree["params"]
        assert "enc_blocks_1" not in params  # whole block left at init
        assert "enc_blocks_0" in params      # intact blocks still convert


class TestArchRoundTripNonDefaults:
    def test_patch_size_and_mlp_ratio_persist(self, tmp_path):
        """save_torch_checkpoint must record patch_size and mlp_ratio so
        non-default models round-trip (reference persists the full ctor
        string in args.model)."""
        from dust3r_tpu.checkpoint import (save_torch_checkpoint,
                                           load_torch_checkpoint)
        cfg = dict(TINY, patch_size=8)
        jmodel = AsymmetricCroCo3DStereo(
            img_size=(32, 32), head_type="linear", attn_impl="ref",
            mlp_ratio=2.0, **cfg)
        variables = jmodel.init(jax.random.PRNGKey(0),
                                jnp.ones((1, 32, 32, 3)),
                                jnp.ones((1, 32, 32, 3)))
        p = str(tmp_path / "nondefault.pth")
        save_torch_checkpoint(p, jmodel, variables)
        model2, vars2 = load_torch_checkpoint(p, verbose=False)
        assert model2.patch_size == 8
        assert model2.mlp_ratio == 2.0
        for a, b in zip(jax.tree.leaves(vars2), jax.tree.leaves(variables)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestOrbax:
    def test_save_load_roundtrip(self, tmp_path):
        state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
                 "step": jnp.asarray(7)}
        path = str(tmp_path / "ckpt-1")
        save_checkpoint(path, state, metadata={"arch": "test"})
        restored, meta = load_checkpoint(path)
        assert meta == {"arch": "test"}
        np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                      np.arange(6.0).reshape(2, 3))
        assert int(restored["step"]) == 7
