"""Validate the torch->flax converter against a REAL published checkpoint.

The round-1 parity evidence was self-referential: the converter had only
ever been exercised against this repo's own torch reimplementation
(tests/torch_ref_model.py). This script makes real-checkpoint validation a
one-command operation the moment any published .pth is available
(zero-egress environments can't download one):

    python scripts/validate_real_ckpt.py DUSt3R_ViTLarge_BaseDecoder_512_dpt.pth \
        [--ref-outputs ref_outputs.npz] [--save-outputs jax_outputs.npz]

Accepted checkpoint forms (all layouts the weights are published in):
  - release .pth with the {args, model} wrapper (naver download page)
  - HF hub-mixin snapshot: model.safetensors (or bare pytorch_model.bin)
    with config.json beside it (reference dust3r/model.py:47-52) — pass
    either the file or the snapshot DIRECTORY

What it checks:
  1. NAME COVERAGE - every checkpoint tensor is either consumed by the
     converter or on the known-ignorable list (mask_token, rope buffers).
     Unknown leftovers are a hard failure: they mean the reconstructed
     block structure is missing something real CroCo has.
  2. ROUND TRIP - flax -> to_torch_state_dict -> bit-compare against the
     original: every consumed tensor must be exactly equal (proves the
     name map + layout transposes are involutive, reference
     dust3r/model.py:91-98 duplication included).
  3. FORWARD - runs the converted model on a deterministic input and
     prints output stats; with --ref-outputs (an .npz recorded by running
     the torch reference on the same input: keys pts3d1, conf1, pts3d2,
     conf2, img1, img2) it reports RMSE vs the reference against the
     1e-2 budget (BASELINE.md).
  4. --save-outputs writes the JAX outputs + inputs so the comparison can
     be produced on any machine that can run the torch reference.
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

# tensors real checkpoints contain that the flax model intentionally
# has no equivalent of (reference model.py:104 freezes mask_token; rope
# frequency buffers are recomputed, not stored)
IGNORABLE = ("mask_token", "rope", "enc_pos_embed", "dec_pos_embed")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", help="published .pth checkpoint")
    ap.add_argument("--ref-outputs", default=None,
                    help=".npz with reference pts3d1/conf1/pts3d2/conf2")
    ap.add_argument("--save-outputs", default=None,
                    help="write inputs+outputs .npz for offline comparison")
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "force-registers the TPU; env vars don't override "
                         "it - required when a TPU process is running)")
    args = ap.parse_args()

    import torch
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from dust3r_tpu.checkpoint import (model_from_arch_string,
                                       model_from_hub_config,
                                       convert_torch_state_dict,
                                       to_torch_state_dict)

    # resolve a hub snapshot directory to its weights file
    import os
    from dust3r_tpu.checkpoint import _sd_to_numpy

    HUB_NAMES = ("model.safetensors", "pytorch_model.bin")
    ckpt_path, config_path = args.ckpt, None
    if os.path.isdir(ckpt_path):
        d = ckpt_path
        for name in HUB_NAMES:
            if os.path.isfile(os.path.join(d, name)):
                ckpt_path = os.path.join(d, name)
                break
        if os.path.isfile(os.path.join(d, "config.json")):
            config_path = os.path.join(d, "config.json")
    elif (ckpt_path.endswith(".safetensors")
          or os.path.basename(ckpt_path) in HUB_NAMES):
        # only sniff a sibling config.json next to hub-named weights: an
        # unrelated config.json must not silently define the architecture
        sib = os.path.join(os.path.dirname(os.path.abspath(ckpt_path)),
                           "config.json")
        if os.path.isfile(sib):
            config_path = sib

    arch = hub_cfg = None
    if ckpt_path.endswith(".safetensors"):
        from safetensors import torch as st

        sd = _sd_to_numpy(st.load_file(ckpt_path))
    else:
        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        if isinstance(ckpt, dict) and "model" in ckpt and (
                "args" in ckpt or "arch" in ckpt):
            sd = _sd_to_numpy(ckpt["model"])
            arch = getattr(ckpt.get("args", None), "model", None) \
                or ckpt.get("arch")
        elif isinstance(ckpt, dict) and isinstance(ckpt.get("model"), dict):
            sd = _sd_to_numpy(ckpt["model"])  # training-style wrapper
        else:  # bare hub-mixin state dict
            sd = _sd_to_numpy(ckpt)
    if arch is None and config_path:
        import json

        with open(config_path) as f:
            hub_cfg = json.load(f)
        print(f"architecture from hub config: {config_path}")
    # canonicalize the DPT scratch-projection naming: both the attr form
    # (scratch.layer{k}_rn) and the ModuleList form (scratch.layer_rn.{k-1})
    # appear in the wild; the converter accepts either but the exporter
    # emits the attr form, so coverage/round-trip compare in that form
    for key in list(sd):
        for idx in range(4):
            if f"scratch.layer_rn.{idx}" in key:
                sd[key.replace(f"scratch.layer_rn.{idx}",
                               f"scratch.layer{idx + 1}_rn")] = sd.pop(key)
    if arch is not None:
        print(f"arch: {arch}")
        model = model_from_arch_string(arch, landscape_only=False)
    elif hub_cfg is not None:
        model = model_from_hub_config(hub_cfg, landscape_only=False)
    else:
        arch = ("AsymmetricCroCo3DStereo(pos_embed='RoPE100', "
                "img_size=(512, 512), head_type='dpt', output_mode='pts3d', "
                "depth_mode=('exp', -inf, inf), conf_mode=('exp', 1, inf), "
                "enc_embed_dim=1024, enc_depth=24, enc_num_heads=16, "
                "dec_embed_dim=768, dec_depth=12, dec_num_heads=12)")
        print(f"[warn] no arch string or config.json, assuming 512_dpt")
        model = model_from_arch_string(arch, landscape_only=False)

    # ---- 1. name coverage ------------------------------------------------
    # duplicate-single-decoder exactly like reference model.py:91-98
    if not any(k.startswith("dec_blocks2") for k in sd):
        for key in list(sd):
            if key.startswith("dec_blocks."):
                sd[key.replace("dec_blocks.", "dec_blocks2.", 1)] = sd[key]
        print("single-decoder checkpoint: duplicated dec_blocks -> dec_blocks2")

    variables = convert_torch_state_dict(
        sd, enc_depth=model.enc_depth, dec_depth=model.dec_depth,
        head_type=model.head_type, verbose=True)

    back = to_torch_state_dict(variables, enc_depth=model.enc_depth,
                               dec_depth=model.dec_depth,
                               head_type=model.head_type)
    unknown = [k for k in sd
               if k not in back and not any(t in k for t in IGNORABLE)]
    if unknown:
        print(f"FAIL name coverage: {len(unknown)} checkpoint tensors the "
              f"converter does not consume:")
        for k in unknown[:20]:
            print(f"  {k}  {sd[k].shape}")
        sys.exit(1)
    print(f"name coverage OK: {len(back)} tensors consumed, "
          f"{len(sd) - len(back)} ignorable")

    # ---- 2. bit-exact round trip ----------------------------------------
    bad = [k for k in back if not np.array_equal(back[k], sd[k])]
    if bad:
        print(f"FAIL round trip: {len(bad)} tensors differ after "
              f"flax->torch export: {bad[:10]}")
        sys.exit(1)
    print(f"round trip OK: all {len(back)} tensors bit-exact")

    # ---- 3. deterministic forward ---------------------------------------
    H, W = args.height, args.width
    if model.head_type == "linear" and model.img_size == (224, 224):
        H = W = 224
    rng = np.random.default_rng(0)
    img1 = rng.uniform(-1, 1, (1, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(-1, 1, (1, H, W, 3)).astype(np.float32)

    @jax.jit
    def fwd(v, i1, i2):
        return model.apply(v, i1, i2)

    res1, res2 = fwd(variables, jnp.asarray(img1), jnp.asarray(img2))
    outs = dict(pts3d1=np.asarray(res1["pts3d"]),
                conf1=np.asarray(res1["conf"]),
                pts3d2=np.asarray(res2["pts3d_in_other_view"]),
                conf2=np.asarray(res2["conf"]))
    for k, v in outs.items():
        print(f"  {k}: shape {v.shape} mean {v.mean():+.6f} "
              f"std {v.std():.6f}")

    if args.save_outputs:
        np.savez(args.save_outputs, img1=img1, img2=img2, **outs)
        print(f"saved inputs+outputs to {args.save_outputs}")
        print("to record the reference side, run the torch model on "
              "img1/img2 (NCHW, same values) and save the same keys.")

    if args.ref_outputs:
        ref = np.load(args.ref_outputs)
        worst = 0.0
        for k in ("pts3d1", "pts3d2", "conf1", "conf2"):
            rmse = float(np.sqrt(np.mean((outs[k] - ref[k]) ** 2)))
            scale = float(np.sqrt(np.mean(ref[k] ** 2)))
            rel = rmse / max(scale, 1e-9)
            worst = max(worst, rmse if k.startswith("pts3d") else 0.0)
            print(f"  {k}: RMSE {rmse:.2e} (rel {rel:.2e})")
        budget = 1e-2
        if worst <= budget:
            print(f"PARITY OK: pointmap RMSE {worst:.2e} <= {budget}")
        else:
            print(f"FAIL parity: pointmap RMSE {worst:.2e} > {budget}")
            sys.exit(1)

    print("ALL CHECKS PASSED")


if __name__ == "__main__":
    main()
