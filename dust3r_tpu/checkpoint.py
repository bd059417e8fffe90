"""Checkpointing: orbax save/load + one-way torch-.pth -> flax converter.

Behavioral contract: reference checkpoint semantics (SURVEY.md §5):
checkpoint dict {args, model, optimizer, epoch, best_so_far} with the
architecture string persisted and re-parsed at load (dust3r/model.py:27-43,
but parsed into typed kwargs instead of raw eval); single-decoder
checkpoints are duplicated into dec_blocks2 (model.py:91-98).

The torch converter maps the published checkpoints' ~600 tensors onto the
flax param tree: Linear/Conv weights transposed to (in, out) / HWIO, the
DPT patch-expand layers copied directly (torch ConvTranspose layout is this
module's native layout).
"""
from __future__ import annotations

import ast
import math
import os
import re

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------- #
# orbax-based native checkpointing
# ---------------------------------------------------------------------- #

def save_checkpoint(path, state, metadata=None):
    """Save a train/eval state pytree (orbax StandardCheckpointer)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    if metadata is not None:
        import json
        with open(os.path.join(path, "dust3r_meta.json"), "w") as f:
            json.dump(metadata, f)


def load_checkpoint(path, target=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path, target)
    meta_path = os.path.join(path, "dust3r_meta.json")
    metadata = None
    if os.path.exists(meta_path):
        import json
        with open(meta_path) as f:
            metadata = json.load(f)
    return state, metadata


# ---------------------------------------------------------------------- #
# architecture-string parsing (replaces the reference's raw eval)
# ---------------------------------------------------------------------- #

def parse_arch_string(arch):
    """'AsymmetricCroCo3DStereo(a=1, b=(2, 3), ...)' -> kwargs dict.

    Safe replacement for the reference's eval (model.py:27-43); supports
    the tokens appearing in published configs (inf, tuples, strings).
    """
    m = re.match(r"\s*(\w+)\((.*)\)\s*$", arch, re.S)
    assert m, f"cannot parse arch string: {arch!r}"
    name, argstr = m.groups()
    assert name == "AsymmetricCroCo3DStereo", f"unknown architecture {name}"
    # make it literal_eval-able: inf -> 1e999 (parses to float inf)
    argstr = re.sub(r"(?<![\w.])inf(?![\w.])", "float('inf')", argstr)
    tree = ast.parse(f"dict({argstr})", mode="eval")

    def ev(node):
        if isinstance(node, ast.Call):
            if getattr(node.func, "id", None) == "dict":
                return {kw.arg: ev(kw.value) for kw in node.keywords}
            if getattr(node.func, "id", None) == "float":
                return float(ev(node.args[0]))
            raise ValueError(f"unsupported call in arch string: {ast.dump(node)}")
        if isinstance(node, ast.Constant):
            return node.value
        if isinstance(node, ast.Tuple):
            return tuple(ev(e) for e in node.elts)
        if isinstance(node, ast.List):
            return [ev(e) for e in node.elts]
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            return -ev(node.operand)
        if isinstance(node, ast.Name) and node.id == "inf":
            return math.inf
        raise ValueError(f"unsupported node in arch string: {ast.dump(node)}")

    kwargs = ev(tree.body)
    kwargs.pop("patch_embed_cls", None)  # TPU build has one patch embed
    return kwargs


def model_from_arch_string(arch, landscape_only=False, **overrides):
    from .models.model import AsymmetricCroCo3DStereo

    kwargs = parse_arch_string(arch)
    kwargs["landscape_only"] = landscape_only
    kwargs.update(overrides)
    # img_size may arrive as a bare int
    if isinstance(kwargs.get("img_size"), int):
        kwargs["img_size"] = (kwargs["img_size"], kwargs["img_size"])
    return AsymmetricCroCo3DStereo(**kwargs)


def model_from_hub_config(cfg, landscape_only=False, **overrides):
    """Build the model from a PyTorchModelHubMixin ``config.json`` dict.

    The reference class is a hub mixin (dust3r/model.py:47-52): its repos
    serialize the ``__init__`` kwargs (output_mode/head_type/depth_mode/
    conf_mode/landscape_only/patch_embed_cls + the croco kwargs) to
    config.json. Torch-only keys (freeze, patch_embed_cls, ...) are
    dropped; JSON-mangled infinities in depth/conf modes are restored.
    """
    import dataclasses

    from .models.model import AsymmetricCroCo3DStereo

    cfg = dict(cfg)
    # some mixin versions keep the croco kwargs grouped under one key
    nested = cfg.pop("croco_kwargs", None)
    if isinstance(nested, dict):
        cfg.update(nested)
    fields = {f.name for f in dataclasses.fields(AsymmetricCroCo3DStereo)
              if f.name not in ("parent", "name", "dtype", "head_dtype")}

    def fix_inf(x):
        if isinstance(x, str) and x.lstrip("+-") in ("inf", "Infinity"):
            return math.inf if not x.startswith("-") else -math.inf
        return x

    kwargs = {}
    for k, v in cfg.items():
        if k not in fields:
            continue
        if isinstance(v, (list, tuple)):
            v = tuple(fix_inf(x) for x in v)
        kwargs[k] = v
    if isinstance(kwargs.get("img_size"), int):
        kwargs["img_size"] = (kwargs["img_size"], kwargs["img_size"])
    kwargs["landscape_only"] = landscape_only
    kwargs.update(overrides)
    return AsymmetricCroCo3DStereo(**kwargs)


# ---------------------------------------------------------------------- #
# torch state-dict conversion
# ---------------------------------------------------------------------- #

class _TrackedDict(dict):
    """dict recording which keys were read (to report leftovers)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self._used = set()

    def __getitem__(self, k):
        self._used.add(k)
        return super().__getitem__(k)

    def unused(self):
        return sorted(set(self.keys()) - self._used)


def _set(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _linear(sd, tree, tname, fpath):
    _set(tree, fpath + ("kernel",), np.ascontiguousarray(sd[tname + ".weight"].T))
    if tname + ".bias" in sd:
        _set(tree, fpath + ("bias",), sd[tname + ".bias"])


def _conv(sd, tree, tname, fpath, bias=True):
    w = sd[tname + ".weight"]  # (out, in, kh, kw) -> (kh, kw, in, out)
    _set(tree, fpath + ("kernel",), np.ascontiguousarray(w.transpose(2, 3, 1, 0)))
    if bias and tname + ".bias" in sd:
        _set(tree, fpath + ("bias",), sd[tname + ".bias"])


def _convT(sd, tree, tname, fpath):
    # torch ConvTranspose2d weight (in, out, kh, kw) == _PatchExpand layout
    _set(tree, fpath + ("kernel",), sd[tname + ".weight"])
    _set(tree, fpath + ("bias",), sd[tname + ".bias"])


def _ln(sd, tree, tname, fpath):
    _set(tree, fpath + ("ln", "scale"), sd[tname + ".weight"])
    _set(tree, fpath + ("ln", "bias"), sd[tname + ".bias"])


def _block(sd, tree, t, f):
    """Encoder Block tensors."""
    _ln(sd, tree, f"{t}.norm1", f + ("norm1",))
    _linear(sd, tree, f"{t}.attn.qkv", f + ("attn", "qkv"))
    _linear(sd, tree, f"{t}.attn.proj", f + ("attn", "proj"))
    _ln(sd, tree, f"{t}.norm2", f + ("norm2",))
    _linear(sd, tree, f"{t}.mlp.fc1", f + ("mlp", "fc1"))
    _linear(sd, tree, f"{t}.mlp.fc2", f + ("mlp", "fc2"))


def _dec_block(sd, tree, t, f):
    _ln(sd, tree, f"{t}.norm1", f + ("norm1",))
    _linear(sd, tree, f"{t}.attn.qkv", f + ("attn", "qkv"))
    _linear(sd, tree, f"{t}.attn.proj", f + ("attn", "proj"))
    _ln(sd, tree, f"{t}.norm_y", f + ("norm_y",))
    _ln(sd, tree, f"{t}.norm2", f + ("norm2",))
    for p in ("projq", "projk", "projv", "proj"):
        _linear(sd, tree, f"{t}.cross_attn.{p}", f + ("cross_attn", p))
    _ln(sd, tree, f"{t}.norm3", f + ("norm3",))
    _linear(sd, tree, f"{t}.mlp.fc1", f + ("mlp", "fc1"))
    _linear(sd, tree, f"{t}.mlp.fc2", f + ("mlp", "fc2"))


def _dpt_head(sd, tree, t, f):
    """DPT head tensors (croco/MultiMAE DPTOutputAdapter naming)."""
    def rn_name(k):
        # both scratch.layer_rn.{idx} and scratch.layer{k}_rn appear in the
        # wild depending on the ModuleList/attr registration
        for cand in (f"{t}.dpt.scratch.layer_rn.{k - 1}",
                     f"{t}.dpt.scratch.layer{k}_rn"):
            if cand + ".weight" in sd:
                return cand
        raise KeyError(f"missing scratch layer_rn {k} for {t}")

    _conv(sd, tree, f"{t}.dpt.act_postprocess.0.0", f + ("act_0_proj",))
    _convT(sd, tree, f"{t}.dpt.act_postprocess.0.1", f + ("act_0_up4",))
    _conv(sd, tree, f"{t}.dpt.act_postprocess.1.0", f + ("act_1_proj",))
    _convT(sd, tree, f"{t}.dpt.act_postprocess.1.1", f + ("act_1_up2",))
    _conv(sd, tree, f"{t}.dpt.act_postprocess.2.0", f + ("act_2_proj",))
    _conv(sd, tree, f"{t}.dpt.act_postprocess.3.0", f + ("act_3_proj",))
    _conv(sd, tree, f"{t}.dpt.act_postprocess.3.1", f + ("act_3_down2",))
    for k in range(1, 5):
        _conv(sd, tree, rn_name(k), f + (f"layer{k}_rn",), bias=False)
        rf = f"{t}.dpt.scratch.refinenet{k}"
        for unit in ("resConfUnit1", "resConfUnit2"):
            # refinenet4's resConfUnit1 is dead weight (its forward never
            # receives a residual input): real torch checkpoints carry it,
            # exports from a flax init don't - accept both
            if f"{rf}.{unit}.conv1.weight" not in sd and k == 4 \
                    and unit == "resConfUnit1":
                continue
            for conv in ("conv1", "conv2"):
                _conv(sd, tree, f"{rf}.{unit}.{conv}",
                      f + (f"refinenet{k}", unit, conv))
        _conv(sd, tree, f"{rf}.out_conv", f + (f"refinenet{k}", "out_conv"))
    _conv(sd, tree, f"{t}.dpt.head.0", f + ("head_conv1",))
    _conv(sd, tree, f"{t}.dpt.head.2", f + ("head_conv2",))
    _conv(sd, tree, f"{t}.dpt.head.4", f + ("head_conv3",))


def convert_torch_state_dict(sd, enc_depth=24, dec_depth=12,
                             head_type="linear", verbose=False,
                             allow_missing=False):
    """torch state dict (tensor name -> numpy array) -> flax variables.

    Unconsumed tensors (e.g. mask_token, rope buffers) are reported when
    verbose - useful to audit real published checkpoints.

    allow_missing: skip components whose tensors are absent instead of
    raising - the training --pretrained path uses this to warm-start from a
    backbone-only checkpoint (e.g. CroCo-V2, which has no downstream heads;
    the reference loads those with strict=False via croco's load_model,
    reference dust3r/training.py:145-151). Deliberately STRICTER than the
    reference's per-tensor strict=False: a component with some tensors
    present and some missing is skipped WHOLE (and reported with the
    missing key) rather than silently loaded half-checkpoint/half-init.
    """
    sd = _TrackedDict({k: np.asarray(v) for k, v in sd.items()})

    # duplicate single decoder into dec_blocks2 (reference model.py:91-98);
    # read through dict.__getitem__ so this bookkeeping copy doesn't mark
    # dec_blocks.* tensors as consumed — otherwise the verbose
    # leftover-tensor audit can never flag an unconsumed decoder tensor
    if not any(k.startswith("dec_blocks2") for k in sd):
        for key in list(sd.keys()):
            if key.startswith("dec_blocks."):
                sd[key.replace("dec_blocks.", "dec_blocks2.", 1)] = \
                    dict.__getitem__(sd, key)

    tree = {}
    skipped = []

    def _merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                _merge(dst.setdefault(k, {}), v)
            else:
                dst[k] = v

    def go(fn, *args):
        # build into a scratch tree and merge only on success: a component
        # with SOME tensors present and some missing must be skipped whole
        # (allow_missing), not left as a silent half-checkpoint/half-init
        # hybrid that the skip message claims was kept at init
        scratch = {}
        try:
            fn(sd, scratch, *args)
        except KeyError as e:
            if not allow_missing:
                raise
            skipped.append((args[0], e.args[0] if e.args else "?"))
            return
        _merge(tree, scratch)

    go(_conv, "patch_embed.proj", ("patch_embed", "proj"))
    for i in range(enc_depth):
        go(_block, f"enc_blocks.{i}", (f"enc_blocks_{i}",))
    go(_ln, "enc_norm", ("enc_norm",))
    go(_linear, "decoder_embed", ("decoder_embed",))
    for i in range(dec_depth):
        go(_dec_block, f"dec_blocks.{i}", (f"dec_blocks_{i}",))
        go(_dec_block, f"dec_blocks2.{i}", (f"dec_blocks2_{i}",))
    go(_ln, "dec_norm", ("dec_norm",))

    for n in (1, 2):
        t = f"downstream_head{n}"
        f = (t,)
        if head_type == "linear":
            go(_linear, f"{t}.proj", f + ("proj",))
        else:
            go(_dpt_head, t, f)
    if verbose and skipped:
        shown = [f"{c} (missing {k})" for c, k in skipped[:6]]
        print(f"converter: {len(skipped)} components incomplete in "
              f"checkpoint, kept WHOLE at init: {shown}"
              + (" ..." if len(skipped) > 6 else ""))

    if verbose:
        leftovers = [k for k in sd.unused() if not k.endswith("num_batches_tracked")]
        if leftovers:
            print(f"converter: {len(leftovers)} unused checkpoint tensors "
                  f"(expected for mask_token/rope buffers): {leftovers[:10]}"
                  + (" ..." if len(leftovers) > 10 else ""))

    params = jax.tree.map(jnp.asarray, tree)
    return {"params": params}


def to_torch_state_dict(variables, enc_depth=24, dec_depth=12,
                        head_type="linear"):
    """Inverse of convert_torch_state_dict: flax variables -> torch-style
    state dict (numpy arrays, reference tensor names). Lets TPU-trained
    weights flow back into the torch ecosystem; the roundtrip is tested
    bit-exactly."""
    params = variables["params"]
    sd = {}

    def get(path):
        node = params
        for k in path:
            node = node[k]
        return np.array(node)

    def linear(t, f):
        sd[t + ".weight"] = np.ascontiguousarray(get(f + ("kernel",)).T)
        try:
            sd[t + ".bias"] = get(f + ("bias",))
        except KeyError:
            pass

    def conv(t, f, bias=True):
        w = get(f + ("kernel",))  # HWIO -> OIHW
        sd[t + ".weight"] = np.ascontiguousarray(w.transpose(3, 2, 0, 1))
        if bias:
            sd[t + ".bias"] = get(f + ("bias",))

    def convT(t, f):
        sd[t + ".weight"] = get(f + ("kernel",))
        sd[t + ".bias"] = get(f + ("bias",))

    def ln(t, f):
        sd[t + ".weight"] = get(f + ("ln", "scale"))
        sd[t + ".bias"] = get(f + ("ln", "bias"))

    def block(t, f):
        ln(f"{t}.norm1", f + ("norm1",))
        linear(f"{t}.attn.qkv", f + ("attn", "qkv"))
        linear(f"{t}.attn.proj", f + ("attn", "proj"))
        ln(f"{t}.norm2", f + ("norm2",))
        linear(f"{t}.mlp.fc1", f + ("mlp", "fc1"))
        linear(f"{t}.mlp.fc2", f + ("mlp", "fc2"))

    def dec_block(t, f):
        ln(f"{t}.norm1", f + ("norm1",))
        linear(f"{t}.attn.qkv", f + ("attn", "qkv"))
        linear(f"{t}.attn.proj", f + ("attn", "proj"))
        ln(f"{t}.norm_y", f + ("norm_y",))
        ln(f"{t}.norm2", f + ("norm2",))
        for p in ("projq", "projk", "projv", "proj"):
            linear(f"{t}.cross_attn.{p}", f + ("cross_attn", p))
        ln(f"{t}.norm3", f + ("norm3",))
        linear(f"{t}.mlp.fc1", f + ("mlp", "fc1"))
        linear(f"{t}.mlp.fc2", f + ("mlp", "fc2"))

    def dpt_head(t, f):
        conv(f"{t}.dpt.act_postprocess.0.0", f + ("act_0_proj",))
        convT(f"{t}.dpt.act_postprocess.0.1", f + ("act_0_up4",))
        conv(f"{t}.dpt.act_postprocess.1.0", f + ("act_1_proj",))
        convT(f"{t}.dpt.act_postprocess.1.1", f + ("act_1_up2",))
        conv(f"{t}.dpt.act_postprocess.2.0", f + ("act_2_proj",))
        conv(f"{t}.dpt.act_postprocess.3.0", f + ("act_3_proj",))
        conv(f"{t}.dpt.act_postprocess.3.1", f + ("act_3_down2",))
        for k in range(1, 5):
            conv(f"{t}.dpt.scratch.layer{k}_rn", f + (f"layer{k}_rn",),
                 bias=False)
            rf = f"{t}.dpt.scratch.refinenet{k}"
            for unit in ("resConfUnit1", "resConfUnit2"):
                # refinenet4 takes no residual input, so its resConfUnit1
                # is dead weight: torch checkpoints carry it, but a flax
                # INIT tree never instantiates it (converted-from-torch
                # trees do, and then it round-trips bit-exactly). ONLY that
                # case may be absent - any other missing unit is a broken
                # tree and must raise.
                if k == 4 and unit == "resConfUnit1" and \
                        unit not in params[f[0]][f"refinenet{k}"]:
                    continue
                for c in ("conv1", "conv2"):
                    conv(f"{rf}.{unit}.{c}", f + (f"refinenet{k}", unit, c))
            conv(f"{rf}.out_conv", f + (f"refinenet{k}", "out_conv"))
        conv(f"{t}.dpt.head.0", f + ("head_conv1",))
        conv(f"{t}.dpt.head.2", f + ("head_conv2",))
        conv(f"{t}.dpt.head.4", f + ("head_conv3",))

    conv("patch_embed.proj", ("patch_embed", "proj"))
    for i in range(enc_depth):
        block(f"enc_blocks.{i}", (f"enc_blocks_{i}",))
    ln("enc_norm", ("enc_norm",))
    linear("decoder_embed", ("decoder_embed",))
    for i in range(dec_depth):
        dec_block(f"dec_blocks.{i}", (f"dec_blocks_{i}",))
        dec_block(f"dec_blocks2.{i}", (f"dec_blocks2_{i}",))
    ln("dec_norm", ("dec_norm",))
    for n in (1, 2):
        t = f"downstream_head{n}"
        if head_type == "linear":
            linear(f"{t}.proj", (t, "proj"))
        else:
            dpt_head(t, (t,))
    return sd


def save_torch_checkpoint(path, model, variables, extra=None):
    """Write a reference-loadable .pth: {'model': state_dict, 'args': ...}.

    The arch string stored makes the file loadable by BOTH this framework's
    load_torch_checkpoint and the reference's load_model."""
    import torch
    from argparse import Namespace

    if "enc_blocks_scan" in variables.get("params", {}):
        variables = unstack_scan_params(variables, model.enc_depth,
                                        model.dec_depth)
    sd = to_torch_state_dict(variables, enc_depth=model.enc_depth,
                             dec_depth=model.dec_depth,
                             head_type=model.head_type)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    arch = (
        f"AsymmetricCroCo3DStereo(pos_embed={model.pos_embed!r}, "
        f"img_size={tuple(model.img_size)}, "
        f"patch_size={model.patch_size}, "
        f"head_type={model.head_type!r}, "
        f"output_mode={model.output_mode!r}, "
        f"depth_mode={tuple(model.depth_mode)}, "
        f"conf_mode={tuple(model.conf_mode) if model.conf_mode else None}, "
        f"enc_embed_dim={model.enc_embed_dim}, enc_depth={model.enc_depth}, "
        f"enc_num_heads={model.enc_num_heads}, "
        f"dec_embed_dim={model.dec_embed_dim}, dec_depth={model.dec_depth}, "
        f"dec_num_heads={model.dec_num_heads}, "
        f"mlp_ratio={model.mlp_ratio})")
    ckpt = dict(model=sd, args=Namespace(model=arch), **(extra or {}))
    torch.save(ckpt, path)


def overlay_params(init_variables, partial_variables):
    """Merge a (possibly partial) converted tree over freshly-initialized
    params: checkpoint values win where present, init values fill the rest.
    Shape mismatches raise (wrong architecture for this checkpoint)."""
    def merge(init, part):
        if not isinstance(part, dict):
            assert getattr(init, "shape", None) == part.shape, \
                f"shape mismatch: ckpt {part.shape} vs model {init.shape}"
            return part
        out = dict(init)
        for k, v in part.items():
            assert k in init, f"checkpoint key {k!r} not in model params"
            out[k] = merge(init[k], v)
        return out

    return merge(init_variables, partial_variables)


def warm_start_params(path, model, init_variables, verbose=True):
    """Training --pretrained path: load a torch .pth (full DUSt3R or a
    backbone-only checkpoint like CroCo-V2) and overlay it onto the train
    model's init params. The architecture comes from `model` (the --model
    arg), NOT from the checkpoint - matching the reference, which builds
    the model from args and loads weights non-strictly
    (reference dust3r/training.py:127,145-151)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}
    converted = convert_torch_state_dict(
        sd, enc_depth=model.enc_depth, dec_depth=model.dec_depth,
        head_type=model.head_type, verbose=verbose, allow_missing=True)
    merged = overlay_params(init_variables, converted)
    if model.scan_layers:
        merged = stack_scan_params(
            unstack_noop_guard(merged), model.enc_depth, model.dec_depth)
    return merged


def unstack_noop_guard(variables):
    """warm_start merges into a LOOP-layout init tree; callers with a scan
    model must init in loop layout first (training.train does)."""
    assert "enc_blocks_0" in variables["params"], \
        "warm_start_params expects loop-layout init params"
    return variables


def stack_scan_params(variables, enc_depth, dec_depth):
    """Per-layer param tree -> scan_layers=True layout.

    enc_blocks_{i} stack into enc_blocks_scan/block (leading depth axis);
    dec_blocks_{i}/dec_blocks2_{i} into dec_blocks_scan/block1|block2.
    """
    params = dict(variables["params"])

    def stack(prefix, n):
        layers = [params.pop(f"{prefix}_{i}") for i in range(n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    enc = stack("enc_blocks", enc_depth)
    dec1 = stack("dec_blocks", dec_depth)
    dec2 = stack("dec_blocks2", dec_depth)
    params["enc_blocks_scan"] = {"block": enc}
    params["dec_blocks_scan"] = {"block1": dec1, "block2": dec2}
    return {"params": params}


def unstack_scan_params(variables, enc_depth, dec_depth):
    """Inverse of stack_scan_params (scan layout -> per-layer tree)."""
    params = dict(variables["params"])
    enc = params.pop("enc_blocks_scan")["block"]
    dec = params.pop("dec_blocks_scan")
    for i in range(enc_depth):
        params[f"enc_blocks_{i}"] = jax.tree.map(lambda x, i=i: x[i], enc)
    for i in range(dec_depth):
        params[f"dec_blocks_{i}"] = jax.tree.map(lambda x, i=i: x[i],
                                                 dec["block1"])
        params[f"dec_blocks2_{i}"] = jax.tree.map(lambda x, i=i: x[i],
                                                  dec["block2"])
    return {"params": params}


def _sd_to_numpy(sd):
    """torch state dict -> numpy arrays; bf16 tensors (which numpy cannot
    represent) are upcast through fp32 via torch."""
    import torch

    out = {}
    for k, v in sd.items():
        if isinstance(v, torch.Tensor):
            v = (v.float() if v.dtype == torch.bfloat16 else v).numpy()
        out[k] = np.asarray(v)
    return out


def _load_wrapped_ckpt(ckpt, verbose=True, **overrides):
    """Already-torch.load-ed {args/arch, model} checkpoint -> (model, vars)."""
    arch = ckpt["args"].model if hasattr(ckpt.get("args", None), "model") \
        else ckpt.get("arch")
    assert arch, "checkpoint missing architecture string"
    if verbose:
        print(f"instantiating from arch string: {arch}")
    model = model_from_arch_string(arch, landscape_only=False, **overrides)
    sd = _sd_to_numpy(ckpt["model"])
    variables = convert_torch_state_dict(
        sd, enc_depth=model.enc_depth, dec_depth=model.dec_depth,
        head_type=model.head_type, verbose=verbose)
    return model, variables


def load_torch_checkpoint(path, verbose=True, **overrides):
    """Load a reference .pth checkpoint -> (model, variables).

    Replaces reference load_model (dust3r/model.py:27-43): the arch string
    is parsed (not eval'ed) and landscape_only forced off for inference.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return _load_wrapped_ckpt(ckpt, verbose=verbose, **overrides)


def load_hub_checkpoint(weights_path, config_path=None, verbose=True,
                        **overrides):
    """Load a hub-mixin snapshot -> (model, variables).

    Mixin repos ship a BARE state dict (model.safetensors for
    huggingface_hub >=0.22, pytorch_model.bin for older snapshots) with
    the architecture in config.json — there is no {args, model} wrapper
    like the release .pth files (reference dust3r/model.py:47-52,76-85).
    A .bin that turns out to be a full reference checkpoint is handled
    through the arch-string path (loaded once, not re-read); a
    training-style {model: sd, ...} wrapper without an arch string gets
    its inner state dict with the architecture from config.json.
    """
    if weights_path.endswith(".safetensors"):
        from safetensors import torch as st

        sd = dict(st.load_file(weights_path))
    else:
        import torch

        ckpt = torch.load(weights_path, map_location="cpu",
                          weights_only=False)
        if isinstance(ckpt, dict) and "model" in ckpt and (
                "args" in ckpt or "arch" in ckpt):
            return _load_wrapped_ckpt(ckpt, verbose=verbose, **overrides)
        if isinstance(ckpt, dict) and isinstance(ckpt.get("model"), dict):
            sd = ckpt["model"]  # {model, optimizer, epoch, ...} wrapper
        else:
            sd = ckpt
    sd = _sd_to_numpy(sd)
    assert config_path, \
        "hub checkpoint has no architecture string; config.json required"
    import json

    with open(config_path) as f:
        cfg = json.load(f)
    if verbose:
        print(f"instantiating from hub config: {config_path}")
    model = model_from_hub_config(cfg, landscape_only=False, **overrides)
    variables = convert_torch_state_dict(
        sd, enc_depth=model.enc_depth, dec_depth=model.dec_depth,
        head_type=model.head_type, verbose=verbose)
    return model, variables


_HUB_WEIGHT_NAMES = ("model.safetensors", "pytorch_model.bin")


def _sibling_config(path):
    cpath = os.path.join(os.path.dirname(os.path.abspath(path)),
                         "config.json")
    return cpath if os.path.isfile(cpath) else None


def from_pretrained(name_or_path, verbose=True, **overrides):
    """HF-hub-compatible loader: local .pth / hub snapshot (file or
    directory) / orbax dir, or a hub repo id (requires network)."""
    if os.path.isfile(name_or_path):
        # hub-layout files route through the mixin loader; config.json is
        # only sniffed next to recognizably hub-named weights so an
        # unrelated neighbor can't silently define the architecture
        if name_or_path.endswith(".safetensors") or \
                os.path.basename(name_or_path) in _HUB_WEIGHT_NAMES:
            return load_hub_checkpoint(name_or_path,
                                       _sibling_config(name_or_path),
                                       verbose=verbose, **overrides)
        return load_torch_checkpoint(name_or_path, verbose=verbose,
                                     **overrides)
    if os.path.isdir(name_or_path):
        # hub snapshot directory (snapshot_download layout)
        for name in _HUB_WEIGHT_NAMES:
            wpath = os.path.join(name_or_path, name)
            if os.path.isfile(wpath):
                return load_hub_checkpoint(wpath, _sibling_config(wpath),
                                           verbose=verbose, **overrides)
        state, meta = load_checkpoint(name_or_path)
        assert meta and "arch" in meta, "orbax checkpoint missing metadata"
        model = model_from_arch_string(meta["arch"], landscape_only=False,
                                       **overrides)
        return model, state
    # hub download (requires network): mixin layout is config.json +
    # model.safetensors, with pytorch_model.bin as the legacy fallback
    from huggingface_hub import hf_hub_download
    from huggingface_hub.utils import EntryNotFoundError

    try:
        wpath = hf_hub_download(repo_id=name_or_path,
                                filename="model.safetensors")
    except EntryNotFoundError:
        wpath = hf_hub_download(repo_id=name_or_path,
                                filename="pytorch_model.bin")
    try:
        cpath = hf_hub_download(repo_id=name_or_path,
                                filename="config.json")
    except EntryNotFoundError:
        cpath = None
    return load_hub_checkpoint(wpath, cpath, verbose=verbose, **overrides)
