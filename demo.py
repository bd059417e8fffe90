#!/usr/bin/env python3
"""Gradio demo launcher (CLI contract: /root/reference/demo.py)."""
import os
import tempfile

from dust3r_tpu.demo import get_args_parser, main_demo, set_print_with_timestamp


def main():
    args = get_args_parser().parse_args()
    set_print_with_timestamp()

    if args.tmp_dir is not None:
        os.makedirs(args.tmp_dir, exist_ok=True)
        tempfile.tempdir = args.tmp_dir

    server_name = args.server_name or (
        "0.0.0.0" if args.local_network else "127.0.0.1")

    from dust3r_tpu.checkpoint import from_pretrained
    from dust3r_tpu.inference import InferenceEngine

    overrides = {}
    if getattr(args, "serving", False):
        import jax.numpy as jnp
        # the measured 1.16x serving config (docs/DESIGN.md round-4 table
        # row g): bf16 BODY + bf16 heads + int8 block gemms. Without the
        # body dtype the model runs an unmeasured fp32-body configuration.
        overrides["dtype"] = jnp.bfloat16
        overrides["head_dtype"] = jnp.bfloat16
        args.quantize = args.quantize or "int8"
    model, variables = from_pretrained(
        args.weights or "naver/" + args.model_name, **overrides)
    from dust3r_tpu.parallel.mesh import cli_pair_mesh
    mesh, batch_size = cli_pair_mesh(args.mesh)
    if mesh is not None:
        print(f"data-parallel inference over {batch_size} devices")
    engine = InferenceEngine(model, variables, batch_size=batch_size,
                             mesh=mesh, quantize=args.quantize)

    with tempfile.TemporaryDirectory(suffix="dust3r_gradio_demo") as tmp:
        if not args.silent:
            print("Outputing stuff in", tmp)
        main_demo(tmp, engine, args.device, args.image_size, server_name,
                  args.server_port, silent=args.silent)


if __name__ == "__main__":
    main()
