#!/usr/bin/env python3
"""Gradio demo executable (reference-compatible: /root/reference/demo.py)."""
import os
import tempfile

from dust3r_tpu.demo import get_args_parser, main_demo, set_print_with_timestamp
from dust3r_tpu.checkpoint import from_pretrained
from dust3r_tpu.inference import InferenceEngine

if __name__ == "__main__":
    args = get_args_parser().parse_args()
    set_print_with_timestamp()

    if args.tmp_dir is not None:
        os.makedirs(args.tmp_dir, exist_ok=True)
        tempfile.tempdir = args.tmp_dir

    if args.server_name is not None:
        server_name = args.server_name
    else:
        server_name = "0.0.0.0" if args.local_network else "127.0.0.1"

    weights_path = args.weights if args.weights else "naver/" + args.model_name
    model, variables = from_pretrained(weights_path)
    engine = InferenceEngine(model, variables, batch_size=1)

    with tempfile.TemporaryDirectory(suffix="dust3r_gradio_demo") as tmpdirname:
        if not args.silent:
            print("Outputing stuff in", tmpdirname)
        main_demo(tmpdirname, engine, args.device, args.image_size,
                  server_name, args.server_port, silent=args.silent)
