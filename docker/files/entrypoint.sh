#!/bin/bash
# Container entrypoint: launch the gradio demo on the checkpoint mounted at
# /dust3r_tpu/checkpoints. Counterpart of the reference docker entrypoint
# (docker/files/entrypoint.sh there), minus the --device flag: jax picks the
# TPU when libtpu is present and falls back to CPU otherwise.
set -eu

MODEL=${MODEL:-DUSt3R_ViTLarge_BaseDecoder_512_dpt.pth}

exec python3 demo.py --weights "checkpoints/$MODEL" --local_network "$@"
