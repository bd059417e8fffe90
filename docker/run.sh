#!/bin/bash
# One-shot demo deployment: download a checkpoint, build the image, serve the
# gradio app on :7860. TPU-native counterpart of the reference docker/run.sh
# (`--with-cuda` there becomes `--with-tpu` here; default is CPU).
#
# Usage:  ./run.sh [--with-tpu] [--model_name <name>]
set -eu

model_name="DUSt3R_ViTLarge_BaseDecoder_512_dpt"
with_tpu=0

while [ $# -gt 0 ]; do
    case "$1" in
        --with-tpu) with_tpu=1 ;;
        --model_name) shift; model_name="$1" ;;
        *) echo "unknown arg: $1"; exit 1 ;;
    esac
    shift
done

command -v docker >/dev/null || { echo "docker not found"; exit 1; }
if docker compose version >/dev/null 2>&1; then
    dcomp="docker compose"
elif command -v docker-compose >/dev/null 2>&1; then
    dcomp="docker-compose"
else
    echo "docker compose not found"; exit 1
fi

ckpt="files/checkpoints/${model_name}.pth"
if [ ! -f "$ckpt" ]; then
    mkdir -p files/checkpoints
    echo "Downloading ${model_name}.pth ..."
    wget "https://download.europe.naverlabs.com/ComputerVision/DUSt3R/${model_name}.pth" \
        -O "$ckpt"
fi

export MODEL="${model_name}.pth"
profile=cpu
[ "$with_tpu" -eq 1 ] && profile=tpu
exec $dcomp --profile "$profile" up --build
