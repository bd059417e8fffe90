# Serving image for the dust3r_tpu gradio demo on a Cloud TPU VM.
# TPU-native counterpart of the reference's docker/files/cuda.Dockerfile:
# instead of building the curope CUDA extension, the TPU path needs only
# jax[tpu] — the fused RoPE-attention kernel is Pallas, compiled at runtime.
FROM python:3.12-slim-bookworm

ENV DEBIAN_FRONTEND=noninteractive
RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /dust3r_tpu
COPY . /dust3r_tpu

# libtpu comes from the jax[tpu] extra; on a TPU VM the device is exposed
# to the container via --privileged or the TPU device plugin.
RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir \
        flax optax orbax-checkpoint einops numpy pillow opencv-python-headless \
        scipy gradio trimesh matplotlib tensorboard

# build the optional native host-image core (falls back to numpy if absent)
RUN bash native/build.sh || true

COPY docker/files/entrypoint.sh /entrypoint.sh
RUN chmod +x /entrypoint.sh
ENTRYPOINT ["/entrypoint.sh"]
