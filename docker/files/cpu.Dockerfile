# CPU-only serving image (no accelerator): same demo, jax CPU wheel.
FROM python:3.12-slim-bookworm

ENV DEBIAN_FRONTEND=noninteractive
RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /dust3r_tpu
COPY . /dust3r_tpu

RUN pip install --no-cache-dir jax flax optax orbax-checkpoint einops numpy \
        pillow opencv-python-headless scipy gradio trimesh matplotlib \
        tensorboard

RUN bash native/build.sh || true

COPY docker/files/entrypoint.sh /entrypoint.sh
RUN chmod +x /entrypoint.sh
ENTRYPOINT ["/entrypoint.sh"]
