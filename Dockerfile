# yomitoku_tpu serving container for Cloud TPU VMs.
#
# TPU-native counterpart of the reference's CUDA dockerfile
# (/root/reference/dockerfile: nvidia/cuda base + `pip install yomitoku`).
# Differences by design:
#   * jax[tpu] + libtpu instead of CUDA/cuDNN — run on a TPU VM
#     (the container must see /dev/accel*; plain CPU hosts work too,
#     JAX falls back to the CPU backend).
#   * no poppler-utils / libopencv-dev system packages: PDF rasterizing
#     is the built-in engine (yomitoku_tpu/data/pdf/) and OpenCV comes
#     from the opencv-python-headless wheel.
#   * g++ for the on-demand native components (rasterizer fill,
#     DBNet postprocess, CCITT/JBIG2 decoders — built once at first use,
#     cached under yomitoku_tpu/native/_build).

FROM python:3.12-slim

ENV TZ=Asia/Tokyo \
    DEBIAN_FRONTEND=noninteractive \
    PIP_NO_CACHE_DIR=1

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential \
    g++ \
    git \
    ca-certificates \
    && rm -rf /var/lib/apt/lists/*

# TPU wheel index; on non-TPU hosts JAX silently uses the CPU backend
RUN python -m pip install --upgrade pip \
    && pip install "jax[tpu]" \
       -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY . /opt/yomitoku_tpu
RUN pip install /opt/yomitoku_tpu

# pre-build the native components so first-request latency stays flat
RUN python -c "from yomitoku_tpu.native import _load_lib; \
    [_load_lib(s) for s in ('rasterizer', 'dbnet_post', 'ccitt', 'jbig2')]"

# weight store: mount or bake converted checkpoints here
ENV YOMITOKU_TPU_WEIGHTS=/weights
VOLUME /weights

WORKDIR /workspace
ENTRYPOINT ["yomitoku"]
