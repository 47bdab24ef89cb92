# Pinned runtime environment — the analog of the reference Dockerfile:1-31
# (which pins CUDA 8 + cudnn6 + TensorFlow 1.4 and builds lmbspecialops).
# Here the accelerator stack is JAX/libtpu; the only native build is the
# host-side data-pipeline library (native/libdemon_native.so).
#
#   docker build -t demon-tpu .
#   docker run --privileged --network host demon-tpu python bench.py
#
# On Cloud TPU VMs the TPU runtime is exposed to privileged containers;
# for CPU-only use (tests, dataset tools) drop --privileged.

FROM python:3.11-slim-bookworm

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential \
        libwebp-dev \
        liblz4-dev \
        make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/demon_tpu
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt \
    && pip install --no-cache-dir "jax[tpu]==0.9.0" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY . .
RUN make -C native

# verify the install (CPU): ops + model unit tests
RUN JAX_PLATFORMS=cpu python -m pytest tests/test_ops_geometry.py -q

ENV PYTHONPATH=/opt/demon_tpu
CMD ["python", "bench.py"]
