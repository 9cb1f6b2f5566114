# Reproducible runtime for jspsr_tpu — the TPU-native counterpart of the
# reference's pinned image (reference Dockerfile:1-18, which pins
# nvcr.io/nvidia/pytorch:23.10-py3 + pip deps for the CUDA stack).
#
# This image reproduces the CPU test/verification environment exactly
# (requirements.lock.txt mirrors the versions the suite was certified on).
# On real TPU hosts, swap `jax[tpu]` in via the libtpu release matching the
# runtime — the framework has no other accelerator-specific dependency.

FROM python:3.12-slim

ARG DEBIAN_FRONTEND=noninteractive
ENV PYTHONUNBUFFERED=1 \
    JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8

# g++ builds the optional native host kernels (native/geokernels.cc);
# everything degrades gracefully to the numpy fallback without it.
RUN apt-get update && apt-get install -y --no-install-recommends g++ make \
    && apt-get clean && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/jspsr_tpu
COPY requirements.lock.txt ./
RUN python -m pip install --no-cache-dir --upgrade pip && \
    python -m pip install --no-cache-dir -r requirements.lock.txt

COPY . .
RUN bash scripts/build_native.sh || echo "native kernels skipped (fallback)"

# default: run the CPU test suite (the certification gate)
CMD ["python", "-m", "pytest", "tests/", "-q"]
