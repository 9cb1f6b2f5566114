"""Test configuration: run everything on a virtual 8-device CPU backend.

Sharding tests need multiple devices; the JAX-idiomatic fake backend is the
host platform with a forced device count. Must be set before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The env var alone is not enough under the axon TPU plugin; force via config.
jax.config.update("jax_platforms", "cpu")
# fp32-parity tests: force full-precision convolutions/matmuls.
jax.config.update("jax_default_matmul_precision", "highest")

