"""Test configuration: force an 8-device virtual CPU mesh.

Sharding tests need multiple devices; real multi-chip hardware is unavailable,
so tests run on the CPU backend with 8 virtual host devices. The environment
preloads JAX (and pins JAX_PLATFORMS) via sitecustomize before conftest runs,
so env vars are too late — the jax.config API still works as long as no
backend has been initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
