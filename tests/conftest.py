"""Test configuration: force an 8-device virtual CPU mesh.

Sharding tests need multiple devices; real multi-chip hardware is unavailable,
so tests run on the CPU backend with 8 virtual host devices (set before JAX is
imported anywhere in the test process).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
