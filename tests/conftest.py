"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding paths are validated on a virtual CPU mesh (the real
environment has one TPU chip); bench.py runs on the real chip instead.
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
