"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated without TPU pod hardware by running on the
CPU backend with ``xla_force_host_platform_device_count=8`` (the TPU-world
standard for testing multi-device code, see SURVEY.md §4). This must be set
before jax is imported anywhere, hence it lives at conftest import time.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
