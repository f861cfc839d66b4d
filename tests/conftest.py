"""Test harness config: run on CPU with 8 virtual devices.

Tests never require a TPU — the multi-chip sharding tests use the fake CPU
mesh (SURVEY.md §4 item 5). This must run before jax is imported anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
