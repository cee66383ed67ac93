"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This is the JAX-native way to exercise pjit/shard_map/collectives without
TPU hardware (SURVEY.md §4): XLA's host platform is split into 8 virtual
devices. Must be set before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pytest  # noqa: E402


REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason="golden-parity tests need the read-only reference checkout",
)
