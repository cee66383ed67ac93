"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This is the JAX-native way to exercise pjit/shard_map/collectives without
TPU hardware (SURVEY.md §4). NOTE: in this environment something rewrites
JAX_PLATFORMS to "axon,cpu" during jax import (the TPU plugin), so env vars
are NOT sufficient — we must set the platform via jax.config, which wins.
"""

import os

# belt: keep env coherent for any subprocesses
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

# On this 1-core host, 8 virtual devices contend for the CPU and XLA-CPU's
# in-process collective rendezvous can exceed its default 40s termination
# timeout under load (it then kills the process). Give it room.
_flags = os.environ.get("XLA_FLAGS", "")
if "collective_call_terminate_timeout" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_cpu_collective_call_terminate_timeout_seconds=600"
    ).strip()

import jax  # noqa: E402

# suspenders: config beats whatever the plugin writes into JAX_PLATFORMS
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# XLA-CPU's oneDNN matmuls run at reduced precision by default (~1e-2 error on
# f32 GEMMs), which breaks golden-parity comparisons against eager PyTorch.
jax.config.update("jax_default_matmul_precision", "highest")

# cache compiles across test runs (this host has a single CPU core; convnext
# train-step compiles take minutes cold). Keyed by host-CPU fingerprint —
# see tests/_cache_tag.py for why (cross-host AOT replay aborts the suite).
from _cache_tag import host_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", host_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest  # noqa: E402


REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason="golden-parity tests need the read-only reference checkout",
)
