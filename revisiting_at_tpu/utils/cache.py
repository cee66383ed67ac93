"""Persistent XLA compilation cache for CLI entry points.

The axon TPU tunnel compiles remotely; cold compiles of the fused AT train
step run minutes (ViT-S@224: ~20 min observed). JAX's persistent cache
stores the serialized executable locally. Measured behaviour on this
tunnel: small/medium programs replay reliably across processes (11.6 s ->
0.6 s probe); very large executables (the 95 MB ViT AT step) hit the cache
key but the tunnel still spends minutes server-side — treat the cache as
a best-effort accelerator, not a guarantee.

Respects an explicit JAX_COMPILATION_CACHE_DIR; defaults to
`.jax_cache_tpu/` next to the repo root (or $HOME if unwritable).
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    cache = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or str(Path(__file__).resolve().parents[2] / ".jax_cache_tpu")
    )
    try:
        Path(cache).mkdir(parents=True, exist_ok=True)
    except OSError:
        cache = str(Path.home() / ".jax_cache_tpu")
        Path(cache).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return cache
