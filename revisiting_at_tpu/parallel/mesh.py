"""Device mesh construction and sharding rules.

The reference's only parallelism is DDP over NCCL (main.py:348-356,890;
SURVEY.md §2.3). The TPU-native equivalent is a named `jax.sharding.Mesh`:

  * axis "data": batch sharding (the DP replacement) — gradient reduction
    happens implicitly when batch-sharded loss is differentiated w.r.t.
    replicated/fsdp-sharded params (XLA inserts psum/reduce-scatter over ICI)
  * axis "fsdp": optional parameter sharding (ZeRO-3 style) for the large
    models at high res — absent in the reference, natural under pjit

No process groups, no explicit collectives in user code: we annotate
shardings with NamedSharding and let the XLA SPMD partitioner place
all-reduce/all-gather on ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1  # -1: all remaining devices
    fsdp: int = 1
    model: int = 1  # tensor-parallel axis (parallel/tp.py rules); 1 = absent


def make_mesh(config: MeshConfig | None = None, devices=None) -> Mesh:
    """Build a ("data", "fsdp") mesh — plus a trailing "model" axis when
    config.model > 1 (tensor parallelism, parallel/tp.py) — over the
    available devices."""
    config = config or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    fsdp = max(config.fsdp, 1)
    model = max(config.model, 1)
    data = config.data if config.data > 0 else n // (fsdp * model)
    assert data * fsdp * model == n, f"mesh {data}x{fsdp}x{model} != {n} devices"
    if model > 1:
        arr = np.asarray(devices).reshape(data, fsdp, model)
        return Mesh(arr, axis_names=("data", "fsdp", "model"))
    arr = np.asarray(devices).reshape(data, fsdp)
    return Mesh(arr, axis_names=("data", "fsdp"))


def batch_axes(mesh: Mesh) -> tuple[str, ...]:
    """Mesh axes that shard the batch dim: every axis except "model"
    (activations replicate over the tensor-parallel axis)."""
    return tuple(ax for ax in mesh.axis_names if ax != "model")


def batch_shard_count(mesh: Mesh) -> int:
    """Number of ways the batch dim is sharded on this mesh."""
    return int(np.prod([mesh.shape[ax] for ax in batch_axes(mesh)]))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over data (and fsdp, to use every chip for
    activations); the "model" axis, when present, replicates the batch."""
    return NamedSharding(mesh, P(batch_axes(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _fsdp_spec(shape: tuple[int, ...], fsdp_size: int, min_size: int) -> P:
    """Shard the largest divisible axis of a param over "fsdp"; replicate if none."""
    if fsdp_size <= 1 or int(np.prod(shape)) < min_size:
        return P()
    # prefer the last (output-feature) axis, then the largest divisible one
    order = sorted(range(len(shape)), key=lambda i: (shape[i], i), reverse=True)
    for ax in order:
        if shape[ax] % fsdp_size == 0 and shape[ax] >= fsdp_size:
            spec = [None] * len(shape)
            spec[ax] = "fsdp"
            return P(*spec)
    return P()


def param_shardings(mesh: Mesh, params: Any, min_size: int = 2**14) -> Any:
    """NamedSharding pytree for params: FSDP-shard big tensors, replicate small ones."""
    fsdp_size = mesh.shape.get("fsdp", 1)
    return jax.tree.map(
        lambda p: NamedSharding(mesh, _fsdp_spec(p.shape, fsdp_size, min_size)), params
    )


def tree_shardings(mesh: Mesh, tree: Any, min_size: int = 2**14) -> Any:
    """NamedSharding pytree for ANY array tree by the param rule — used for
    optimizer moments (ZeRO: mu/nu shard exactly like their params, scalars
    replicate) and EMA trees."""
    fsdp_size = mesh.shape.get("fsdp", 1)
    return jax.tree.map(
        lambda l: NamedSharding(mesh, _fsdp_spec(l.shape, fsdp_size, min_size)),
        tree,
    )


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)
