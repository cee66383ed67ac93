from .mesh import (
    MeshConfig,
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
)

__all__ = [
    "MeshConfig",
    "batch_sharding",
    "make_mesh",
    "param_shardings",
    "replicated",
    "shard_batch",
]
