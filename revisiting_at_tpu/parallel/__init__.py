from .mesh import (
    MeshConfig,
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
    tree_shardings,
)

__all__ = [
    "MeshConfig",
    "batch_sharding",
    "make_mesh",
    "param_shardings",
    "replicated",
    "shard_batch",
    "tree_shardings",
]
