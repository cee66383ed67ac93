from .mesh import (
    MeshConfig,
    batch_shard_count,
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
    tree_shardings,
)
from .tp import TP_RULES, tp_sharded_leaf_count, tp_tree_shardings

__all__ = [
    "MeshConfig",
    "TP_RULES",
    "batch_shard_count",
    "batch_sharding",
    "make_mesh",
    "param_shardings",
    "replicated",
    "shard_batch",
    "tp_sharded_leaf_count",
    "tp_tree_shardings",
    "tree_shardings",
]
