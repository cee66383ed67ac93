from .checkpoint import CheckpointManager, load_train_state, save_train_state
from .torch_import import (
    convnext_from_torch,
    load_torch_checkpoint,
    strip_prefixes,
    to_param_tree,
    vit_from_torch,
)

__all__ = [
    "CheckpointManager",
    "load_train_state",
    "save_train_state",
    "convnext_from_torch",
    "load_torch_checkpoint",
    "strip_prefixes",
    "to_param_tree",
    "vit_from_torch",
]
