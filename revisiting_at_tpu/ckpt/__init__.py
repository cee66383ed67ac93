from .checkpoint import CheckpointManager, load_train_state, save_train_state
from .torch_export import export_torch_state_dict, save_torch_checkpoint
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
    "export_torch_state_dict",
    "load_torch_checkpoint",
    "save_torch_checkpoint",
    "strip_prefixes",
    "to_param_tree",
    "vit_from_torch",
]
