from .checkpoint import CheckpointManager, load_train_state, save_train_state

__all__ = ["CheckpointManager", "load_train_state", "save_train_state"]
