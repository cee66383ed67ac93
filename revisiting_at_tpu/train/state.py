"""TrainState: the complete training state as one PyTree.

Replaces the reference's scattered model/optimizer/scaler/EMA state
(main.py:742-756) with a single checkpointable structure. No GradScaler:
bf16 on TPU needs no loss scaling (SURVEY.md §7 'precision policy').
"""

from __future__ import annotations

from typing import Any

import jax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array  # global step (int32)
    params: Any
    opt_state: Any
    ema_params: Any | None = None
    batch_stats: Any | None = None  # only for BN models (resnet family)
    ema_batch_stats: Any | None = None

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v

    def ema_variables(self) -> dict:
        v = {"params": self.ema_params if self.ema_params is not None else self.params}
        stats = self.ema_batch_stats if self.ema_batch_stats is not None else self.batch_stats
        if stats is not None:
            v["batch_stats"] = stats
        return v
