"""LR schedules with per-iteration interpolation.

Parity with the reference (main.py:208-243): step / cyclic(triangular) /
cosine-with-linear-warmup evaluated at integer epochs, then LINEARLY
interpolated per iteration between epoch endpoints (main.py:956-958) —
the interpolation is part of the recipe, not a detail.

Implemented as jnp-traceable functions of the global step so the LR lives
inside the jitted update (no per-step recompilation, no host round-trip).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LRConfig:
    lr: float = 1e-3
    schedule_type: str = "cosine"  # 'step' | 'cyclic' | 'cosine'
    lr_peak_epoch: int = 10
    step_ratio: float = 0.1
    step_length: int = 30
    epochs: int = 100


def epoch_lr(cfg: LRConfig, epoch):
    """LR at an integer epoch, traceable (reference main.py:208-243)."""
    e = jnp.asarray(epoch, jnp.float32)
    if cfg.schedule_type == "step":
        num_steps = jnp.floor(e / cfg.step_length)
        lr = cfg.step_ratio**num_steps * cfg.lr
        return jnp.where(e >= cfg.epochs, 0.0, lr)
    if cfg.schedule_type == "cyclic":
        up = 1e-4 * cfg.lr + (cfg.lr - 1e-4 * cfg.lr) * e / max(cfg.lr_peak_epoch, 1)
        down = cfg.lr * (cfg.epochs - e) / max(cfg.epochs - cfg.lr_peak_epoch, 1)
        return jnp.where(e <= cfg.lr_peak_epoch, up, jnp.maximum(down, 0.0))
    if cfg.schedule_type == "cosine":
        warm = 1e-4 * cfg.lr + (cfg.lr - 1e-4 * cfg.lr) * e / max(cfg.lr_peak_epoch, 1)
        lr_min = 5e-6
        cos = lr_min + 0.5 * (cfg.lr - lr_min) * (
            1.0 + jnp.cos(jnp.pi * (e - cfg.lr_peak_epoch) / max(cfg.epochs - cfg.lr_peak_epoch, 1))
        )
        return jnp.where(e <= cfg.lr_peak_epoch, warm, cos)
    raise ValueError(f"unknown schedule {cfg.schedule_type!r}")


def make_lr_schedule(cfg: LRConfig, iters_per_epoch: int) -> Callable:
    """Global-step -> LR, with the reference's per-iteration linear
    interpolation between epoch endpoints (main.py:956-958,973-974)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(step / iters_per_epoch)
        frac = (step - epoch * iters_per_epoch) / iters_per_epoch
        lr0 = epoch_lr(cfg, epoch)
        lr1 = epoch_lr(cfg, epoch + 1)
        return lr0 + (lr1 - lr0) * frac

    return schedule


def get_resolution(
    epoch: int, min_res: int, max_res: int, start_ramp: int, end_ramp: int
) -> int:
    """Resolution ramp (reference main.py:372-388); constant in the paper recipe."""
    assert min_res <= max_res
    if epoch <= start_ramp:
        return min_res
    if epoch >= end_ramp:
        return max_res
    import numpy as np

    interp = np.interp([epoch], [start_ramp, end_ramp], [min_res, max_res])
    return int(np.round(interp[0] / 32)) * 32
