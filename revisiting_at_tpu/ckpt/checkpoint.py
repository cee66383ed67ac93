"""Orbax checkpointing of the full TrainState — with TRUE resume.

Replaces the reference's torch.save of raw state_dicts (main.py:737-756)
and fixes its known gap: the reference saves optimizer/scaler state but
never restores it (SURVEY.md §5 'checkpoint/resume'). Here the whole
TrainState PyTree (params, opt_state, EMA, step, batch_stats) round-trips.

Layout per run dir:
  ckpt/<step>/  — orbax StandardCheckpointer snapshots
  params.json   — config artifact (written by the trainer)
"""

from __future__ import annotations

from pathlib import Path
import jax
import orbax.checkpoint as ocp

from ..train.state import TrainState


def save_train_state(path: str | Path, state: TrainState) -> None:
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()


def load_train_state(path: str | Path, target: TrainState) -> TrainState:
    """Restore into the structure of `target` (an abstract or concrete state)."""
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    return ckptr.restore(path, abstract)


def restore_run_params(run_dir: str | Path, *, best: bool = False,
                       epoch: int = -1, use_ema: bool = False):
    """Restore (params, batch_stats, step) from a run dir's orbax checkpoint
    — the shared eval/export CLI path. `best` selects the ckpt_best slot
    (reference best_adv_weights intent), `epoch` -1 = latest. With use_ema
    the run MUST hold EMA params (the reference's weights_ema_{e}.pt never
    silently falls back to raw weights)."""
    run_dir = Path(run_dir)
    ckpt_dir = "ckpt_best" if best else "ckpt"
    mgr = ocp.CheckpointManager(str((run_dir / ckpt_dir).absolute()))
    step = mgr.latest_step() if epoch < 0 else epoch
    assert step is not None, f"no checkpoint in {run_dir}/{ckpt_dir}"
    restored = mgr.restore(step)
    if use_ema:
        params = restored.get("ema_params")
        if not params:
            raise ValueError(
                "use_ema requested but the run kept no EMA params "
                "(trained with model.model_ema=0?)"
            )
    else:
        params = restored["params"]
    return params, restored.get("batch_stats"), step


class CheckpointManager:
    """Epoch-cadence manager: every-epoch weights + every-5-epochs full state,
    mirroring the reference cadence (main.py:734-756) under orbax."""

    def __init__(self, run_dir: str | Path, save_freq: int = 1, full_freq: int = 5):
        self.dir = Path(run_dir) / "ckpt"
        self.dir.mkdir(parents=True, exist_ok=True)
        self.save_freq = save_freq
        self.full_freq = full_freq
        self._mgr = ocp.CheckpointManager(
            self.dir.absolute(),
            options=ocp.CheckpointManagerOptions(max_to_keep=None, create=True),
        )

    def maybe_save(self, epoch: int, state: TrainState, *, last: bool = False) -> None:
        if epoch % self.save_freq == 0 or last:
            self._mgr.save(epoch, args=ocp.args.StandardSave(state))

    def save_best(self, epoch: int, state: TrainState) -> None:
        """Best-robust-checkpoint slot (reference best_adv_weights.pt,
        main.py:1069-1072): a separate single-entry manager under
        <run_dir>/ckpt_best, overwritten whenever adv-val improves."""
        if getattr(self, "_best_mgr", None) is None:
            self._best_mgr = ocp.CheckpointManager(
                (self.dir.parent / "ckpt_best").absolute(),
                options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True),
            )
        self._best_mgr.save(epoch, args=ocp.args.StandardSave(state))

    def restore_latest(self, target: TrainState) -> tuple[TrainState, int] | None:
        step = self._mgr.latest_step()
        if step is None:
            return None
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        state = self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        return state, step

    def wait(self) -> None:
        self._mgr.wait_until_finished()
        if getattr(self, "_best_mgr", None) is not None:
            self._best_mgr.wait_until_finished()
