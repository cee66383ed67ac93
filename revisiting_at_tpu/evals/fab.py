"""FAB-T (Fast Adaptive Boundary, targeted) — minimum-norm boundary attack.

Third attack of standard AutoAttack (9 target classes, n_iter=100,
alpha_max=0.1, eta=1.05, beta=0.9). The reference gets this from the
autoattack library (AA_eval.py:226-239).

Status: kernel under construction — `fab_attack_targeted` currently raises
NotImplementedError; the AutoAttack driver's 'fab-t' stage is only reached
when explicitly requested. The projection-onto-{box ∩ hyperplane} solver
(the core of FAB) lands with the full implementation.
"""

from __future__ import annotations

from typing import Callable

import jax

Array = jax.Array


def fab_attack_targeted(
    logits_fn: Callable[[Array], Array],
    x: Array,
    y: Array,
    y_targets: Array,
    *,
    norm: str = "Linf",
    eps: float = 4.0 / 255.0,
    n_iter: int = 100,
    alpha_max: float = 0.1,
    eta: float = 1.05,
    beta: float = 0.9,
    rng: Array | None = None,
) -> tuple[Array, Array]:
    raise NotImplementedError(
        "FAB-T kernel is under construction; run AutoAttack with "
        "attacks_to_run=('apgd-ce','apgd-t','square') meanwhile."
    )
