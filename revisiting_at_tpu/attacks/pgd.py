"""Plain PGD (no momentum / adaptive step) — baseline attack and test oracle.

Not in the reference's live path (its vestigial utils_train.py:21-222 had
one), but useful as a sanity oracle for APGD and for users wanting a simple
attack. Implemented as a `lax.scan`.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.losses import make_criterion
from ..ops.norms import l2_norm, l2_project, linf_project

Array = jax.Array


def pgd_attack(
    logits_fn: Callable[[Array], Array],
    x: Array,
    y: Array,
    *,
    norm: str = "Linf",
    eps: float = 4.0 / 255.0,
    n_iter: int = 10,
    step_size: float | None = None,
    loss: str = "ce",
    rng: Array | None = None,
    random_start: bool = True,
) -> Array:
    x = x.astype(jnp.float32)
    criterion = make_criterion(loss)
    if step_size is None:
        step_size = 2.0 * eps / n_iter

    if random_start:
        assert rng is not None
        if norm == "Linf":
            x_adv = x + jax.random.uniform(rng, x.shape, jnp.float32, -eps, eps)
        else:
            t = jax.random.normal(rng, x.shape, jnp.float32)
            x_adv = x + eps * t / (l2_norm(t, keepdims=True) + 1e-12)
        x_adv = jnp.clip(x_adv, 0.0, 1.0)
    else:
        x_adv = jnp.clip(x, 0.0, 1.0)

    def f(xa):
        return jnp.sum(criterion(logits_fn(xa), y))

    gradf = jax.grad(f)

    def body(x_adv, _):
        g = gradf(x_adv)
        if norm == "Linf":
            x_new = linf_project(x_adv + step_size * jnp.sign(g), x, eps)
        else:
            x_new = l2_project(
                x_adv + step_size * g / (l2_norm(g, keepdims=True) + 1e-12), x, eps
            )
        return x_new, None

    x_adv, _ = jax.lax.scan(body, x_adv, None, length=n_iter)
    return x_adv
