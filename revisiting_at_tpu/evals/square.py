"""Square attack (Andriushchenko et al. 2020) — Linf, query-based, no grads.

The 4th attack of standard AutoAttack (5000 queries, p_init=0.8,
margin-loss acceptance). TPU-first: ONE jitted `lax.scan` over queries with
per-sample state {x_best, margin_min, loss_min}; per-sample random squares
are built as iota-mask windows (static shapes), already-misclassified
points are frozen by masking. The reference gets this from the autoattack
library (AA_eval.py:226-239).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


def _margin_loss(logits: Array, y: Array) -> tuple[Array, Array]:
    """(margin, loss): margin = z_y - max_{k!=y} z_k; loss = margin (the
    official 'margin' criterion used by AA's Square)."""
    z = logits.astype(jnp.float32)
    zy = jnp.take_along_axis(z, y[:, None], axis=1)[:, 0]
    z_other = jnp.where(
        jax.nn.one_hot(y, z.shape[-1], dtype=bool), -jnp.inf, z
    )
    margin = zy - jnp.max(z_other, axis=-1)
    return margin, margin


def _p_selection(p_init: float, it: Array) -> Array:
    """Official square-size schedule (raw-iteration milestones; AA uses
    resc_schedule=False with n_queries=5000)."""
    milestones = jnp.array([10, 50, 200, 500, 1000, 2000, 4000, 6000, 8000])
    divisors = jnp.array([1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 128.0, 256.0, 512.0])
    idx = jnp.sum((it > milestones).astype(jnp.int32))
    return p_init / divisors[idx]


def square_attack(
    logits_fn: Callable[[Array], Array],
    x: Array,
    y: Array,
    *,
    norm: str = "Linf",
    eps: float = 4.0 / 255.0,
    n_queries: int = 5000,
    p_init: float = 0.8,
    rng: Array | None = None,
) -> tuple[Array, Array]:
    """Returns (x_best, acc): acc[i]=False means sample i was misclassified."""
    if norm != "Linf":
        raise NotImplementedError(
            "square_attack currently implements the Linf variant (the norm of "
            "every headline AA row in the reference, BASELINE.md); L2 planned."
        )
    assert rng is not None
    b, h, w, c = x.shape
    x = x.astype(jnp.float32)

    # init: vertical stripes of ±eps per (column, channel) — official init
    k_init, k_loop = jax.random.split(rng)
    stripes = jnp.where(
        jax.random.bernoulli(k_init, 0.5, (b, 1, w, c)), eps, -eps
    )
    x_best = jnp.clip(x + stripes, 0.0, 1.0)
    margin_min, loss_min = _margin_loss(logits_fn(x_best), y)

    ys = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 2)

    def body(carry, it):
        x_best, margin_min, loss_min = carry
        k = jax.random.fold_in(k_loop, it)
        k_s, k_pos, k_sign = jax.random.split(k, 3)

        p = _p_selection(p_init, it)
        s = jnp.clip(
            jnp.round(jnp.sqrt(p * h * w)).astype(jnp.int32), 1, h - 1
        )
        # per-sample square position
        vh = jax.random.randint(k_pos, (b, 1, 1, 1), 0, h - s + 1)
        vw = jax.random.randint(jax.random.fold_in(k_pos, 1), (b, 1, 1, 1), 0, w - s + 1)
        window = (ys >= vh) & (ys < vh + s) & (xs >= vw) & (xs < vw + s)

        # candidate: inside the window, jump to a random ±eps vertex around x
        signs = jnp.where(jax.random.bernoulli(k_sign, 0.5, (b, 1, 1, c)), eps, -eps)
        cand = jnp.where(window, jnp.clip(x + signs, 0.0, 1.0), x_best)
        # stay inside the Linf ball (x ± eps already is; clip for numeric safety)
        cand = jnp.clip(jnp.clip(cand, x - eps, x + eps), 0.0, 1.0)

        margin_c, loss_c = _margin_loss(logits_fn(cand), y)

        # accept strictly-improving candidates; freeze already-broken points
        improved = loss_c < loss_min
        active = margin_min > 0.0
        take = jnp.logical_and(improved, active)
        x_best = jnp.where(take[:, None, None, None], cand, x_best)
        loss_min = jnp.where(take, loss_c, loss_min)
        margin_min = jnp.where(take, margin_c, margin_min)
        return (x_best, margin_min, loss_min), None

    (x_best, margin_min, _), _ = jax.lax.scan(
        body, (x_best, margin_min, loss_min), jnp.arange(n_queries - 1)
    )
    acc = margin_min > 0.0
    return x_best, acc
