"""Eager oracle of the official targeted FAB attack loop (test-only).

Parity evidence for `evals/fab.py`, manufactured the same way as
`evals/square_oracle.py` (the autoattack library is not installed here):
a faithful eager transcription of the published algorithm — Croce & Hein,
"Minimally distorted adversarial examples with a fast adaptive boundary
attack", ICML 2020, Alg. 1/2 — following the control flow of the official
implementation (autoattack fab_pt.py::attack_single_run_targeted: python
per-iteration loop, boolean-mask bookkeeping, per-row sign-flipped
hyperplane projection of BOTH the iterate and the original point). The
reference consumes that library (AA_eval.py:226-239).

The box∩hyperplane projections reuse the production solvers, which are
independently verified exact against brute force / scipy LP in
tests/test_fab.py::TestProjections. What THIS oracle pins, via
tests/test_fab.py::TestFabOracleParity, is the attack-level dynamics the
projections plug into: hyperplane construction from the linearization,
both-sides boundary projection, the α/η extrapolated blend, minimum-norm
best-point bookkeeping, and the β backward step.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from .fab import _project


def _norms(d: np.ndarray, norm: str) -> np.ndarray:
    if norm == "Linf":
        return np.abs(d).max(axis=1)
    if norm == "L2":
        return np.sqrt((d * d).sum(axis=1))
    return np.abs(d).sum(axis=1)


def fab_single_target_oracle(
    logits_fn: Callable,
    x: np.ndarray,
    y: np.ndarray,
    y_target: np.ndarray,
    *,
    norm: str = "Linf",
    n_iter: int = 10,
    alpha_max: float = 0.1,
    eta: float = 1.05,
    beta: float = 0.9,
):
    """One targeted FAB run, eager. Returns (x_best, res_best) with
    res_best = minimum distortion of any misclassified iterate (1e10 if
    none seen) — the official loop records a point whenever the CURRENT
    iterate is misclassified, then steps it back toward x by β."""
    x = np.asarray(x, np.float32)
    bs = x.shape[0]
    x0 = x.reshape(bs, -1)
    x1 = x.copy()
    x_best = x.copy()
    res_best = np.full(bs, 1e10, np.float32)
    u = np.arange(bs)

    def diff_and_grad(xc):
        def f(z):
            lo = logits_fn(z)
            df = (lo[u, y_target] - lo[u, y]).astype(jnp.float32)
            return jnp.sum(df), df

        (_, df), dg = jax.value_and_grad(f, has_aux=True)(jnp.asarray(xc))
        return np.asarray(df), np.asarray(dg, np.float32)

    for _ in range(n_iter):
        df, dg = diff_and_grad(x1)
        w = dg.reshape(bs, -1)
        # linearized boundary f_t - f_y = 0:  w·z = w·x1 - df
        b = (w * x1.reshape(bs, -1)).sum(1) - df
        # official fab_projections sign-flips per row, so both the iterate
        # and the original point are projected ONTO the hyperplane
        d1 = np.asarray(_project(jnp.asarray(x1.reshape(bs, -1)),
                                 jnp.asarray(-w), jnp.asarray(-b), norm))
        d2 = np.asarray(_project(jnp.asarray(x0),
                                 jnp.asarray(-w), jnp.asarray(-b), norm))
        a1 = np.maximum(_norms(d1, norm), 1e-8)
        a2 = np.maximum(_norms(d2, norm), 1e-8)
        alpha = np.clip(a1 / (a1 + a2), 0.0, alpha_max)[:, None]

        x1f = (x1.reshape(bs, -1) + eta * d1) * (1.0 - alpha) \
            + (x0 + eta * d2) * alpha
        x1 = np.clip(x1f, 0.0, 1.0).reshape(x.shape).astype(np.float32)

        pred = np.asarray(logits_fn(jnp.asarray(x1))).argmax(-1)
        is_adv = pred != y
        if is_adv.any():
            t = _norms((x1 - x).reshape(bs, -1), norm)
            improved = is_adv & (t < res_best)
            x_best[improved] = x1[improved]
            res_best[improved] = t[improved]
            # backward step toward x for every currently-adversarial point
            x1[is_adv] = x[is_adv] + (x1[is_adv] - x[is_adv]) * beta

    return x_best, res_best


def fab_targeted_oracle(
    logits_fn: Callable,
    x: np.ndarray,
    y: np.ndarray,
    y_targets: np.ndarray,  # [B, n_targets]
    *,
    norm: str = "Linf",
    eps: float = 0.1,
    n_iter: int = 10,
    alpha_max: float = 0.1,
    eta: float = 1.05,
    beta: float = 0.9,
):
    """All-targets FAB-T, eager: keep the overall minimum-norm adversarial
    point across targets; success = within the ε budget (else clean x)."""
    x = np.asarray(x, np.float32)
    bs = x.shape[0]
    best_x = x.copy()
    best_res = np.full(bs, 1e10, np.float32)
    for t in range(y_targets.shape[1]):
        xb, res = fab_single_target_oracle(
            logits_fn, x, y, y_targets[:, t], norm=norm, n_iter=n_iter,
            alpha_max=alpha_max, eta=eta, beta=beta,
        )
        better = res < best_res
        best_x[better] = xb[better]
        best_res[better] = res[better]
    success = best_res <= eps
    x_adv = np.where(success.reshape((-1,) + (1,) * (x.ndim - 1)), best_x, x)
    return x_adv, success
