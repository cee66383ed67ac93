"""FAB-T (Fast Adaptive Boundary, targeted) — minimum-norm boundary attack.

Third attack of standard AutoAttack (9 target classes, n_iter=100,
alpha_max=0.1, eta=1.05, beta=0.9; Croce & Hein, ICML 2020). The reference
gets this from the autoattack library (AA_eval.py:226-239); this is a
from-scratch TPU implementation.

Algorithm per iteration (targeted at class c):
  1. linearize the decision boundary f_c(z) - f_y(z) = 0 at the current
     iterate: hyperplane w·z = b with w = ∇(f_c - f_y), b = w·x1 - (f_c - f_y)
  2. project both the iterate x1 and the original point x onto
     {z ∈ [0,1]^d : w·z = b} under the attack norm
  3. take the extrapolated (η) convex combination with adaptive α (≤ α_max)
  4. if misclassified: record best (minimum-norm) adversarial point, then
     bias back toward x with factor β (backward step)
Success = best distortion ≤ ε.

TPU-first: the box∩hyperplane projections are solved by a fixed-iteration
vectorized bisection (Linf: on the radius; L2: on the Lagrange multiplier)
instead of the original's per-row sort + index juggling — the same exact
projection, expressed as ~40 fused O(d) reductions that jit cleanly and
batch over the mesh. Everything is one `lax.scan` over iterations.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.norms import l1_norm, l2_norm

Array = jax.Array


def _flat(x):
    return x.reshape(x.shape[0], -1)


def _proj_hyperplane_box_linf(t: Array, w: Array, b: Array, n_bisect: int = 30) -> Array:
    """delta minimizing ||delta||_inf s.t. t+delta ∈ [0,1]^d, w·(t+delta) <= b.

    g(r) = min_{|z-t|_inf<=r, z∈box} w·z is continuous and non-increasing in r;
    bisect on r for g(r) = b. If already feasible returns 0; if the hyperplane
    is unreachable inside the box, returns the saturating delta.
    """
    violation = jnp.sum(w * t, axis=1) - b  # > 0 means infeasible
    sgn = jnp.sign(w)

    def z_at(r):
        return jnp.clip(t - r[:, None] * sgn, 0.0, 1.0)

    def g(r):
        return jnp.sum(w * z_at(r), axis=1)

    lo = jnp.zeros_like(b)
    hi = jnp.ones_like(b)  # box diameter bounds any useful radius

    def body(carry, _):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        too_high = g(mid) > b  # need larger radius
        lo = jnp.where(too_high, mid, lo)
        hi = jnp.where(too_high, hi, mid)
        return (lo, hi), None

    (lo, hi), _ = jax.lax.scan(body, (lo, hi), None, length=n_bisect)
    r = hi
    delta = z_at(r) - t
    return jnp.where(violation[:, None] > 0, delta, jnp.zeros_like(delta))


def _proj_hyperplane_box_l2(t: Array, w: Array, b: Array, n_bisect: int = 40) -> Array:
    """delta minimizing ||delta||_2 s.t. t+delta ∈ [0,1]^d, w·(t+delta) <= b.

    KKT: z(λ) = clip(t - λ w, 0, 1); w·z(λ) is non-increasing in λ; bisect.
    """
    violation = jnp.sum(w * t, axis=1) - b

    def z_at(lam):
        return jnp.clip(t - lam[:, None] * w, 0.0, 1.0)

    def g(lam):
        return jnp.sum(w * z_at(lam), axis=1)

    # λ upper bound: at λ_hi every coordinate with |w_i| >= wmax/2^k saturates;
    # use λ_hi = (1 + max|t|) / max(|w|) scaled — grow once by fixed doubling.
    wmax = jnp.max(jnp.abs(w), axis=1) + 1e-12
    lam_hi = 2.0 / wmax

    def grow(carry, _):
        lam_hi = carry
        lam_hi = jnp.where(g(lam_hi) > b, lam_hi * 4.0, lam_hi)
        return lam_hi, None

    lam_hi, _ = jax.lax.scan(grow, lam_hi, None, length=8)

    lo = jnp.zeros_like(b)
    hi = lam_hi

    def body(carry, _):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        too_high = g(mid) > b
        lo = jnp.where(too_high, mid, lo)
        hi = jnp.where(too_high, hi, mid)
        return (lo, hi), None

    (lo, hi), _ = jax.lax.scan(body, (lo, hi), None, length=n_bisect)
    delta = z_at(hi) - t
    return jnp.where(violation[:, None] > 0, delta, jnp.zeros_like(delta))


def _proj_hyperplane_box_l1(t: Array, w: Array, b: Array) -> Array:
    """delta minimizing ||delta||_1 s.t. t+delta ∈ [0,1]^d, w·(t+delta) <= b.

    LP whose optimum concentrates mass on the largest-|w| coordinates:
    moving coordinate i toward the feasible side reduces w·z at rate |w_i|
    per unit of L1 budget, bounded by the box room r_i. Greedily saturate
    coordinates in decreasing |w_i| order until the violation is paid off,
    with a partial move on the crossing coordinate — expressed as one sort +
    cumsum + rank threshold (no host control flow; completes the reference
    capability of FAB-T under L1, AA_eval.py:33 eps=75).
    """
    violation = jnp.sum(w * t, axis=1) - b  # > 0 means infeasible
    aw = jnp.abs(w)
    # room before hitting the box when moving against w
    room = jnp.where(w > 0, t, 1.0 - t)
    cap = aw * room  # per-coordinate w·z reduction capacity

    order = jnp.argsort(-aw, axis=1)
    cap_sorted = jnp.take_along_axis(cap, order, axis=1)
    cum = jnp.cumsum(cap_sorted, axis=1)
    cum_prev = cum - cap_sorted

    v = violation[:, None]
    full = cum <= v  # fully saturated coordinates (in sorted order)
    residual = jnp.clip(v - cum_prev, 0.0, cap_sorted)
    # magnitude of the move in sorted order: full room, or partial residual/|w|
    aw_sorted = jnp.take_along_axis(aw, order, axis=1)
    room_sorted = jnp.take_along_axis(room, order, axis=1)
    mag_sorted = jnp.where(full, room_sorted, residual / jnp.maximum(aw_sorted, 1e-12))

    inv = jnp.argsort(order, axis=1)
    mag = jnp.take_along_axis(mag_sorted, inv, axis=1)
    delta = -jnp.sign(w) * mag
    return jnp.where(violation[:, None] > 0, delta, jnp.zeros_like(delta))


def _project(t, w, b, norm):
    """Min-norm delta taking t ONTO the box-restricted hyperplane w·z = b,
    from EITHER side.

    The official FAB projection (autoattack fab_projections.py:13-17) flips
    (w, b) per row so the point sits on the w·z >= b side before solving the
    <= problem — i.e. an already-adversarial iterate is projected BACK onto
    the linearized decision boundary. That backward walk is integral to
    FAB's minimum-norm refinement; without it (delta = 0 on the feasible
    side) the attack only shrinks distortion via the β backward step and
    systematically over-reports robustness."""
    s = jnp.where(jnp.sum(w * t, axis=1) - b >= 0.0, 1.0, -1.0)
    w = w * s[:, None]
    b = b * s
    if norm == "Linf":
        return _proj_hyperplane_box_linf(t, w, b)
    if norm == "L2":
        return _proj_hyperplane_box_l2(t, w, b)
    if norm == "L1":
        return _proj_hyperplane_box_l1(t, w, b)
    raise ValueError(f"unknown norm {norm!r}")


def _dist(a: Array, b: Array, norm: str) -> Array:
    d = a - b
    if norm == "Linf":
        return jnp.max(jnp.abs(_flat(d)), axis=1)
    if norm == "L2":
        return l2_norm(d)
    return l1_norm(d)


def fab_single_init(x: Array) -> tuple[Array, Array, Array]:
    """Initial carry for one targeted FAB run: (x1, x_best, res_best)."""
    x = x.astype(jnp.float32)
    return (x, x, jnp.full((x.shape[0],), 1e10, jnp.float32))


def fab_single_chunk(
    logits_fn: Callable[[Array], Array],
    x: Array,
    y: Array,
    y_target: Array,
    carry,
    n_chunk: int,
    n_valid: Array | None = None,
    *,
    norm: str = "Linf",
    alpha_max: float = 0.1,
    eta: float = 1.05,
    beta: float = 0.9,
):
    """Advance one targeted FAB run by n_chunk iterations (resumable carry).

    FAB consumes no randomness, so resuming a carry across device dispatches
    is exact. `n_valid` (traced scalar: how many of the n_chunk iterations
    are real; the rest are lax.cond no-ops that skip the model) lets a
    fixed-n_chunk compiled program serve any n_iter — the AutoAttack driver
    uses this to bound single-dispatch duration (the tunnel worker's
    execution watchdog kills multi-minute programs; see queue13, NEXT.md)."""
    x = x.astype(jnp.float32)
    xf = _flat(x)

    def diff_and_grad(x1):
        def f(z):
            logits = logits_fn(z)
            df = (
                jnp.take_along_axis(logits, y_target[:, None], axis=1)[:, 0]
                - jnp.take_along_axis(logits, y[:, None], axis=1)[:, 0]
            ).astype(jnp.float32)
            return jnp.sum(df), df

        (_, df), dg = jax.value_and_grad(f, has_aux=True)(x1)
        return df, dg

    def body(carry, _):
        x1, x_best, res_best = carry
        df, dg = diff_and_grad(x1)
        w = _flat(dg)
        x1f = _flat(x1)
        # boundary hyperplane w·z = b (adversarial side: w·z >= b, i.e. df>=0);
        # express as minimize-side w'·z <= b' with w' = -w
        b_hp = jnp.sum(w * x1f, axis=1) - df

        d1 = _project(x1f, -w, -b_hp, norm)  # from current iterate
        d2 = _project(xf, -w, -b_hp, norm)  # from original point

        if norm == "Linf":
            a1 = jnp.max(jnp.abs(d1), axis=1)
            a2 = jnp.max(jnp.abs(d2), axis=1)
        elif norm == "L1":
            a1 = jnp.sum(jnp.abs(d1), axis=1)
            a2 = jnp.sum(jnp.abs(d2), axis=1)
        else:
            a1 = jnp.sqrt(jnp.sum(d1 * d1, axis=1))
            a2 = jnp.sqrt(jnp.sum(d2 * d2, axis=1))
        a1 = jnp.maximum(a1, 1e-8)
        a2 = jnp.maximum(a2, 1e-8)
        alpha = jnp.clip(a1 / (a1 + a2), 0.0, alpha_max)[:, None]

        x1f_new = (x1f + eta * d1) * (1.0 - alpha) + (xf + eta * d2) * alpha
        x1_new = jnp.clip(x1f_new.reshape(x.shape), 0.0, 1.0)

        pred = jnp.argmax(logits_fn(x1_new), axis=-1)
        is_adv = pred != y
        t_dist = _dist(x1_new, x, norm)
        improved = jnp.logical_and(is_adv, t_dist < res_best)
        imp = improved.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
        x_best = x1_new * imp + x_best * (1.0 - imp)
        res_best = jnp.where(improved, t_dist, res_best)

        # backward step toward x for adversarial points
        back = is_adv.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
        x1_back = x + (x1_new - x) * beta
        x1_next = x1_back * back + x1_new * (1.0 - back)
        return (x1_next, x_best, res_best), None

    if n_valid is None:
        carry, _ = jax.lax.scan(body, carry, None, length=n_chunk)
        return carry

    def masked(c, it):
        c = jax.lax.cond(it < n_valid, lambda c: body(c, None)[0], lambda c: c, c)
        return c, None

    carry, _ = jax.lax.scan(masked, carry, jnp.arange(n_chunk))
    return carry


def fab_attack_single_target(
    logits_fn: Callable[[Array], Array],
    x: Array,
    y: Array,
    y_target: Array,
    *,
    norm: str = "Linf",
    eps: float = 4.0 / 255.0,
    n_iter: int = 100,
    alpha_max: float = 0.1,
    eta: float = 1.05,
    beta: float = 0.9,
) -> tuple[Array, Array]:
    """One targeted FAB run. Returns (x_best, best_distortion)."""
    carry = fab_single_chunk(
        logits_fn, x, y, y_target, fab_single_init(x), n_iter,
        norm=norm, alpha_max=alpha_max, eta=eta, beta=beta,
    )
    _, x_best, res_best = carry
    return x_best, res_best


def fab_attack_targeted(
    logits_fn: Callable[[Array], Array],
    x: Array,
    y: Array,
    y_targets: Array,  # [B, n_target_classes]
    *,
    norm: str = "Linf",
    eps: float = 4.0 / 255.0,
    n_iter: int = 100,
    alpha_max: float = 0.1,
    eta: float = 1.05,
    beta: float = 0.9,
    rng: Array | None = None,
) -> tuple[Array, Array]:
    """FAB-T over all target classes. Returns (x_adv, success mask): success
    means a misclassified point within the ε-ball was found."""
    bs = x.shape[0]
    x = x.astype(jnp.float32)
    best_x = x
    best_res = jnp.full((bs,), 1e10, jnp.float32)
    n_targets = y_targets.shape[1]

    def per_target(carry, ti):
        best_x, best_res = carry
        yt = jax.lax.dynamic_index_in_dim(y_targets, ti, axis=1, keepdims=False)
        xb, res = fab_attack_single_target(
            logits_fn, x, y, yt, norm=norm, eps=eps, n_iter=n_iter,
            alpha_max=alpha_max, eta=eta, beta=beta,
        )
        better = res < best_res
        bett = better.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
        best_x = xb * bett + best_x * (1.0 - bett)
        best_res = jnp.where(better, res, best_res)
        return (best_x, best_res), None

    (best_x, best_res), _ = jax.lax.scan(
        per_target, (best_x, best_res), jnp.arange(n_targets)
    )
    success = best_res <= eps
    # outside the budget, return the clean point (FAB found nothing usable)
    succ = success.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
    x_adv = best_x * succ + x * (1.0 - succ)
    return x_adv, success
