"""Square attack (Andriushchenko et al. 2020) — Linf, query-based, no grads.

The 4th attack of standard AutoAttack (5000 queries, p_init=0.8,
margin-loss acceptance). TPU-first: ONE jitted `lax.scan` over queries with
per-sample state {x_best, margin_min, loss_min}; per-sample random squares
are built as iota-mask windows (static shapes), already-misclassified
points are frozen by masking. The reference gets this from the autoattack
library (AA_eval.py:226-239).
"""

from __future__ import annotations

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


def _pyramid(s: int) -> jnp.ndarray:
    """Pseudo-gaussian pyramid pattern of the L2 Square attack: concentric
    squares from the center weighted 1/(k+1)^2, unit L2 norm; for even s the
    two halves get opposite signs (zero-mean)."""
    import numpy as np

    p = np.asarray(_pyramid_odd(s if s % 2 else s + 1))[:s, :s]
    if s % 2 == 0:
        p[s // 2 :] *= -1.0  # zero-mean for even sizes
    p = p / np.sqrt((p**2).sum() + 1e-12)
    return jnp.asarray(p, jnp.float32)


def _pyramid_odd(s: int):
    import numpy as np

    delta = np.zeros((s, s), np.float64)
    c = s // 2
    for k in range(c + 1):
        lo, hi = c - k, c + k + 1
        delta[lo:hi, lo:hi] += 1.0 / (k + 1) ** 2
    return delta


def square_attack_l2(
    logits_fn: Callable[[Array], Array],
    x: Array,
    y: Array,
    *,
    eps: float = 2.0,
    n_queries: int = 5000,
    p_init: float = 0.8,
    rng: Array | None = None,
) -> tuple[Array, Array]:
    """L2 Square attack: maintains ||delta||_2 <= eps by moving perturbation
    mass between two random windows each query, writing a pyramid ("eta")
    pattern scaled to the freed budget into the first window (Andriushchenko
    et al. 2020, Algorithm 3 semantics; the even-size eta construction is a
    documented zero-mean variant)."""
    assert rng is not None
    b, h, w, c = x.shape
    x = x.astype(jnp.float32)
    d = h * w * c

    # init: full-budget pyramid tiles of size h//5 with random signs
    k_init, k_loop = jax.random.split(rng)
    s0 = max(h // 5, 2)
    tile = _pyramid(s0)
    reps_h = (h + s0 - 1) // s0
    reps_w = (w + s0 - 1) // s0
    pat = jnp.tile(tile, (reps_h, reps_w))[:h, :w]
    signs = jnp.where(
        jax.random.bernoulli(k_init, 0.5, (b, reps_h, reps_w, c)), 1.0, -1.0
    )
    signs = jnp.repeat(jnp.repeat(signs, s0, axis=1), s0, axis=2)[:, :h, :w, :]
    delta = pat[None, :, :, None] * signs
    nrm = jnp.sqrt(jnp.sum(delta**2, axis=(1, 2, 3), keepdims=True))
    delta = delta / (nrm + 1e-12) * eps
    x_best = jnp.clip(x + delta, 0.0, 1.0)
    margin_min, loss_min = _margin_loss(logits_fn(x_best), y)

    ys = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 2)

    def body(carry, it):
        x_best, margin_min, loss_min = carry
        k = jax.random.fold_in(k_loop, it)
        k_pos1, k_pos2, k_sign = jax.random.split(k, 3)

        p = _p_selection(p_init, it)
        s = jnp.clip(jnp.round(jnp.sqrt(p * h * w / c)).astype(jnp.int32), 3, h - 1)
        delta = x_best - x  # true perturbation incl. past clipping

        def window(kk):
            vh = jax.random.randint(kk, (b, 1, 1, 1), 0, h - s + 1)
            vw = jax.random.randint(jax.random.fold_in(kk, 1), (b, 1, 1, 1), 0, w - s + 1)
            return (ys >= vh) & (ys < vh + s) & (xs >= vw) & (xs < vw + s), vh, vw

        w1, vh1, vw1 = window(k_pos1)
        w2, _, _ = window(k_pos2)
        w2 = w2 & ~w1  # donor window must not erase the new content

        n_all = jnp.sum(delta**2, axis=(1, 2, 3))
        n_w1 = jnp.sum(jnp.where(w1, delta, 0.0) ** 2, axis=(1, 2, 3))
        n_w2 = jnp.sum(jnp.where(w2, delta, 0.0) ** 2, axis=(1, 2, 3))
        budget = jnp.sqrt(jnp.maximum(eps**2 - n_all + n_w1 + n_w2, 0.0))

        # eta pattern placed at W1 via gather-free roll: build a full-size map
        # by scaling the (max-size) pyramid; use dynamic slice-fill via masks
        # with distance-from-corner indexing
        dy = ys - vh1
        dxx = xs - vw1
        # pyramid value at (dy, dxx) for size s: concentric L_inf rings
        ring = jnp.maximum(jnp.abs(dy - (s - 1) / 2.0), jnp.abs(dxx - (s - 1) / 2.0))
        k_ring = jnp.ceil(ring - 0.01).astype(jnp.int32)
        eta = jnp.where(w1, 1.0 / (k_ring.astype(jnp.float32) + 1.0) ** 2, 0.0)
        ch_sign = jnp.where(jax.random.bernoulli(k_sign, 0.5, (b, 1, 1, c)), 1.0, -1.0)
        eta = eta * ch_sign
        eta_n = jnp.sqrt(jnp.sum(eta**2, axis=(1, 2, 3), keepdims=True))
        eta = eta / (eta_n + 1e-12) * budget[:, None, None, None]

        cand_delta = jnp.where(w2, 0.0, delta)
        cand_delta = jnp.where(w1, eta, cand_delta)
        cand = jnp.clip(x + cand_delta, 0.0, 1.0)

        margin_c, loss_c = _margin_loss(logits_fn(cand), y)
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
    return x_best, margin_min > 0.0


def square_attack_l1(
    logits_fn: Callable[[Array], Array],
    x: Array,
    y: Array,
    *,
    eps: float = 75.0,
    n_queries: int = 5000,
    p_init: float = 0.8,
    rng: Array | None = None,
) -> tuple[Array, Array]:
    """L1 Square attack (the autoattack library's L1 extension of
    Andriushchenko et al.; completes --l_norms L1 --full_aa 1, reference
    eps table AA_eval.py:33 L1=75).

    Per query: write a random ±-signed square carrying a large fraction of
    the L1 budget into a random window of the current perturbation, then
    project exactly onto the L1 ball ∩ [0,1] box (ops/norms.l1_projection —
    the projection soft-thresholds, keeping the perturbation sparse, which
    is the essence of the official L1 variant). Margin-loss acceptance and
    frozen already-broken points as in the Linf/L2 variants."""
    from ..ops.norms import l1_projection

    assert rng is not None
    b, h, w, c = x.shape
    x = x.astype(jnp.float32)

    k_init, k_loop = jax.random.split(rng)
    # init: vertical ±stripes scaled onto the L1 sphere, then projected
    stripes = jnp.where(jax.random.bernoulli(k_init, 0.5, (b, 1, w, c)), 1.0, -1.0)
    delta = jnp.broadcast_to(stripes, x.shape)
    nrm = jnp.sum(jnp.abs(delta), axis=(1, 2, 3), keepdims=True)
    delta = delta / nrm * eps
    delta = delta + l1_projection(x, delta, eps)
    x_best = jnp.clip(x + delta, 0.0, 1.0)
    margin_min, loss_min = _margin_loss(logits_fn(x_best), y)

    ys = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 2)

    def body(carry, it):
        x_best, margin_min, loss_min = carry
        k = jax.random.fold_in(k_loop, it)
        k_pos, k_sign, k_mag = jax.random.split(k, 3)

        p = _p_selection(p_init, it)
        s = jnp.clip(jnp.round(jnp.sqrt(p * h * w)).astype(jnp.int32), 1, h - 1)
        vh = jax.random.randint(k_pos, (b, 1, 1, 1), 0, h - s + 1)
        vw = jax.random.randint(jax.random.fold_in(k_pos, 1), (b, 1, 1, 1), 0, w - s + 1)
        window = (ys >= vh) & (ys < vh + s) & (xs >= vw) & (xs < vw + s)

        # write a ±window carrying ~half the budget into the current delta
        delta = x_best - x
        signs = jnp.where(jax.random.bernoulli(k_sign, 0.5, (b, 1, 1, c)), 1.0, -1.0)
        frac = jax.random.uniform(k_mag, (b, 1, 1, 1), minval=0.3, maxval=0.7)
        n_win = (s * s * c).astype(jnp.float32)
        mag = frac * eps / jnp.maximum(n_win, 1.0)
        cand_delta = jnp.where(window, delta + signs * mag, delta)
        cand_delta = cand_delta + l1_projection(x, cand_delta, eps)
        cand = jnp.clip(x + cand_delta, 0.0, 1.0)

        margin_c, loss_c = _margin_loss(logits_fn(cand), y)
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
    return x_best, margin_min > 0.0


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
    if norm == "L2":
        return square_attack_l2(
            logits_fn, x, y, eps=eps, n_queries=n_queries, p_init=p_init, rng=rng
        )
    if norm == "L1":
        return square_attack_l1(
            logits_fn, x, y, eps=eps, n_queries=n_queries, p_init=p_init, rng=rng
        )
    if norm != "Linf":
        raise NotImplementedError(f"square_attack: unsupported norm {norm!r}")
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
