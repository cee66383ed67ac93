"""Square attack (Andriushchenko et al. 2020) — Linf/L2/L1, query-based.

The 4th attack of standard AutoAttack (5000 queries, p_init=0.8,
margin-loss acceptance). The reference gets this from the autoattack
library (AA_eval.py:226-239); this module re-implements the official
algorithms TPU-first: ONE jitted `lax.scan` over queries with per-sample
state {x_best, margin_min, loss_min}, static shapes throughout. The
official algorithm's dynamic square size s(it) is handled by evaluating
the "eta" pyramid pattern analytically on iota grids (see `_eta_value`)
instead of materializing an s×s tile, and its `idx_to_fool` filtering is
replaced by freezing already-misclassified rows under a mask — identical
trajectories, no dynamic shapes.

Parity: `evals/square_oracle.py` is an eager NumPy-style transcription of
the official torch code (dynamic slices, python loops) consuming the SAME
random draws (`_iter_randoms` / `_init_randoms`); tests/test_square.py
asserts trajectory equality between the two.

Documented deviations from the official library:
- Linf: the official per-image "resample the window until the candidate
  actually differs" while-loop (square.py Linf branch) is skipped — it
  only avoids wasted queries, never changes accepted iterates.
- Acceptance is strict improvement of the margin loss with broken rows
  frozen, matching the official update applied to `idx_to_fool`.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

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


# ---------------------------------------------------------------------------
# Official "eta" pyramid pattern, evaluated analytically.
#
# eta_rectangles(x, y)[i, j] accumulates 1/(k+1)^2 over growing
# (2k+1)-sized squares anchored at the center (x_c-1, y_c-1) with
# x_c = x//2 + 1: cell (i, j) is covered by counter k iff
# k >= max(x_c-1-i, i-x_c+1, y_c-1-j, j-y_c+1, 0), so its value is the
# tail sum of 1/(k+1)^2 from that k0 to max(x_c, y_c)-1, then the
# rectangle is L2-normalized. eta(s) stacks [eta_rect(s//2, s);
# -eta_rect(s-s//2, s)], L2-normalizes again, and transposes with prob 1/2.
# ---------------------------------------------------------------------------


def _tail_table(n: int) -> jnp.ndarray:
    """tail[k] = sum_{m=k}^{n-1} 1/(m+1)^2, length n+1 (tail[n]=0)."""
    inv = 1.0 / (np.arange(1, n + 1, dtype=np.float64) ** 2)
    tail = np.concatenate([np.cumsum(inv[::-1])[::-1], [0.0]])
    return jnp.asarray(tail, jnp.float32)


def _rect_value(i, j, x, y, tail):
    """eta_rectangles(x, y) evaluated at (possibly out-of-range) integer
    grids i, j — zero outside [0,x)×[0,y); NOT yet normalized."""
    x_c = x // 2 + 1
    y_c = y // 2 + 1
    k0 = jnp.maximum(
        jnp.maximum(x_c - 1 - i, i - x_c + 1),
        jnp.maximum(y_c - 1 - j, j - y_c + 1),
    )
    k0 = jnp.maximum(k0, 0)
    kmax = jnp.maximum(x_c, y_c)
    val = tail[jnp.minimum(k0, tail.shape[0] - 1)] - tail[jnp.minimum(kmax, tail.shape[0] - 1)]
    inside = (i >= 0) & (i < x) & (j >= 0) & (j < y)
    return jnp.where(inside, jnp.maximum(val, 0.0), 0.0)


def _eta_value(di, dj, s, tail, transpose):
    """Official eta(s) pattern evaluated at offsets (di, dj) from the
    window corner; unit L2 norm over its support. `transpose` is the
    per-call coin (pattern.T == evaluating at swapped offsets)."""
    di, dj = (
        jnp.where(transpose, dj, di),
        jnp.where(transpose, di, dj),
    )
    top_raw = _rect_value(di, dj, s // 2, s, tail)
    top = top_raw / jnp.sqrt(jnp.sum(top_raw**2) + 1e-30)
    bot_raw = _rect_value(di - s // 2, dj, s - s // 2, s, tail)
    bot = bot_raw / jnp.sqrt(jnp.sum(bot_raw**2) + 1e-30)
    e = top - bot
    return e / jnp.sqrt(jnp.sum(e**2) + 1e-30)


# ---------------------------------------------------------------------------
# Shared random draws — consumed identically by the jitted scan and the
# eager oracle so trajectories can be compared exactly.
# ---------------------------------------------------------------------------


def _rand_int(u, high):
    """Official random_int(0, high): floor(u * high) — note the official
    helper never returns `high` itself (window never at the last slot)."""
    return jnp.floor(u * high).astype(jnp.int32)


def _iter_randoms(k_loop: Array, it, b: int, c: int):
    """Per-iteration draws for the L2/L1 loops, in a fixed order:
    (u_vh, u_vw, u_vh2, u_vw2) scalars in [0,1), per-(sample, channel)
    sign ±1, and the eta transpose coin."""
    k = jax.random.fold_in(k_loop, it)
    kw, ks, kt = jax.random.split(k, 3)
    u = jax.random.uniform(kw, (4,))
    signs = jnp.where(jax.random.bernoulli(ks, 0.5, (b, 1, 1, c)), 1.0, -1.0)
    transpose = jax.random.bernoulli(kt, 0.5)
    return u, signs, transpose


def _init_randoms(k_init: Array, b: int, c: int, n_tiles: int):
    """Init-grid draws: per-tile transpose coins and per-(tile, sample,
    channel) ±1 signs (official: fresh eta() + random_choice per tile)."""
    kt, ks = jax.random.split(k_init)
    coins = jax.random.bernoulli(kt, 0.5, (n_tiles,))
    signs = jnp.where(
        jax.random.bernoulli(ks, 0.5, (n_tiles, b, 1, 1, c)), 1.0, -1.0
    )
    return coins, signs


def _grid_init(x: Array, k_init: Array, tail) -> Array:
    """Official L2/L1 init: tile the image with eta(h//5) patterns times
    per-(sample, channel) random signs (square.py init grid), UNNORMALIZED
    — callers scale onto their sphere."""
    b, h, w, c = x.shape
    s0 = max(h // 5, 2)  # official: h // 5 (guarded for tiny test images)
    n_h, n_w = h // s0, w // s0
    sp_h, sp_w = (h - n_h * s0) // 2, (w - n_w * s0) // 2
    coins, signs = _init_randoms(k_init, b, c, n_h * n_w)

    ys = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 2)
    delta = jnp.zeros((b, h, w, c), jnp.float32)
    t = 0
    for ih in range(n_h):
        for iw in range(n_w):
            vh, vw = sp_h + ih * s0, sp_w + iw * s0
            pat = _eta_value(ys - vh, xs - vw, s0, tail, coins[t])
            delta = delta + pat * signs[t]
            t += 1
    return delta


# ---------------------------------------------------------------------------
# Attacks
# ---------------------------------------------------------------------------


def _l2_parts(
    logits_fn: Callable[[Array], Array],
    x: Array,
    y: Array,
    eps: float,
    p_init: float,
    rng: Array,
):
    """Official L2 Square attack (autoattack square.py L2 branch): one
    batch-shared window pair per query; window 2's mass is freed, window 1
    is overwritten with (eta·signs + unit-normalized old content) scaled to
    the per-channel budget sqrt(max(eps²-‖δ‖²,0)/c + ‖δ·maskᵤ‖²); the full
    perturbation is then renormalized onto the eps sphere.

    Returns (init, body): init() -> carry, body(carry, it) -> (carry, None)
    with `it` the ABSOLUTE query index (all draws are keyed on it, so the
    scan can be split across device dispatches without changing the
    trajectory — see square_attack_chunk)."""
    b, h, w, c = x.shape
    x = x.astype(jnp.float32)
    n_features = h * w * c
    tail = _tail_table(h + 2)

    k_init, k_loop = jax.random.split(rng)

    def init():
        delta = _grid_init(x, k_init, tail)
        nrm = jnp.sqrt(jnp.sum(delta**2, axis=(1, 2, 3), keepdims=True))
        x_best = jnp.clip(x + delta / (nrm + 1e-12) * eps, 0.0, 1.0)
        margin_min, loss_min = _margin_loss(logits_fn(x_best), y)
        return (x_best, margin_min, loss_min)

    ys = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 2)

    def body(carry, it):
        x_best, margin_min, loss_min = carry
        u, signs, transpose = _iter_randoms(k_loop, it, b, c)

        p = _p_selection(p_init, it)
        s = jnp.maximum(
            jnp.round(jnp.sqrt(p * n_features / c)).astype(jnp.int32), 3
        )
        s = jnp.minimum(s + (1 - s % 2), h - 1)  # official: odd s
        vh, vw = _rand_int(u[0], h - s), _rand_int(u[1], w - s)
        vh2, vw2 = _rand_int(u[2], h - s), _rand_int(u[3], w - s)
        w1 = (ys >= vh) & (ys < vh + s) & (xs >= vw) & (xs < vw + s)
        w2 = (ys >= vh2) & (ys < vh2 + s) & (xs >= vw2) & (xs < vw2 + s)

        delta = x_best - x
        norms_window_1 = jnp.sqrt(
            jnp.sum(jnp.where(w1, delta, 0.0) ** 2, axis=(1, 2), keepdims=True)
        )
        norms_image = jnp.sqrt(
            jnp.sum(delta**2, axis=(1, 2, 3), keepdims=True)
        )
        mask_image = w1 | w2
        norms_windows = jnp.sqrt(
            jnp.sum(jnp.where(mask_image, delta, 0.0) ** 2, axis=(1, 2), keepdims=True)
        )

        eta = _eta_value(ys - vh, xs - vw, s, tail, transpose)
        new_deltas = eta * signs
        old_deltas = jnp.where(w1, delta, 0.0) / (1e-12 + norms_window_1)
        new_deltas = new_deltas + old_deltas
        new_norm = jnp.sqrt(
            jnp.sum(jnp.where(w1, new_deltas, 0.0) ** 2, axis=(1, 2), keepdims=True)
        )
        budget = jnp.sqrt(
            jnp.maximum(eps**2 - norms_image**2, 0.0) / c + norms_windows**2
        )
        new_deltas = new_deltas / (1e-12 + new_norm) * budget

        cand_delta = jnp.where(w1, new_deltas, jnp.where(w2, 0.0, delta))
        cand_nrm = jnp.sqrt(
            jnp.sum(cand_delta**2, axis=(1, 2, 3), keepdims=True)
        )
        cand = jnp.clip(x + cand_delta / (cand_nrm + 1e-12) * eps, 0.0, 1.0)

        margin_c, loss_c = _margin_loss(logits_fn(cand), y)
        improved = loss_c < loss_min
        active = margin_min > 0.0
        take = jnp.logical_and(improved, active)
        x_best = jnp.where(take[:, None, None, None], cand, x_best)
        loss_min = jnp.where(take, loss_c, loss_min)
        margin_min = jnp.where(take, margin_c, margin_min)
        return (x_best, margin_min, loss_min), None

    return init, body


def _l1_parts(
    logits_fn: Callable[[Array], Array],
    x: Array,
    y: Array,
    eps: float,
    p_init: float,
    rng: Array,
):
    """Official L1 Square attack (autoattack square.py L1 branch — the
    variant added for 'Mind the box' L1 robustness; completes
    --l_norms L1 --full_aa 1, reference eps table AA_eval.py:33 L1=75).

    Mirrors the L2 branch with L1 norms: window 2's L1 mass is freed,
    window 1 gets (eta·signs + L1-unit old content) scaled to the
    per-channel L1 budget max(eps-‖δ‖₁,0)/c + ‖δ·maskᵤ‖₁, and the result
    is projected EXACTLY onto the L1 ball ∩ box via ops/norms.l1_projection
    (the official library's L1_projection, reference
    autopgd_train_clean.py:24-91). Same (init, body) contract as
    _l2_parts."""
    from ..ops.norms import l1_projection

    b, h, w, c = x.shape
    x = x.astype(jnp.float32)
    n_features = h * w * c
    tail = _tail_table(h + 2)

    k_init, k_loop = jax.random.split(rng)

    def init():
        delta = _grid_init(x, k_init, tail)
        nrm = jnp.sum(jnp.abs(delta), axis=(1, 2, 3), keepdims=True)
        delta = delta / (nrm + 1e-12) * eps
        delta = delta + l1_projection(x, delta, eps)
        x_best = jnp.clip(x + delta, 0.0, 1.0)
        margin_min, loss_min = _margin_loss(logits_fn(x_best), y)
        return (x_best, margin_min, loss_min)

    ys = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 2)

    def body(carry, it):
        x_best, margin_min, loss_min = carry
        u, signs, transpose = _iter_randoms(k_loop, it, b, c)

        p = _p_selection(p_init, it)
        s = jnp.maximum(
            jnp.round(jnp.sqrt(p * n_features / c)).astype(jnp.int32), 3
        )
        s = jnp.minimum(s + (1 - s % 2), h - 1)  # official: odd s
        vh, vw = _rand_int(u[0], h - s), _rand_int(u[1], w - s)
        vh2, vw2 = _rand_int(u[2], h - s), _rand_int(u[3], w - s)
        w1 = (ys >= vh) & (ys < vh + s) & (xs >= vw) & (xs < vw + s)
        w2 = (ys >= vh2) & (ys < vh2 + s) & (xs >= vw2) & (xs < vw2 + s)

        delta = x_best - x
        norms_window_1 = jnp.sum(
            jnp.abs(jnp.where(w1, delta, 0.0)), axis=(1, 2), keepdims=True
        )
        norms_image = jnp.sum(
            jnp.abs(delta), axis=(1, 2, 3), keepdims=True
        )
        mask_image = w1 | w2
        norms_windows = jnp.sum(
            jnp.abs(jnp.where(mask_image, delta, 0.0)), axis=(1, 2), keepdims=True
        )

        eta = _eta_value(ys - vh, xs - vw, s, tail, transpose)
        new_deltas = eta * signs
        old_deltas = jnp.where(w1, delta, 0.0) / (1e-12 + norms_window_1)
        new_deltas = new_deltas + old_deltas
        new_norm = jnp.sum(
            jnp.abs(jnp.where(w1, new_deltas, 0.0)), axis=(1, 2), keepdims=True
        )
        budget = jnp.maximum(eps - norms_image, 0.0) / c + norms_windows
        new_deltas = new_deltas / (1e-12 + new_norm) * budget

        cand_delta = jnp.where(w1, new_deltas, jnp.where(w2, 0.0, delta))
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

    return init, body


def _linf_parts(
    logits_fn: Callable[[Array], Array],
    x: Array,
    y: Array,
    eps: float,
    p_init: float,
    rng: Array,
):
    """Official Linf Square attack. Same (init, body) contract as
    _l2_parts."""
    b, h, w, c = x.shape
    x = x.astype(jnp.float32)

    # init: vertical stripes of ±eps per (column, channel) — official init
    k_init, k_loop = jax.random.split(rng)

    def init():
        stripes = jnp.where(
            jax.random.bernoulli(k_init, 0.5, (b, 1, w, c)), eps, -eps
        )
        x_best = jnp.clip(x + stripes, 0.0, 1.0)
        margin_min, loss_min = _margin_loss(logits_fn(x_best), y)
        return (x_best, margin_min, loss_min)

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
        # per-sample square position (official Linf branch is per-image)
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

    return init, body


def _parts(logits_fn, x, y, norm, eps, p_init, rng):
    assert rng is not None
    if norm == "Linf":
        return _linf_parts(logits_fn, x, y, eps, p_init, rng)
    if norm == "L2":
        return _l2_parts(logits_fn, x, y, eps, p_init, rng)
    if norm == "L1":
        return _l1_parts(logits_fn, x, y, eps, p_init, rng)
    raise NotImplementedError(f"square_attack: unsupported norm {norm!r}")


# ---------------------------------------------------------------------------
# Resumable (chunked-dispatch) API.
#
# One Square evaluation is n_queries model forwards; at big shapes a single
# device program holding all of them runs for many minutes, which trips the
# tunnel worker's execution watchdog (queue13: FAB-T/Square at 320² killed
# the TPU worker; APGD, dispatched in ~1-minute programs, passed at the
# same shape). The fix is carry-resumable attacks: the driver
# (evals/autoattack.py) scans a bounded chunk of absolute query indices per
# dispatch and threads the carry through host-level calls. Draws are keyed
# on the absolute index, so chunked == unchunked bit-for-bit, and the
# chunk program is compiled ONCE (it0/n_valid are traced scalars; indices
# past n_valid are masked with lax.cond, costing no model evaluation).
# ---------------------------------------------------------------------------


def square_attack_init(
    logits_fn: Callable[[Array], Array],
    x: Array,
    y: Array,
    *,
    norm: str = "Linf",
    eps: float = 4.0 / 255.0,
    p_init: float = 0.8,
    rng: Array | None = None,
):
    """Initial carry (x_best, margin_min, loss_min) — the official init
    point, already scored (consumes 1 query of the budget)."""
    init, _ = _parts(logits_fn, x, y, norm, eps, p_init, rng)
    return init()


def square_attack_chunk(
    logits_fn: Callable[[Array], Array],
    x: Array,
    y: Array,
    carry,
    it0: Array,
    n_chunk: int,
    n_valid: Array,
    *,
    norm: str = "Linf",
    eps: float = 4.0 / 255.0,
    p_init: float = 0.8,
    rng: Array | None = None,
):
    """Advance the carry over absolute query indices [it0, it0 + n_chunk).
    Indices >= n_valid are no-ops (lax.cond — the model is not evaluated),
    so a fixed n_chunk serves any query budget with one compile. `rng` must
    be the SAME key passed to square_attack_init."""
    _, body = _parts(logits_fn, x, y, norm, eps, p_init, rng)

    def masked(c, it):
        c = jax.lax.cond(it < n_valid, lambda c: body(c, it)[0], lambda c: c, c)
        return c, None

    carry, _ = jax.lax.scan(masked, carry, it0 + jnp.arange(n_chunk))
    return carry


def square_attack_finish(carry) -> tuple[Array, Array]:
    """(x_best, acc) from a carry; acc[i]=False means misclassified."""
    x_best, margin_min, _ = carry
    return x_best, margin_min > 0.0


def square_attack_l2(logits_fn, x, y, *, eps=2.0, n_queries=5000,
                     p_init=0.8, rng=None):
    return square_attack(logits_fn, x, y, norm="L2", eps=eps,
                         n_queries=n_queries, p_init=p_init, rng=rng)


def square_attack_l1(logits_fn, x, y, *, eps=75.0, n_queries=5000,
                     p_init=0.8, rng=None):
    return square_attack(logits_fn, x, y, norm="L1", eps=eps,
                         n_queries=n_queries, p_init=p_init, rng=rng)


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
    """Whole attack in one trace (tests / small shapes). Returns
    (x_best, acc): acc[i]=False means sample i was misclassified. Built on
    the chunked path so the oracle-parity tests cover it too."""
    carry = square_attack_init(
        logits_fn, x, y, norm=norm, eps=eps, p_init=p_init, rng=rng
    )
    n = n_queries - 1
    carry = square_attack_chunk(
        logits_fn, x, y, carry, jnp.int32(0), n, jnp.int32(n),
        norm=norm, eps=eps, p_init=p_init, rng=rng,
    )
    return square_attack_finish(carry)
