"""Eager oracle for the Square attack — test-only.

A line-by-line NumPy transcription of the official autoattack library's
square.py L2/L1 branches (dynamic slices, python loops, per-iteration
square sizes), checkable by eye against the published algorithm
(Andriushchenko et al. 2020, Alg. 1/3; Croce & Hein 2021 for L1). It
consumes the SAME random draws as the jitted implementation in
`evals/square.py` (`_iter_randoms` / `_init_randoms` / `_rand_int`), so
tests can assert trajectory equality between this eager reference and the
static-shape `lax.scan` version — manufacturing the parity evidence the
missing library would otherwise provide (reference AA_eval.py:226-239).

NHWC layout, [0,1] pixels (the official code is NCHW; indices transposed).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .square import _init_randoms, _iter_randoms, _p_selection


def eta_rectangles(x: int, y: int) -> np.ndarray:
    """Official Squares `eta_rectangles`: growing (2k+1)-squares of weight
    1/(k+1)^2 anchored at the center, L2-normalized."""
    delta = np.zeros((x, y), np.float32)
    x_c, y_c = x // 2 + 1, y // 2 + 1
    counter2 = [x_c - 1, y_c - 1]
    for counter in range(0, max(x_c, y_c)):
        delta[
            max(counter2[0], 0) : min(counter2[0] + (2 * counter + 1), x),
            max(counter2[1], 0) : min(counter2[1] + (2 * counter + 1), y),
        ] += 1.0 / (counter + 1) ** 2
        counter2[0] -= 1
        counter2[1] -= 1
    return delta / np.sqrt((delta**2).sum())


def eta(s: int, transpose: bool) -> np.ndarray:
    """Official `eta(s)`: [+rect(s//2, s); -rect(s-s//2, s)], normalized,
    transposed on a coin flip (coin injected for parity)."""
    delta = np.zeros((s, s), np.float32)
    delta[: s // 2] = eta_rectangles(s // 2, s)
    delta[s // 2 :] = -eta_rectangles(s - s // 2, s)
    delta = delta / np.sqrt((delta**2).sum())
    return delta.T if transpose else delta


def p_selection(p_init: float, it: int) -> float:
    return float(_p_selection(p_init, jnp.asarray(it)))


def _grid_init_oracle(x: np.ndarray, k_init) -> np.ndarray:
    """Official init grid: eta(h//5) tiles times per-(sample, channel)
    random signs, fresh per tile; unnormalized."""
    b, h, w, c = x.shape
    s0 = max(h // 5, 2)  # official: h // 5 (guarded for tiny test images)
    n_h, n_w = h // s0, w // s0
    sp_h, sp_w = (h - n_h * s0) // 2, (w - n_w * s0) // 2
    coins, signs = _init_randoms(k_init, b, c, n_h * n_w)
    coins, signs = np.asarray(coins), np.asarray(signs)

    delta = np.zeros((b, h, w, c), np.float32)
    t = 0
    for ih in range(n_h):
        for iw in range(n_w):
            vh, vw = sp_h + ih * s0, sp_w + iw * s0
            pat = eta(s0, bool(coins[t]))
            delta[:, vh : vh + s0, vw : vw + s0, :] += (
                pat[None, :, :, None] * signs[t]
            )
            t += 1
    return delta


def _margin_np(logits_fn, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    z = np.asarray(logits_fn(jnp.asarray(x)), np.float32)
    zy = z[np.arange(len(y)), y]
    z2 = z.copy()
    z2[np.arange(len(y)), y] = -np.inf
    return zy - z2.max(-1)


def square_l2_oracle(
    logits_fn, x, y, *, eps, n_queries, p_init=0.8, rng=None
):
    """Eager official L2 Square (square.py L2 branch, NCHW→NHWC)."""
    x = np.asarray(x, np.float32)
    y = np.asarray(y)
    b, h, w, c = x.shape
    n_features = h * w * c

    k_init, k_loop = jax.random.split(rng)
    delta = _grid_init_oracle(x, k_init)
    nrm = np.sqrt((delta**2).sum(axis=(1, 2, 3), keepdims=True))
    x_best = np.clip(x + delta / (nrm + 1e-12) * eps, 0.0, 1.0)
    margin_min = _margin_np(logits_fn, x_best, y)
    loss_min = margin_min.copy()

    for it in range(n_queries - 1):
        u, signs, transpose = _iter_randoms(k_loop, it, b, c)
        u, signs = np.asarray(u), np.asarray(signs)

        p = p_selection(p_init, it)
        s = max(int(round(np.sqrt(p * n_features / c))), 3)
        if s % 2 == 0:
            s += 1
        s = min(s, h - 1)
        vh, vw = int(u[0] * (h - s)), int(u[1] * (w - s))
        vh2, vw2 = int(u[2] * (h - s)), int(u[3] * (w - s))

        delta = x_best - x
        win1 = delta[:, vh : vh + s, vw : vw + s, :]
        norms_window_1 = np.sqrt(
            (win1**2).sum(axis=(1, 2), keepdims=True)
        )
        norms_image = np.sqrt((delta**2).sum(axis=(1, 2, 3), keepdims=True))
        mask_image = np.zeros((1, h, w, 1), bool)
        mask_image[:, vh : vh + s, vw : vw + s, :] = True
        mask_image[:, vh2 : vh2 + s, vw2 : vw2 + s, :] = True
        norms_windows = np.sqrt(
            ((delta * mask_image) ** 2).sum(axis=(1, 2), keepdims=True)
        )

        new_deltas = eta(s, bool(transpose))[None, :, :, None] * signs
        old_deltas = win1 / (1e-12 + norms_window_1)
        new_deltas = new_deltas + old_deltas
        new_norm = np.sqrt((new_deltas**2).sum(axis=(1, 2), keepdims=True))
        budget = np.sqrt(
            np.maximum(eps**2 - norms_image**2, 0.0) / c + norms_windows**2
        )
        new_deltas = new_deltas / (1e-12 + new_norm) * budget

        cand_delta = delta.copy()
        cand_delta[:, vh2 : vh2 + s, vw2 : vw2 + s, :] = 0.0
        cand_delta[:, vh : vh + s, vw : vw + s, :] = new_deltas
        cand_nrm = np.sqrt((cand_delta**2).sum(axis=(1, 2, 3), keepdims=True))
        cand = np.clip(x + cand_delta / (cand_nrm + 1e-12) * eps, 0.0, 1.0)

        margin_c = _margin_np(logits_fn, cand, y)
        take = (margin_c < loss_min) & (margin_min > 0.0)
        x_best = np.where(take[:, None, None, None], cand, x_best)
        loss_min = np.where(take, margin_c, loss_min)
        margin_min = np.where(take, margin_c, margin_min)
    return x_best, margin_min > 0.0


def square_linf_oracle(
    logits_fn, x, y, *, eps, n_queries, p_init=0.8, rng=None
):
    """Eager official Linf Square (square.py Linf branch): ±eps vertical
    stripe init, per-image square windows jumping to a random ±eps vertex
    around x, margin-improvement acceptance. Consumes the jitted branch's
    draws (fold_in/split/randint/bernoulli) so trajectories compare exactly;
    the official resample-until-different loop is skipped on BOTH sides
    (documented deviation in evals/square.py — it only avoids wasted
    queries, never changes accepted iterates)."""
    x = np.asarray(x, np.float32)
    y = np.asarray(y)
    b, h, w, c = x.shape

    k_init, k_loop = jax.random.split(rng)
    stripes = np.where(
        np.asarray(jax.random.bernoulli(k_init, 0.5, (b, 1, w, c))), eps, -eps
    ).astype(np.float32)
    x_best = np.clip(x + stripes, 0.0, 1.0)
    margin_min = _margin_np(logits_fn, x_best, y)
    loss_min = margin_min.copy()

    for it in range(n_queries - 1):
        k = jax.random.fold_in(k_loop, it)
        _, k_pos, k_sign = jax.random.split(k, 3)
        p = p_selection(p_init, it)
        s = int(np.clip(int(round(np.sqrt(p * h * w))), 1, h - 1))
        vh = np.asarray(jax.random.randint(k_pos, (b, 1, 1, 1), 0, h - s + 1))[
            :, 0, 0, 0
        ]
        vw = np.asarray(
            jax.random.randint(
                jax.random.fold_in(k_pos, 1), (b, 1, 1, 1), 0, w - s + 1
            )
        )[:, 0, 0, 0]
        signs = np.where(
            np.asarray(jax.random.bernoulli(k_sign, 0.5, (b, 1, 1, c))), eps, -eps
        ).astype(np.float32)

        cand = x_best.copy()
        for i in range(b):  # official Linf branch loops per image
            cand[i, vh[i] : vh[i] + s, vw[i] : vw[i] + s, :] = np.clip(
                x[i, vh[i] : vh[i] + s, vw[i] : vw[i] + s, :] + signs[i], 0.0, 1.0
            )
        cand = np.clip(np.clip(cand, x - eps, x + eps), 0.0, 1.0)

        margin_c = _margin_np(logits_fn, cand, y)
        take = (margin_c < loss_min) & (margin_min > 0.0)
        x_best = np.where(take[:, None, None, None], cand, x_best)
        loss_min = np.where(take, margin_c, loss_min)
        margin_min = np.where(take, margin_c, margin_min)
    return x_best, margin_min > 0.0


def square_l1_oracle(
    logits_fn, x, y, *, eps, n_queries, p_init=0.8, rng=None
):
    """Eager official L1 Square (square.py L1 branch: L1 norms, exact
    ball∩box projection after each proposal)."""
    from ..ops.norms import l1_projection

    def l1_proj(xc, d):
        return d + np.asarray(
            l1_projection(jnp.asarray(xc), jnp.asarray(d), eps), np.float32
        )

    x = np.asarray(x, np.float32)
    y = np.asarray(y)
    b, h, w, c = x.shape
    n_features = h * w * c

    k_init, k_loop = jax.random.split(rng)
    delta = _grid_init_oracle(x, k_init)
    nrm = np.abs(delta).sum(axis=(1, 2, 3), keepdims=True)
    delta = delta / (nrm + 1e-12) * eps
    delta = l1_proj(x, delta)
    x_best = np.clip(x + delta, 0.0, 1.0)
    margin_min = _margin_np(logits_fn, x_best, y)
    loss_min = margin_min.copy()

    for it in range(n_queries - 1):
        u, signs, transpose = _iter_randoms(k_loop, it, b, c)
        u, signs = np.asarray(u), np.asarray(signs)

        p = p_selection(p_init, it)
        s = max(int(round(np.sqrt(p * n_features / c))), 3)
        if s % 2 == 0:
            s += 1
        s = min(s, h - 1)
        vh, vw = int(u[0] * (h - s)), int(u[1] * (w - s))
        vh2, vw2 = int(u[2] * (h - s)), int(u[3] * (w - s))

        delta = x_best - x
        win1 = delta[:, vh : vh + s, vw : vw + s, :]
        norms_window_1 = np.abs(win1).sum(axis=(1, 2), keepdims=True)
        norms_image = np.abs(delta).sum(axis=(1, 2, 3), keepdims=True)
        mask_image = np.zeros((1, h, w, 1), bool)
        mask_image[:, vh : vh + s, vw : vw + s, :] = True
        mask_image[:, vh2 : vh2 + s, vw2 : vw2 + s, :] = True
        norms_windows = np.abs(delta * mask_image).sum(
            axis=(1, 2), keepdims=True
        )

        new_deltas = eta(s, bool(transpose))[None, :, :, None] * signs
        old_deltas = win1 / (1e-12 + norms_window_1)
        new_deltas = new_deltas + old_deltas
        new_norm = np.abs(new_deltas).sum(axis=(1, 2), keepdims=True)
        budget = np.maximum(eps - norms_image, 0.0) / c + norms_windows
        new_deltas = new_deltas / (1e-12 + new_norm) * budget

        cand_delta = delta.copy()
        cand_delta[:, vh2 : vh2 + s, vw2 : vw2 + s, :] = 0.0
        cand_delta[:, vh : vh + s, vw : vw + s, :] = new_deltas
        cand_delta = l1_proj(x, cand_delta)
        cand = np.clip(x + cand_delta, 0.0, 1.0)

        margin_c = _margin_np(logits_fn, cand, y)
        take = (margin_c < loss_min) & (margin_min > 0.0)
        x_best = np.where(take[:, None, None, None], cand, x_best)
        loss_min = np.where(take, margin_c, loss_min)
        margin_min = np.where(take, margin_c, margin_min)
    return x_best, margin_min > 0.0
