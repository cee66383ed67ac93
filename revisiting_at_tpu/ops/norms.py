"""Per-sample norms and threat-model ball projections.

Capability parity with the reference threat-model math
(/root/reference/autopgd_train_clean.py:8-91), re-derived for JAX:
vectorized, fixed-shape, fully branch-free — the L1-ball projection's
per-row bisection `while` loop becomes a monotone prefix search
(`sum of mask`) over the sorted breakpoint array, so everything jits.

All functions take NHWC (or any [B, ...]) arrays and reduce over all
non-batch axes. Accumulations are done in float32 regardless of input
dtype (bf16-safe).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _flat(x: jax.Array) -> jax.Array:
    return x.reshape(x.shape[0], -1)


def _keep(z: jax.Array, ref_shape: tuple[int, ...], keepdims: bool) -> jax.Array:
    if keepdims:
        return z.reshape((-1,) + (1,) * (len(ref_shape) - 1))
    return z


def l1_norm(x: jax.Array, keepdims: bool = False) -> jax.Array:
    """Per-sample L1 norm (reference autopgd_train_clean.py:8-12)."""
    z = jnp.sum(jnp.abs(_flat(x)).astype(jnp.float32), axis=-1)
    return _keep(z, x.shape, keepdims)


def l2_norm(x: jax.Array, keepdims: bool = False) -> jax.Array:
    """Per-sample L2 norm (reference autopgd_train_clean.py:14-18)."""
    xf = _flat(x).astype(jnp.float32)
    z = jnp.sqrt(jnp.sum(xf * xf, axis=-1))
    return _keep(z, x.shape, keepdims)


def l0_norm(x: jax.Array) -> jax.Array:
    """Per-sample L0 norm (count of nonzeros; reference autopgd_train_clean.py:20-21)."""
    return jnp.sum((_flat(x) != 0.0).astype(jnp.float32), axis=-1)


def linf_project(x_adv: jax.Array, x: jax.Array, eps: float) -> jax.Array:
    """Project x_adv onto the Linf ball of radius eps around x, intersected with [0,1]."""
    z = jnp.clip(x_adv, x - eps, x + eps)
    return jnp.clip(z, 0.0, 1.0)


def l2_project(x_adv: jax.Array, x: jax.Array, eps: float) -> jax.Array:
    """Project x_adv onto the L2 ball of radius eps around x, intersected with [0,1].

    Matches the reference's rescale-then-clip composition
    (autopgd_train_clean.py:231-233): delta is rescaled onto the ball
    first, then the result is clipped to the box.
    """
    delta = (x_adv - x).astype(jnp.float32)
    n = l2_norm(delta, keepdims=True)
    factor = jnp.minimum(jnp.asarray(eps, jnp.float32), n) / (n + 1e-12)
    return jnp.clip(x + delta * factor, 0.0, 1.0).astype(x_adv.dtype)


def l1_projection(x2: jax.Array, y2: jax.Array, eps1: float) -> jax.Array:
    """Exact projection onto {z : ||z||_1 <= eps1, 0 <= x2 + z <= 1}, expressed as a delta.

    Given the ball center ``x2`` and a current perturbation ``y2`` (so the
    point being projected is ``x2 + y2``), returns ``delta`` such that
    ``x2 + y2 + delta`` lies in the intersection of the L1 ball of radius
    ``eps1`` around ``x2`` and the box [0, 1], with ``||y2 + delta||_1 = eps1``
    when the input point is outside the ball.

    Semantics match the reference's sort + bisection algorithm
    (/root/reference/autopgd_train_clean.py:24-91), but the per-row
    log2(d)-step bisection `while` loop is replaced with a single
    vectorized count over the monotone piecewise-linear objective —
    same O(d log d) sort cost, zero host control flow, jit-safe.
    """
    bs = x2.shape[0]
    x = _flat(x2).astype(jnp.float32)
    y = _flat(y2).astype(jnp.float32)

    sigma = jnp.sign(y)
    # u <= 0: per-coordinate room (in the sign direction) before hitting the box;
    # nonzero only where x + y is outside [0, 1].
    u = jnp.minimum(1.0 - x - y, x + y)
    u = jnp.minimum(jnp.zeros_like(y), u)
    l = -jnp.abs(y)
    d = u

    # Sorted breakpoints of the piecewise-linear mass-removed(alpha) function.
    bps = jnp.sort(-jnp.concatenate([u, l], axis=1), axis=1)  # ascending
    inu = jnp.where(
        jnp.argsort(-jnp.concatenate([u, l], axis=1), axis=1, stable=True) < u.shape[1],
        1.0,
        -1.0,
    )
    bps2 = jnp.concatenate([bps[:, 1:], jnp.zeros((bs, 1), bps.dtype)], axis=1)
    size1 = jnp.cumsum(inu, axis=1)

    s1 = -jnp.sum(u, axis=1)  # mass removed by box projection alone
    c = eps1 - jnp.sum(jnp.abs(y), axis=1)
    needs_proj = (s1 + c) < 0.0  # rows still outside the L1 ball after box projection

    s = s1[:, None] + jnp.cumsum((bps2 - bps) * size1, axis=1)

    # Find lb = largest index with s[lb] + c < 0 (the reference's bisection target).
    mask = (s + c[:, None]) < 0.0
    lb = jnp.maximum(jnp.sum(mask.astype(jnp.int32), axis=1) - 1, 0)

    row = jnp.arange(bs)
    lb_next = jnp.minimum(lb + 1, s.shape[1] - 1)
    alpha = (-s[row, lb] - c) / size1[row, lb_next] + bps2[row, lb]

    # d_i = -min(max(-u_i, alpha), -l_i): soft-threshold magnitudes at alpha,
    # never beyond |y_i|, never less than the box-mandated shrink -u_i.
    d_proj = -jnp.minimum(jnp.maximum(-u, alpha[:, None]), -l)
    d = jnp.where(needs_proj[:, None], d_proj, d)

    return (sigma * d).reshape(x2.shape).astype(x2.dtype)


def check_imgs(adv: jax.Array, x: jax.Array, norm: str) -> tuple[float, float, float]:
    """ε-ball invariant checker: max perturbation norm, value range.

    Rebuild of the reference's empirical attack-output verifier
    (utils_eval.py:67-81). Returns (max_norm, min_pixel, max_pixel).
    """
    delta = (adv - x).astype(jnp.float32)
    if norm == "Linf":
        res = jnp.max(jnp.abs(delta))
    elif norm == "L2":
        res = jnp.max(l2_norm(delta))
    elif norm == "L1":
        res = jnp.max(l1_norm(delta))
    else:
        raise ValueError(f"unknown norm {norm}")
    return float(res), float(jnp.min(adv)), float(jnp.max(adv))
