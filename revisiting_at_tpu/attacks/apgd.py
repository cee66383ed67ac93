"""APGD (Auto-PGD) as a single jitted `lax.scan` — the framework's hot loop.

Semantic parity with the reference training attack
(/root/reference/autopgd_train_clean.py:123-371): k forward/backward steps
w.r.t. the INPUT with momentum (α=0.75 after step 0), per-sample adaptive
step size halved on oscillation / no-improvement checkpoints, best-loss
tracking, snap-back to the best point, and Linf/L2/L1 ball projection
(L1 with sparse top-k gradient + exact ball projection).

TPU-first design (not a port):
  * the whole attack is ONE `lax.scan` over iterations inside the caller's
    jit — adversarial example generation never leaves the chip;
  * all of the reference's per-sample boolean indexing
    (`x_best[ind] = ...`, `step_size[ind_fl_osc] /= 2`) becomes branch-free
    masked `jnp.where` updates on fixed-shape carries;
  * `check_oscillation`'s rolling window over the loss history (reference
    :116-121) is a masked gather over a fixed (n_iter, bs) history buffer
    carried through the scan — including the reference's negative-index
    wraparound on the first checkpoint (torch `x[-1]` semantics);
  * the final iteration runs forward-only outside the scan, preserving the
    reference's cost anatomy of (k+1) forwards + k input-backwards;
  * carries are float32: momentum, projections and DLR ratios need f32 even
    when the model computes in bf16.

Cost per call: (n_iter+1) model forwards + n_iter input-gradients, all
model-eval-mode (deterministic) — the caller wires the training forward.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.losses import is_correct, make_criterion
from ..ops.norms import l0_norm, l1_projection, l2_norm

Array = jax.Array
LogitsFn = Callable[[Array], Array]


@dataclasses.dataclass
class ApgdResult:
    """Mirror of the reference's return tuple (autopgd_train_clean.py:371)."""

    x_best: Array  # best-loss point (what training consumes, main.py:291-293)
    acc: Array  # [B] bool: still-correct after the attack
    loss_best: Array  # [B] best per-sample loss
    x_best_adv: Array  # last point that flipped the prediction (eval robust point)


def _loss_grad_fn(logits_fn: LogitsFn, criterion, y):
    def f(x_adv):
        logits = logits_fn(x_adv)
        li = criterion(logits, y)
        return jnp.sum(li), (li, logits)

    return jax.value_and_grad(f, has_aux=True)


def _bcast(v: Array, ndim: int) -> Array:
    return v.reshape((-1,) + (1,) * (ndim - 1))


def apgd_attack(
    logits_fn: LogitsFn,
    x: Array,
    y: Array,
    *,
    norm: str = "Linf",
    eps: float = 4.0 / 255.0,
    n_iter: int = 10,
    loss: str = "ce",
    y_target: Array | None = None,
    is_train: bool = True,
    rng: Array | None = None,
    random_start: bool = False,
) -> ApgdResult:
    """Run APGD against `logits_fn` (a deterministic model closure).

    `random_start` reproduces the eval-flavour init used by AutoAttack's APGD
    (random point in the ball); the training flavour starts from x
    (reference autopgd_train_clean.py:134-137).
    """
    if norm not in ("Linf", "L2", "L1"):
        raise ValueError(f"unsupported norm {norm!r}")

    bs = x.shape[0]
    ndim = x.ndim
    n_fts = math.prod(x.shape[1:])
    x = x.astype(jnp.float32)

    criterion_indiv = make_criterion(loss)
    if loss == "dlr-targeted":
        assert y_target is not None, "dlr-targeted needs y_target"
        crit = lambda logits, yy: criterion_indiv(logits, yy, y_target)
    else:
        crit = criterion_indiv
    lg = _loss_grad_fn(logits_fn, crit, y)

    # --- init (reference :134-174) ---
    if random_start:
        assert rng is not None, "random_start needs rng"
        if norm == "Linf":
            t = jax.random.uniform(rng, x.shape, jnp.float32, -1.0, 1.0)
            x_adv = x + eps * t / jnp.max(jnp.abs(t.reshape(bs, -1)), axis=1).reshape(
                (-1,) + (1,) * (ndim - 1)
            )
        elif norm == "L2":
            t = jax.random.normal(rng, x.shape, jnp.float32)
            x_adv = x + eps * t / (l2_norm(t, keepdims=True) + 1e-12)
        else:  # L1: random point projected into the ball — the exact-L1
            # projection soft-thresholds, so the init is sparse (AutoAttack's
            # autopgd_base L1 init: x + t + L1_projection(x, t, eps))
            t = jax.random.normal(rng, x.shape, jnp.float32)
            x_adv = x + t + l1_projection(x, t, eps)
    else:
        x_adv = x
    x_adv = jnp.clip(x_adv, 0.0, 1.0)

    if norm in ("Linf", "L2"):
        n_iter_2 = max(int(0.22 * n_iter), 1)
        n_iter_min = max(int(0.06 * n_iter), 1)
        size_decr = max(int(0.03 * n_iter), 1)
        k0 = n_iter_2
        k_max = n_iter_2  # k only ever decreases
        thr_decr = 0.75
        alpha = 2.0
    else:  # L1
        k0 = max(int(0.04 * n_iter), 1)
        k_max = k0
        init_topk = 0.05 if is_train else 0.2
        adasp_redstep = 1.5
        adasp_minstep = 10.0
        alpha = 1.0

    step_size0 = alpha * eps * jnp.ones((bs,) + (1,) * (ndim - 1), jnp.float32)

    (_, (li0, logits0)), grad0 = lg(x_adv)
    acc0 = is_correct(logits0, y)

    carry = dict(
        x_adv=x_adv,
        x_adv_old=x_adv,
        grad=grad0,
        grad_best=grad0,
        x_best=x_adv,
        x_best_adv=x_adv,
        loss_best=li0,
        loss_best_last_check=li0,
        reduced_last_check=jnp.ones((bs,), jnp.float32),
        loss_steps=jnp.zeros((n_iter, bs), jnp.float32),
        step_size=step_size0,
        acc=acc0,
        counter3=jnp.zeros((), jnp.int32),
        k=jnp.asarray(k0, jnp.int32),
    )
    if norm == "L1":
        carry["topk"] = init_topk * jnp.ones((bs,), jnp.float32)
        carry["sp_old"] = float(n_fts) * jnp.ones((bs,), jnp.float32)

    def momentum_step(c, i):
        """Reference :211-260 — gradient step with momentum + ball projection."""
        x_adv_c, grad, step_size = c["x_adv"], c["grad"], c["step_size"]
        grad2 = x_adv_c - c["x_adv_old"]
        a = jnp.where(i > 0, 0.75, 1.0)

        if norm == "Linf":
            x1 = x_adv_c + step_size * jnp.sign(grad)
            x1 = jnp.clip(jnp.clip(x1, x - eps, x + eps), 0.0, 1.0)
            x1 = x_adv_c + (x1 - x_adv_c) * a + grad2 * (1.0 - a)
            x1 = jnp.clip(jnp.clip(x1, x - eps, x + eps), 0.0, 1.0)
        elif norm == "L2":
            x1 = x_adv_c + step_size * grad / (l2_norm(grad, keepdims=True) + 1e-12)
            d = x1 - x
            x1 = jnp.clip(
                x + d / (l2_norm(d, keepdims=True) + 1e-12)
                * jnp.minimum(eps, l2_norm(d, keepdims=True)),
                0.0,
                1.0,
            )
            x1 = x_adv_c + (x1 - x_adv_c) * a + grad2 * (1.0 - a)
            d = x1 - x
            x1 = jnp.clip(
                x + d / (l2_norm(d, keepdims=True) + 1e-12)
                * jnp.minimum(eps, l2_norm(d, keepdims=True)),
                0.0,
                1.0,
            )
        else:  # L1: sparse top-k gradient direction (reference :239-250)
            topk = c["topk"]
            gabs = jnp.abs(grad).reshape(bs, -1)
            gsort = jnp.sort(gabs, axis=-1)
            topk_curr = jnp.clip((1.0 - topk) * n_fts, 0, n_fts - 1).astype(jnp.int32)
            thresh = jnp.take_along_axis(gsort, topk_curr[:, None], axis=1)
            thresh = thresh.reshape((-1,) + (1,) * (ndim - 1))
            sparsegrad = grad * (jnp.abs(grad) >= thresh).astype(grad.dtype)
            sg_sign = jnp.sign(sparsegrad)
            denom = jnp.sum(jnp.abs(sg_sign).reshape(bs, -1), axis=-1)
            x1 = x_adv_c + step_size * sg_sign / (
                _bcast(denom, ndim) + 1e-10
            )
            delta_u = x1 - x
            delta_p = l1_projection(x, delta_u, eps)
            x1 = x + delta_u + delta_p

        return x1, grad2

    def bookkeeping(c, i, x1, li, logits, g_new, update_grad):
        """Reference :291-364 — acc/best tracking + checkpoint step-size logic."""
        pred = is_correct(logits, y)
        acc = jnp.logical_and(c["acc"], pred)
        mis = _bcast((~pred).astype(jnp.float32), ndim)
        x_best_adv = x1 * mis + c["x_best_adv"] * (1.0 - mis)

        improved = li > c["loss_best"]
        imp = _bcast(improved.astype(jnp.float32), ndim)
        x_best = x1 * imp + c["x_best"] * (1.0 - imp)
        grad_for_best = g_new if update_grad else c["grad"]
        grad_best = grad_for_best * imp + c["grad_best"] * (1.0 - imp)
        loss_best = jnp.where(improved, li, c["loss_best"])

        loss_steps = jax.lax.dynamic_update_index_in_dim(c["loss_steps"], li, i, axis=0)
        counter3 = c["counter3"] + 1
        k = c["k"]
        is_ckpt = counter3 == k

        grad = g_new if update_grad else c["grad"]
        x_adv = x1
        step_size = c["step_size"]
        new = dict(c)

        if norm in ("Linf", "L2"):
            # check_oscillation (reference :116-121) with torch negative-index
            # wraparound semantics on the zero-initialised history buffer.
            cs = jnp.arange(k_max)
            idx_hi = jnp.mod(i - cs, n_iter)
            idx_lo = jnp.mod(i - cs - 1, n_iter)
            inc = (
                jnp.take(loss_steps, idx_hi, axis=0) > jnp.take(loss_steps, idx_lo, axis=0)
            ).astype(jnp.float32)
            cmask = (cs < k).astype(jnp.float32)[:, None]
            t = jnp.sum(inc * cmask, axis=0)
            fl_osc = (t <= k.astype(jnp.float32) * thr_decr).astype(jnp.float32)
            fl_no_impr = (1.0 - c["reduced_last_check"]) * (
                c["loss_best_last_check"] >= loss_best
            ).astype(jnp.float32)
            fl_osc = jnp.maximum(fl_osc, fl_no_impr)

            ck = is_ckpt.astype(jnp.float32)
            new["reduced_last_check"] = fl_osc * ck + c["reduced_last_check"] * (1 - ck)
            new["loss_best_last_check"] = jnp.where(is_ckpt, loss_best, c["loss_best_last_check"])
            halve = _bcast(fl_osc * ck, ndim)
            step_size = step_size * (1.0 - halve) + step_size * 0.5 * halve
            x_adv = x_adv * (1.0 - halve) + x_best * halve
            grad = grad * (1.0 - halve) + grad_best * halve
            new["k"] = jnp.where(
                is_ckpt, jnp.maximum(k - size_decr, n_iter_min), k
            )
        else:  # L1 sparsity adaptation (reference :351-364)
            sp_curr = l0_norm(x_best - x)
            fl_redtopk = ((sp_curr / c["sp_old"]) < 0.95).astype(jnp.float32)
            ck = is_ckpt.astype(jnp.float32)
            new["topk"] = jnp.where(is_ckpt, sp_curr / n_fts / 1.5, c["topk"])
            ss_new = _bcast(fl_redtopk, ndim) * (alpha * eps) + (
                1.0 - _bcast(fl_redtopk, ndim)
            ) * (step_size / adasp_redstep)
            ss_new = jnp.clip(ss_new, alpha * eps / adasp_minstep, alpha * eps)
            step_size = jnp.where(is_ckpt, ss_new, step_size)
            new["sp_old"] = jnp.where(is_ckpt, sp_curr, c["sp_old"])
            snap = _bcast(fl_redtopk * ck, ndim)
            x_adv = x_adv * (1.0 - snap) + x_best * snap
            grad = grad * (1.0 - snap) + grad_best * snap

        new.update(
            x_adv=x_adv,
            x_adv_old=c["x_adv"],
            grad=grad,
            grad_best=grad_best,
            x_best=x_best,
            x_best_adv=x_best_adv,
            loss_best=loss_best,
            loss_steps=loss_steps,
            step_size=step_size,
            acc=acc,
            counter3=jnp.where(is_ckpt, 0, counter3),
        )
        return new

    def body(c, i):
        x1, _ = momentum_step(c, i)
        (_, (li, logits)), g_new = lg(x1)
        c = bookkeeping(c, i, x1, li, logits, g_new, update_grad=True)
        return c, None

    if n_iter > 1:
        carry, _ = jax.lax.scan(body, carry, jnp.arange(n_iter - 1))

    # final iteration: forward only, no input-gradient (reference :267-283
    # skips the last backward); checkpoint state updates are dead after this.
    i_last = jnp.asarray(n_iter - 1, jnp.int32)
    x1, _ = momentum_step(carry, i_last)
    logits = logits_fn(x1)
    li = crit(logits, y)
    pred = is_correct(logits, y)
    acc = jnp.logical_and(carry["acc"], pred)
    mis = _bcast((~pred).astype(jnp.float32), ndim)
    x_best_adv = x1 * mis + carry["x_best_adv"] * (1.0 - mis)
    improved = li > carry["loss_best"]
    imp = _bcast(improved.astype(jnp.float32), ndim)
    x_best = x1 * imp + carry["x_best"] * (1.0 - imp)
    loss_best = jnp.where(improved, li, carry["loss_best"])

    return ApgdResult(x_best=x_best, acc=acc, loss_best=loss_best, x_best_adv=x_best_adv)


def apgd_train(
    logits_fn: LogitsFn,
    x: Array,
    y: Array,
    *,
    norm: str = "Linf",
    eps: float = 4.0 / 255.0,
    n_iter: int = 2,
    loss: str = "ce",
    is_train: bool = True,
) -> ApgdResult:
    """Training-flavour APGD: clean init, same signature role as the reference
    `apgd_train` bound into WrappedModel (main.py:831-836). Training consumes
    `.x_best` (main.py:291-293)."""
    return apgd_attack(
        logits_fn, x, y, norm=norm, eps=eps, n_iter=n_iter, loss=loss, is_train=is_train
    )
