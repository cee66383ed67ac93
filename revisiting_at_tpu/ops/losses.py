"""Attack and training losses.

Capability parity with the reference criterion set
(/root/reference/autopgd_train_clean.py:94-114): per-sample cross-entropy
(hard int labels or soft/mixup targets), soft-target CE, DLR loss
(untargeted and targeted). All computed in float32 from (possibly bf16)
logits — DLR ratios and log-softmax need f32 accumulation on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _log_softmax32(logits: jax.Array) -> jax.Array:
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def ce_indiv(logits: jax.Array, y: jax.Array) -> jax.Array:
    """Per-sample cross-entropy. `y` may be int labels [B] or soft targets [B, C].

    Mirrors F.cross_entropy(reduction='none') incl. its soft-target form
    (reference autopgd_train_clean.py:113).
    """
    logp = _log_softmax32(logits)
    if y.ndim == 1:
        return -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
    return -jnp.sum(y.astype(jnp.float32) * logp, axis=-1)


def soft_ce_mean(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Soft-target CE, batch mean (reference `softloss`, autopgd_train_clean.py:94-96)."""
    return jnp.mean(-jnp.sum(target.astype(jnp.float32) * _log_softmax32(logits), axis=-1))


def soft_target_ce(logits: jax.Array, target: jax.Array) -> jax.Array:
    """timm SoftTargetCrossEntropy equivalent — the training loss under mixup
    (reference main.py:466)."""
    return soft_ce_mean(logits, target)


def smoothed_ce(logits: jax.Array, y: jax.Array, smoothing: float, num_classes: int) -> jax.Array:
    """Label-smoothed CE over hard int labels (training loss without mixup)."""
    logp = _log_softmax32(logits)
    nll = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(logp, axis=-1)
    return jnp.mean((1.0 - smoothing) * nll + smoothing * smooth)


def dlr_loss(logits: jax.Array, y: jax.Array) -> jax.Array:
    """Difference-of-logits-ratio loss, per sample (reference autopgd_train_clean.py:99-104)."""
    x = logits.astype(jnp.float32)
    x_sorted = jnp.sort(x, axis=1)
    ind_sorted = jnp.argsort(x, axis=1)
    ind = (ind_sorted[:, -1] == y).astype(jnp.float32)
    zy = jnp.take_along_axis(x, y[:, None], axis=1)[:, 0]
    return -(zy - x_sorted[:, -2] * ind - x_sorted[:, -1] * (1.0 - ind)) / (
        x_sorted[:, -1] - x_sorted[:, -3] + 1e-12
    )


def dlr_loss_targeted(logits: jax.Array, y: jax.Array, y_target: jax.Array) -> jax.Array:
    """Targeted DLR loss, per sample (reference autopgd_train_clean.py:106-111)."""
    x = logits.astype(jnp.float32)
    x_sorted = jnp.sort(x, axis=1)
    zy = jnp.take_along_axis(x, y[:, None], axis=1)[:, 0]
    zt = jnp.take_along_axis(x, y_target[:, None], axis=1)[:, 0]
    return -(zy - zt) / (x_sorted[:, -1] - 0.5 * (x_sorted[:, -3] + x_sorted[:, -4]) + 1e-12)


def make_criterion(name: str):
    """Per-sample criterion registry (reference criterion_dict,
    autopgd_train_clean.py:113-114). 'ce' transparently handles soft targets.
    """
    table = {
        "ce": ce_indiv,
        "softloss": soft_ce_mean,
        "dlr": dlr_loss,
        "dlr-targeted": dlr_loss_targeted,
    }
    if name not in table:
        raise ValueError(f"unknown criterion {name!r}; choose from {sorted(table)}")
    return table[name]


def predicted_class(logits: jax.Array) -> jax.Array:
    return jnp.argmax(logits, axis=-1)


def is_correct(logits: jax.Array, y: jax.Array) -> jax.Array:
    """Accuracy indicator; for soft/mixup targets compares against y.argmax
    (reference autopgd_train_clean.py:194-197)."""
    target = y if y.ndim == 1 else jnp.argmax(y, axis=-1)
    return predicted_class(logits) == target
