"""Optimizers with the reference's weight-decay grouping semantics.

Parity with `create_optimizer` (main.py:395-459):
  * AdamW(betas=(0.9, 0.95)) or SGD(momentum), decoupled WD for AdamW,
    coupled (L2) WD for SGD — exactly torch's behaviour
  * WD exclusion rule depends on model family (main.py:400-447):
      - convnext/resnet: name-based — exclude params whose torch name
        contains 'bn' or '.bias'. For ConvNeXt that excludes ONLY biases
        (LN scales and layerscale gamma DO get decay); for ResNet it also
        excludes all BatchNorm parameters.
      - everything else (ViTs): exclude ndim<=1 params (biases, LN scales,
        gammas) — cls_token/pos_embed (ndim 3) get decay.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax


def _path_names(path) -> list[str]:
    return [getattr(k, "key", getattr(k, "name", str(k))) for k in path]


def wd_mask(params: Any, family: str) -> Any:
    """True where weight decay applies."""

    def convnext_rule(path, leaf):
        names = _path_names(path)
        return not names[-1].endswith("bias")

    def resnet_rule(path, leaf):
        names = _path_names(path)
        in_bn = any("bn" in n or n.endswith("_bn") or n == "BatchNorm" for n in names)
        return not (in_bn or names[-1].endswith("bias"))

    def ndim_rule(path, leaf):
        return leaf.ndim > 1

    rule = {"convnext": convnext_rule, "resnet": resnet_rule}.get(family, ndim_rule)
    return jax.tree_util.tree_map_with_path(rule, params)


def freeze_labels(params: Any, early: bool) -> Any:
    """'train'/'freeze' label pytree for stem-only vs all-but-stem fine-tuning
    (reference freeze_some_layers, main.py:305-324: early=True trains ONLY the
    stem; early=False trains everything BUT the stem)."""

    def rule(path, leaf):
        in_stem = any("stem" in n.lower() for n in _path_names(path))
        trainable = in_stem if early else not in_stem
        return "train" if trainable else "freeze"

    return jax.tree_util.tree_map_with_path(rule, params)


def make_optimizer(
    *,
    optimizer: str = "adamw",
    weight_decay: float = 0.05,
    momentum: float = 0.9,
    family: str = "convnext",
    learning_rate: Callable | float,
    params: Any,
    grad_clip: float | None = None,
    freeze_some: bool = False,
    early: bool = True,
    grad_accum: int = 1,
) -> optax.GradientTransformation:
    """grad_accum > 1 wraps the whole chain in optax.MultiSteps: k
    micro-batch gradients are averaged before one optimizer step — the
    memory lever for ConvNeXt-L@320-class configs (absent in the reference,
    SURVEY.md §2.3 'not present anywhere: gradient accumulation'). The LR
    schedule advances per OPTIMIZER step; the trainer scales
    iters_per_epoch accordingly."""
    mask = wd_mask(params, family)
    parts = []
    if grad_clip:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if optimizer == "adamw":
        parts.append(
            optax.adamw(
                learning_rate=learning_rate,
                b1=0.9,
                b2=0.95,
                eps=1e-8,
                weight_decay=weight_decay,
                mask=mask,
            )
        )
    elif optimizer == "sgd":
        # torch-SGD semantics: coupled L2 before the momentum buffer
        parts.append(optax.add_decayed_weights(weight_decay, mask=mask))
        parts.append(optax.trace(decay=momentum, nesterov=False))
        parts.append(optax.scale_by_learning_rate(learning_rate))
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")
    tx = optax.chain(*parts)
    if freeze_some:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, freeze_labels(params, early)
        )
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx
