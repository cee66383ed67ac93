"""On-device MixUp/CutMix with timm `Mixup` semantics.

Parity with the reference's timm Mixup(mixup_alpha=0.8, cutmix_alpha=1.0,
prob=1.0, switch_prob=0.5, mode='batch', label_smoothing=0.1)
(main.py:599-607, applied on-batch before the attack main.py:965-966).

TPU-first: a pure jitted function folded into the train step — one Beta
draw per batch ('batch' mode), the mixed partner is the flipped batch,
CutMix boxes are mask built from broadcasted iota (static shapes).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MixupConfig:
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    prob: float = 1.0
    switch_prob: float = 0.5
    label_smoothing: float = 0.1
    num_classes: int = 1000


def one_hot_smooth(y: Array, num_classes: int, smoothing: float) -> Array:
    on = 1.0 - smoothing + smoothing / num_classes
    off = smoothing / num_classes
    return jax.nn.one_hot(y, num_classes, dtype=jnp.float32) * (on - off) + off


def _rand_bbox(rng: Array, h: int, w: int, lam: Array):
    """timm rand_bbox: cut box of relative area (1-lam) centered uniformly, clipped."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    ky, kx = jax.random.split(rng)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    yl = jnp.clip(cy - cut_h // 2, 0, h)
    yh = jnp.clip(cy + cut_h // 2, 0, h)
    xl = jnp.clip(cx - cut_w // 2, 0, w)
    xh = jnp.clip(cx + cut_w // 2, 0, w)
    return yl, yh, xl, xh


def mixup_cutmix(
    rng: Array, images: Array, labels: Array, cfg: MixupConfig
) -> tuple[Array, Array]:
    """Apply batch-mode MixUp or CutMix. images NHWC, labels int [B].

    Returns (mixed_images, soft_targets[B, C]).
    """
    b, h, w, _ = images.shape
    k_apply, k_switch, k_lam_m, k_lam_c, k_box = jax.random.split(rng, 5)

    apply_mix = jax.random.uniform(k_apply) < cfg.prob
    use_cutmix = jnp.logical_and(
        jax.random.uniform(k_switch) < cfg.switch_prob, cfg.cutmix_alpha > 0.0
    )
    if cfg.mixup_alpha <= 0.0:
        use_cutmix = jnp.asarray(True)

    lam_mix = jax.random.beta(k_lam_m, cfg.mixup_alpha, cfg.mixup_alpha)
    lam_cut = jax.random.beta(k_lam_c, cfg.cutmix_alpha, cfg.cutmix_alpha)

    flipped = images[::-1]

    # --- mixup branch ---
    mixed_m = images * lam_mix + flipped * (1.0 - lam_mix)

    # --- cutmix branch: paste the flipped batch inside the box ---
    yl, yh, xl, xh = _rand_bbox(k_box, h, w, lam_cut)
    ys = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 2)
    box = ((ys >= yl) & (ys < yh) & (xs >= xl) & (xs < xh)).astype(images.dtype)
    mixed_c = images * (1.0 - box) + flipped * box
    lam_cut_corr = 1.0 - ((yh - yl) * (xh - xl)).astype(jnp.float32) / float(h * w)

    lam = jnp.where(use_cutmix, lam_cut_corr, lam_mix)
    mixed = jnp.where(use_cutmix, mixed_c, mixed_m)

    lam = jnp.where(apply_mix, lam, 1.0)
    mixed = jnp.where(apply_mix, mixed, images)

    y1 = one_hot_smooth(labels, cfg.num_classes, cfg.label_smoothing)
    y2 = y1[::-1]
    targets = y1 * lam + y2 * (1.0 - lam)
    return mixed.astype(images.dtype), targets
