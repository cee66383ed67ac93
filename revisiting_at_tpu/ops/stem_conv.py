"""Space-to-depth reformulation of the stride-2 3x3 stem convolutions.

Why: xprof (experiments/artifacts/opstats_vit_s.json) shows XLA's direct
stride-2 3x3 conv lowering runs the ConvStem at 15-25 bf16 TF/s — 4-6% of
the v5e MXU peak — while sitting at neither the compute nor the HBM
roofline; the strided window gather is the limiter, and the backward
(input cotangent of a strided conv = dilated conv) is worse. The stems the
reference introduces (utils_architecture.py:120-217) are stacks of exactly
these convs, costing 22% of the ViT-S AT step and ~10% of the ConvNeXt-T
step (PROFILE.md).

The reformulation: pad by 1, pack 2x2 pixel phases into channels
(space-to-depth), then the stride-2 3x3 conv becomes a stride-1 2x2 conv
over 4C channels whose kernel is the 3x3 kernel zero-embedded into 4x4 and
phase-split. Every direction becomes stride-1/matmul-shaped:

  forward:  conv2x2s1(s2d(pad(x)), W2)            — contraction 16C
  dx:       stride-1 transposed conv + inverse s2d (a reshape/transpose)
  dW:       stride-1 patch correlation (pure MXU reduction)

FLOP cost: 16C vs 9C contraction = 1.78x the useful FLOPs — worth it only
because the direct lowering runs at single-digit MFU (measured per-shape in
experiments/stem_conv_bench.py before this path is enabled).

Derivation: y[r,c] = sum_{dy,dx<3} xp[2r+dy, 2c+dx] w[dy,dx] with
xp = pad(x, 1). Split u = 2du+a (du in {0,1} s2d row, a in {0,1} phase):
the 3x3 taps live in the 4x4 window {2du+a <= 2} x {2dv+b <= 2}, so
W2[du,dv,(a,b,i),o] = w_emb[2du+a, 2dv+b, i, o] with w_emb the 4x4
zero-embedding of w.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _s2d(xp: jax.Array) -> jax.Array:
    """[B, 2U, 2V, C] -> [B, U, V, 4C] with channel order (a, b, i)."""
    B, H2, W2, C = xp.shape
    U, V = H2 // 2, W2 // 2
    xs = xp.reshape(B, U, 2, V, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return xs.reshape(B, U, V, 4 * C)


def pack_w2(w: jax.Array) -> jax.Array:
    """[3, 3, Ci, Co] -> the [2, 2, 4Ci, Co] phase-split zero-embedded kernel."""
    Ci, Co = w.shape[2], w.shape[3]
    w_emb = jnp.zeros((4, 4, Ci, Co), w.dtype).at[:3, :3].set(w)
    # [2du+a, 2dv+b, i, o] -> [du, dv, (a, b, i), o]
    return (
        w_emb.reshape(2, 2, 2, 2, Ci, Co)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(2, 2, 4 * Ci, Co)
    )


def conv3x3s2_s2d(x: jax.Array, w: jax.Array) -> jax.Array:
    """3x3 stride-2 pad-(1,1) convolution of NHWC `x` (even H, W) by
    HWIO `w`, computed as a stride-1 2x2 conv on the space-to-depth image.
    Bit-compatible access pattern with lax.conv(stride=2, padding=1);
    differentiable (dx flows through the inverse transpose, dW through
    pack_w2's scatter)."""
    B, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0, "stem inputs have even spatial dims"
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xs = _s2d(xp)  # [B, (H+2)/2, (W+2)/2, 4C]
    return jax.lax.conv_general_dilated(
        xs,
        pack_w2(w),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
