"""Shared model layers (NHWC, bf16-compute / f32-params).

TPU-first re-designs of the reference's building blocks:
  * LayerNorm over channels — the reference's custom channels-first LN
    (utils_architecture.py:57-81) is, in NHWC layout, just a LayerNorm over
    the trailing axis; no permutes needed on TPU.
  * ImageNormalizer / normalize_model (utils_architecture.py:86-117)
  * DropPath (stochastic depth) with per-sample Bernoulli
  * BlurPool (main.py:246-257): fixed 3x3 binomial depthwise blur before
    strided convs
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype

# Truncated-normal(std=0.02) init used by timm for ViT/ConvNeXt weights.
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


class LayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis, eps=1e-6, f32 statistics.

    Equivalent to the reference's channels_first LayerNorm
    (utils_architecture.py:57-81) once images are NHWC.
    """

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.LayerNorm(
            epsilon=self.epsilon,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            use_bias=True,
            use_scale=True,
        )(x)


class ImageNormalizer(nn.Module):
    """(x - mean) / std as the first model layer, so attacks stay in [0,1]
    pixel space (reference utils_architecture.py:86-98).
    """

    mean: Sequence[float]
    std: Sequence[float]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mean = jnp.asarray(self.mean, dtype=x.dtype).reshape(1, 1, 1, -1)
        std = jnp.asarray(self.std, dtype=x.dtype).reshape(1, 1, 1, -1)
        return (x - mean) / std


class NormalizedModel(nn.Module):
    """Sequential(normalize, model) (reference utils_architecture.py:111-117)."""

    model: nn.Module
    mean: Sequence[float]
    std: Sequence[float]

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = ImageNormalizer(self.mean, self.std, name="normalize")(x)
        return self.model(x, train=train)


def drop_path(
    x: jax.Array, rate: float, deterministic: bool, rng: jax.Array | None
) -> jax.Array:
    """Per-sample stochastic depth. Keeps expectation via 1/keep_prob scaling."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, p=keep, shape=shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("dropout")
        return drop_path(x, self.rate, deterministic, rng)


def blur_pool_2d(x: jax.Array) -> jax.Array:
    """Depthwise 3x3 binomial blur, stride 1, SAME padding (reference main.py:246-257)."""
    c = x.shape[-1]
    filt = jnp.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], dtype=x.dtype) / 16.0
    filt = jnp.tile(filt[:, :, None, None], (1, 1, 1, c))  # HWIO with I=1, O=C groups
    return jax.lax.conv_general_dilated(
        x,
        filt,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


class _RawConv(nn.Module):
    """Conv with explicit params and MXU-friendly lowering.

    Param layout matches nn.Conv (kernel HWIO + bias), and this module is
    instantiated under the name "Conv_0" so param trees are byte-identical to
    the nn.Conv-based ones.
    """

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int]
    padding: str | Sequence[tuple[int, int]]
    use_bias: bool
    dtype: Dtype
    kernel_init: Callable
    s2d: bool = False  # stride-2 3x3 via space-to-depth (ops/stem_conv.py)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, cin, self.features), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        b = bias.astype(self.dtype) if bias is not None else None

        # NOTE: matmul reformulations of these convs (ops/conv_lowering.py:
        # space-to-depth patchify, 3x3/s2 im2col) both measured SLOWER
        # end-to-end on v5e than XLA's conv lowering (143 -> 153 ms/step; the
        # reshape/transpose copies and strided-slice gradients outweigh the
        # matmul gain). Kept there with tests as documented dead ends.
        # ops/stem_conv.py is a THIRD formulation (stride-1 2x2 conv on the
        # 2x2-phase-packed image): same math, all directions stride-1.
        pad_11 = not isinstance(self.padding, str) and tuple(
            map(tuple, self.padding)
        ) == ((1, 1), (1, 1))
        if (
            self.s2d
            and (kh, kw) == (3, 3)
            and tuple(self.strides) == (2, 2)
            and pad_11
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        ):
            from ..ops.stem_conv import conv3x3s2_s2d

            y = conv3x3s2_s2d(x, k)
            return y + b if b is not None else y
        y = jax.lax.conv_general_dilated(
            x, k, self.strides, self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b if b is not None else y


class Conv(nn.Module):
    """3x3/1x1/kxk conv wrapper: NHWC, f32 params, compute dtype configurable,
    optional BlurPool on strided convs (in_channels >= 16, reference main.py:808-813).
    """

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: str | Sequence[tuple[int, int]] = "SAME"
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    use_blurpool: bool = False
    kernel_init: Callable = trunc_normal_init
    s2d: bool = False  # see _RawConv.s2d

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.use_blurpool and max(self.strides) > 1 and x.shape[-1] >= 16:
            x = blur_pool_2d(x)
        return _RawConv(
            features=self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=self.padding,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            s2d=self.s2d,
            name="Conv_0",
        )(x)


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array, *args, **kwargs) -> jax.Array:
        return x
