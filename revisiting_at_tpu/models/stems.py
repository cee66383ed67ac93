"""Model stems: standard patchify stems and the paper's ConvStem variants.

The ConvStem (Conv-LN-GELU stacks replacing patchify) is the reference
paper's key architectural novelty. Parity map (reference
utils_architecture.py:120-217, rb_architecture_util.py:162-193):

  ConvStem   (siz=48, end_siz, fin_dim)  /16 downsample, 4x (conv3x3 s2 + LN
             + GELU) doubling channels, then 1x1 conv to the ViT embed dim.
             vit_s/deit_s -> ConvStem(48, 8) [fin 384]; vit_b ->
             ConvStem(48, 16, fin_dim=None) [fin 768].
  ConvStem2  (siz=48) same trunk, fixed 1x1 to 512 (deit3-medium / vit_m).
  ConvStem3  (siz)    /4 downsample: conv3x3 s2 (siz) + conv3x3 s2 (1.5siz)
             + conv3x3 s1 (2siz), each LN+GELU. convnext_base -> siz=64,
             convnext_large -> siz=96.
  ConvStem1  (siz=48) /4 downsample: conv3x3 s2 (siz) + conv3x3 s2 (2siz),
             each LN+GELU. convnext_tiny/small.

All stems output NHWC feature maps; ViTs flatten them to tokens.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv, LayerNorm


class PatchifyStem(nn.Module):
    """ConvNeXt default stem: conv k4 s4 + LN (timm semantics)."""

    features: int
    patch_size: int = 4
    dtype: jnp.dtype = jnp.float32
    use_blurpool: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Conv(
            self.features,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            use_blurpool=self.use_blurpool,
            name="proj",
        )(x)
        return LayerNorm(dtype=self.dtype, name="norm")(x)


class PatchEmbed(nn.Module):
    """ViT patch embedding: conv k16 s16 (timm PatchEmbed.proj)."""

    features: int
    patch_size: int = 16
    dtype: jnp.dtype = jnp.float32
    use_blurpool: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return Conv(
            self.features,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            use_blurpool=self.use_blurpool,
            name="proj",
        )(x)


def _conv_ln_gelu(x, features, stride, dtype, use_blurpool, idx, s2d=False):
    x = Conv(
        features,
        (3, 3),
        strides=(stride, stride),
        padding=[(1, 1), (1, 1)],
        dtype=dtype,
        use_blurpool=use_blurpool,
        s2d=s2d,
        kernel_init=nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
        name=f"conv{idx}",
    )(x)
    x = LayerNorm(dtype=dtype, name=f"norm{idx}")(x)
    return nn.gelu(x, approximate=False)


class ConvStem(nn.Module):
    """Reference ConvBlock (utils_architecture.py:120-144): /16 ViT ConvStem.

    fin_dim semantics mirror the reference: ``planes*end_siz if fin_dim != 432
    else 432`` — i.e. fin_dim=432 pins 432 (isotropic 'updated' variant),
    anything else (incl. None) resolves to planes*end_siz.
    """

    siz: int = 48
    end_siz: int = 8
    fin_dim: int | None = 384
    dtype: jnp.dtype = jnp.float32
    use_blurpool: bool = False
    s2d: bool = False  # stride-2 convs via space-to-depth (ops/stem_conv.py)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.siz
        fin = 432 if self.fin_dim == 432 else p * self.end_siz
        for i, feats in enumerate([p, p * 2, p * 4, p * 8]):
            x = _conv_ln_gelu(x, feats, 2, self.dtype, self.use_blurpool, i,
                              s2d=self.s2d)
        return Conv(
            fin, (1, 1), strides=(1, 1), padding="VALID", dtype=self.dtype, name="proj"
        )(x)


class ConvStem2(nn.Module):
    """Reference ConvBlock2 (utils_architecture.py:146-171): fixed fin 512 (vit_m)."""

    siz: int = 48
    dtype: jnp.dtype = jnp.float32
    use_blurpool: bool = False
    s2d: bool = False  # see ConvStem.s2d

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.siz
        for i, feats in enumerate([p, p * 2, p * 4, p * 8]):
            x = _conv_ln_gelu(x, feats, 2, self.dtype, self.use_blurpool, i,
                              s2d=self.s2d)
        return Conv(
            512, (1, 1), strides=(1, 1), padding="VALID", dtype=self.dtype, name="proj"
        )(x)


class ConvStem3(nn.Module):
    """Reference ConvBlock3 (utils_architecture.py:174-195): /4 ConvNeXt-B/L stem."""

    siz: int = 64
    dtype: jnp.dtype = jnp.float32
    use_blurpool: bool = False
    s2d: bool = False  # see ConvStem.s2d

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.siz
        x = _conv_ln_gelu(x, p, 2, self.dtype, self.use_blurpool, 0, s2d=self.s2d)
        x = _conv_ln_gelu(x, int(p * 1.5), 2, self.dtype, self.use_blurpool, 1,
                          s2d=self.s2d)
        x = _conv_ln_gelu(x, p * 2, 1, self.dtype, self.use_blurpool, 2)
        return x


class ConvStem1(nn.Module):
    """Reference ConvBlock1 (utils_architecture.py:198-217): /4 ConvNeXt-T/S stem."""

    siz: int = 48
    dtype: jnp.dtype = jnp.float32
    use_blurpool: bool = False
    s2d: bool = False  # see ConvStem.s2d

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.siz
        x = _conv_ln_gelu(x, p, 2, self.dtype, self.use_blurpool, 0, s2d=self.s2d)
        x = _conv_ln_gelu(x, p * 2, 2, self.dtype, self.use_blurpool, 1,
                          s2d=self.s2d)
        return x
