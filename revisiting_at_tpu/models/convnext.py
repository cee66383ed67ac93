"""ConvNeXt (T/S/B/L + isotropic) in Flax, NHWC, timm-compatible semantics.

Capability parity with the reference model zoo (utils_architecture.py:225-322,
which builds timm ConvNeXts and optionally swaps the stem for a ConvStem).
Re-designed TPU-first: NHWC layout so the 7x7 depthwise conv and the two
pointwise Dense layers map straight onto VPU/MXU tiles, bf16 compute with
f32 params, LayerScale as a simple broadcast multiply that XLA fuses.

Structure (timm convnext.py semantics):
  stem: conv k4 s4 + LN  (or a ConvStem variant)
  4 stages: [LN + conv k2 s2 downsample] + N blocks
  block: dwconv7x7 -> LN -> Dense(4C) -> GELU -> Dense(C) -> gamma * . -> droppath + residual
  head: global avg pool -> LN -> Dense(num_classes)

Isotropic variant (models/convnext_iso.py in the reference): patchify /16 to
a single width, N blocks, no downsampling, LN + head.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv, DropPath, LayerNorm, trunc_normal_init
from .stems import PatchifyStem


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float = 0.0
    layer_scale_init: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        shortcut = x
        x = nn.Conv(
            features=self.dim,
            kernel_size=(7, 7),
            padding=[(3, 3), (3, 3)],
            feature_group_count=self.dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init,
            name="dwconv",
        )(x)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.Dense(
            4 * self.dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init,
            name="pwconv1",
        )(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(
            self.dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init,
            name="pwconv2",
        )(x)
        if self.layer_scale_init > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init),
                (self.dim,),
                jnp.float32,
            )
            x = x * gamma.astype(x.dtype)
        x = DropPath(self.drop_path, name="drop_path")(x, deterministic=not train)
        return shortcut + x


class ConvNeXt(nn.Module):
    """ConvNeXt with a pluggable stem.

    stem_factory: callable returning a Flax module mapping NHWC [0,1] images
    to the stage-0 feature map (must downsample by 4 and output dims[0]
    channels). Defaults to the timm patchify stem.
    """

    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    layer_scale_init: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    stem_factory: Callable[..., nn.Module] | None = None
    use_blurpool: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        if self.stem_factory is not None:
            x = self.stem_factory(dtype=self.dtype, use_blurpool=self.use_blurpool)(x)
        else:
            x = PatchifyStem(
                self.dims[0], dtype=self.dtype, use_blurpool=self.use_blurpool, name="stem"
            )(x)

        total_blocks = sum(self.depths)
        dp_rates = [
            self.drop_path_rate * i / max(total_blocks - 1, 1) for i in range(total_blocks)
        ]
        cur = 0
        for si, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if si > 0:
                x = LayerNorm(dtype=self.dtype, name=f"downsample_norm{si}")(x)
                x = Conv(
                    dim,
                    (2, 2),
                    strides=(2, 2),
                    padding="VALID",
                    dtype=self.dtype,
                    use_blurpool=self.use_blurpool,
                    name=f"downsample_conv{si}",
                )(x)
            for bi in range(depth):
                x = ConvNeXtBlock(
                    dim,
                    drop_path=dp_rates[cur],
                    layer_scale_init=self.layer_scale_init,
                    dtype=self.dtype,
                    name=f"stage{si}_block{bi}",
                )(x, train=train)
                cur += 1

        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        x = LayerNorm(dtype=self.dtype, name="head_norm")(x.astype(self.dtype))
        x = nn.Dense(
            self.num_classes,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init,
            name="head",
        )(x)
        return x


class ConvNeXtIsotropic(nn.Module):
    """Isotropic ConvNeXt (reference models/convnext_iso.py:19-93): constant
    width/resolution, patchify /16, `depth` blocks, LN + linear head."""

    dim: int = 384
    depth: int = 18
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    layer_scale_init: float = 0.0  # convnext_iso uses no layerscale by default
    dtype: jnp.dtype = jnp.float32
    stem_factory: Callable[..., nn.Module] | None = None
    use_blurpool: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        if self.stem_factory is not None:
            x = self.stem_factory(dtype=self.dtype, use_blurpool=self.use_blurpool)(x)
        else:
            x = Conv(
                self.dim,
                (16, 16),
                strides=(16, 16),
                padding="VALID",
                dtype=self.dtype,
                name="stem",
            )(x)
        dp_rates = [
            self.drop_path_rate * i / max(self.depth - 1, 1) for i in range(self.depth)
        ]
        for bi in range(self.depth):
            x = ConvNeXtBlock(
                self.dim,
                drop_path=dp_rates[bi],
                layer_scale_init=self.layer_scale_init,
                dtype=self.dtype,
                name=f"block{bi}",
            )(x, train=train)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        x = LayerNorm(dtype=self.dtype, name="head_norm")(x.astype(self.dtype))
        return nn.Dense(
            self.num_classes,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init,
            name="head",
        )(x)


CONVNEXT_CFGS = {
    "tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    "small": dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768)),
    "base": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
    "large": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
}
