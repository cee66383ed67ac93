"""ResNet family (ResNet-50/101, WideResNet-50-2) in Flax, NHWC.

Capability parity with the reference factory entries resnet50 /
resnet50_gelu / resnet101 / wrn_50_2 (utils_architecture.py:228-233,
304-308). Standard torchvision/timm bottleneck semantics: 7x7 s2 stem +
maxpool, 4 stages of bottlenecks (1x1 -> 3x3(s) -> 1x1·4), BN + act,
zero-init on the last BN scale of each block.

BatchNorm uses a mutable `batch_stats` collection; during adversarial
example generation the model runs with `train=False` so running stats are
frozen (the reference puts the model in eval() for the attack,
main.py:279).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


def _bn(dtype, name):
    return nn.BatchNorm(
        use_running_average=None,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class Bottleneck(nn.Module):
    features: int  # width of the 3x3 conv
    out_features: int
    strides: int = 1
    act: Callable = nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        use_ra = not train
        shortcut = x
        y = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="conv1",
        )(x)
        y = _bn(self.dtype, "bn1")(y, use_running_average=use_ra)
        y = self.act(y)
        y = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="conv2",
        )(y)
        y = _bn(self.dtype, "bn2")(y, use_running_average=use_ra)
        y = self.act(y)
        y = nn.Conv(
            self.out_features, (1, 1), use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="conv3",
        )(y)
        y = nn.BatchNorm(
            use_running_average=use_ra, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32,
            scale_init=nn.initializers.zeros, name="bn3",
        )(y)
        if shortcut.shape != y.shape:
            shortcut = nn.Conv(
                self.out_features, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                name="downsample_conv",
            )(shortcut)
            shortcut = _bn(self.dtype, "downsample_bn")(shortcut, use_running_average=use_ra)
        return self.act(shortcut + y)


class ResNet(nn.Module):
    stage_sizes: tuple[int, ...] = (3, 4, 6, 3)
    width_factor: int = 1  # 2 for wide_resnet50_2
    num_classes: int = 1000
    act: Callable = nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        use_ra = not train
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv1",
        )(x)
        x = _bn(self.dtype, "bn1")(x, use_running_average=use_ra)
        x = self.act(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        for si, n_blocks in enumerate(self.stage_sizes):
            width = 64 * (2**si) * self.width_factor
            out = 64 * (2**si) * 4
            for bi in range(n_blocks):
                x = Bottleneck(
                    width,
                    out,
                    strides=2 if (si > 0 and bi == 0) else 1,
                    act=self.act,
                    dtype=self.dtype,
                    name=f"stage{si}_block{bi}",
                )(x, train=train)

        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(
            self.num_classes, dtype=jnp.float32, param_dtype=jnp.float32, name="fc"
        )(x)


RESNET_CFGS = {
    "resnet50": dict(stage_sizes=(3, 4, 6, 3), width_factor=1),
    "resnet101": dict(stage_sizes=(3, 4, 23, 3), width_factor=1),
    "wrn_50_2": dict(stage_sizes=(3, 4, 6, 3), width_factor=2),
}
