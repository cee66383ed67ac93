"""DenseNet-201 in Flax, NHWC (reference factory entry 'densnet201',
utils_architecture.py:310-311; torchvision densenet semantics: BN-ReLU-Conv
bottleneck layers with growth 32, transition layers halving channels)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _bn(dtype, name):
    return nn.BatchNorm(
        use_running_average=None, momentum=0.9, epsilon=1e-5,
        dtype=dtype, param_dtype=jnp.float32, name=name,
    )


class DenseLayer(nn.Module):
    growth: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        use_ra = not train
        y = _bn(self.dtype, "norm1")(x, use_running_average=use_ra)
        y = nn.relu(y)
        y = nn.Conv(4 * self.growth, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(y)
        y = _bn(self.dtype, "norm2")(y, use_running_average=use_ra)
        y = nn.relu(y)
        y = nn.Conv(self.growth, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNet(nn.Module):
    block_config: tuple[int, ...] = (6, 12, 48, 32)  # densenet201
    growth: int = 32
    num_init_features: int = 64
    num_classes: int = 1000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        use_ra = not train
        x = nn.Conv(self.num_init_features, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv0")(x)
        x = _bn(self.dtype, "norm0")(x, use_running_average=use_ra)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        for bi, n_layers in enumerate(self.block_config):
            for li in range(n_layers):
                x = DenseLayer(self.growth, dtype=self.dtype,
                               name=f"block{bi}_layer{li}")(x, train=train)
            if bi != len(self.block_config) - 1:
                x = _bn(self.dtype, f"transition{bi}_norm")(x, use_running_average=use_ra)
                x = nn.relu(x)
                x = nn.Conv(x.shape[-1] // 2, (1, 1), use_bias=False, dtype=self.dtype,
                            param_dtype=jnp.float32, name=f"transition{bi}_conv")(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        x = _bn(self.dtype, "norm_final")(x, use_running_average=use_ra)
        x = nn.relu(x)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=jnp.float32, param_dtype=jnp.float32,
                        name="classifier")(x)
