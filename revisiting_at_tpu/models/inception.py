"""Inception-v3 in Flax, NHWC (reference factory entry 'inception',
utils_architecture.py:313-314; torchvision inception_v3 topology without the
training-time aux classifier, which the reference never uses for AT)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class BasicConv(nn.Module):
    features: int
    kernel: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: Sequence[tuple[int, int]] | str = "VALID"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


def _pad(k):
    return [(k // 2, k // 2), (k // 2, k // 2)]


class InceptionA(nn.Module):
    pool_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = lambda f, k, p, n: BasicConv(f, k, padding=p, dtype=self.dtype, name=n)
        b1 = c(64, (1, 1), "VALID", "b1x1")(x, train=train)
        b5 = c(48, (1, 1), "VALID", "b5_1")(x, train=train)
        b5 = c(64, (5, 5), _pad(5), "b5_2")(b5, train=train)
        b3 = c(64, (1, 1), "VALID", "b3_1")(x, train=train)
        b3 = c(96, (3, 3), _pad(3), "b3_2")(b3, train=train)
        b3 = c(96, (3, 3), _pad(3), "b3_3")(b3, train=train)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(3))
        bp = c(self.pool_features, (1, 1), "VALID", "bpool")(bp, train=train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = lambda f, k, s, p, n: BasicConv(f, k, strides=s, padding=p, dtype=self.dtype, name=n)
        b3 = c(384, (3, 3), (2, 2), "VALID", "b3")(x, train=train)
        bd = c(64, (1, 1), (1, 1), "VALID", "bd_1")(x, train=train)
        bd = c(96, (3, 3), (1, 1), _pad(3), "bd_2")(bd, train=train)
        bd = c(96, (3, 3), (2, 2), "VALID", "bd_3")(bd, train=train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c7 = self.channels_7x7
        c = lambda f, k, p, n: BasicConv(f, k, padding=p, dtype=self.dtype, name=n)
        p17 = [(0, 0), (3, 3)]
        p71 = [(3, 3), (0, 0)]
        b1 = c(192, (1, 1), "VALID", "b1x1")(x, train=train)
        b7 = c(c7, (1, 1), "VALID", "b7_1")(x, train=train)
        b7 = c(c7, (1, 7), p17, "b7_2")(b7, train=train)
        b7 = c(192, (7, 1), p71, "b7_3")(b7, train=train)
        bd = c(c7, (1, 1), "VALID", "bd_1")(x, train=train)
        bd = c(c7, (7, 1), p71, "bd_2")(bd, train=train)
        bd = c(c7, (1, 7), p17, "bd_3")(bd, train=train)
        bd = c(c7, (7, 1), p71, "bd_4")(bd, train=train)
        bd = c(192, (1, 7), p17, "bd_5")(bd, train=train)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(3))
        bp = c(192, (1, 1), "VALID", "bpool")(bp, train=train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = lambda f, k, s, p, n: BasicConv(f, k, strides=s, padding=p, dtype=self.dtype, name=n)
        b3 = c(192, (1, 1), (1, 1), "VALID", "b3_1")(x, train=train)
        b3 = c(320, (3, 3), (2, 2), "VALID", "b3_2")(b3, train=train)
        b7 = c(192, (1, 1), (1, 1), "VALID", "b7_1")(x, train=train)
        b7 = c(192, (1, 7), (1, 1), [(0, 0), (3, 3)], "b7_2")(b7, train=train)
        b7 = c(192, (7, 1), (1, 1), [(3, 3), (0, 0)], "b7_3")(b7, train=train)
        b7 = c(192, (3, 3), (2, 2), "VALID", "b7_4")(b7, train=train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = lambda f, k, p, n: BasicConv(f, k, padding=p, dtype=self.dtype, name=n)
        p13 = [(0, 0), (1, 1)]
        p31 = [(1, 1), (0, 0)]
        b1 = c(320, (1, 1), "VALID", "b1x1")(x, train=train)
        b3 = c(384, (1, 1), "VALID", "b3_1")(x, train=train)
        b3a = c(384, (1, 3), p13, "b3_2a")(b3, train=train)
        b3b = c(384, (3, 1), p31, "b3_2b")(b3, train=train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = c(448, (1, 1), "VALID", "bd_1")(x, train=train)
        bd = c(384, (3, 3), _pad(3), "bd_2")(bd, train=train)
        bda = c(384, (1, 3), p13, "bd_3a")(bd, train=train)
        bdb = c(384, (3, 1), p31, "bd_3b")(bd, train=train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(3))
        bp = c(192, (1, 1), "VALID", "bpool")(bp, train=train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    num_classes: int = 1000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        c = lambda f, k, s, p, n: BasicConv(f, k, strides=s, padding=p, dtype=self.dtype, name=n)
        x = c(32, (3, 3), (2, 2), "VALID", "Conv2d_1a")(x, train=train)
        x = c(32, (3, 3), (1, 1), "VALID", "Conv2d_2a")(x, train=train)
        x = c(64, (3, 3), (1, 1), _pad(3), "Conv2d_2b")(x, train=train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = c(80, (1, 1), (1, 1), "VALID", "Conv2d_3b")(x, train=train)
        x = c(192, (3, 3), (1, 1), "VALID", "Conv2d_4a")(x, train=train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, dtype=self.dtype, name="Mixed_5b")(x, train=train)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5c")(x, train=train)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5d")(x, train=train)
        x = InceptionB(dtype=self.dtype, name="Mixed_6a")(x, train=train)
        x = InceptionC(128, dtype=self.dtype, name="Mixed_6b")(x, train=train)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6c")(x, train=train)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6d")(x, train=train)
        x = InceptionC(192, dtype=self.dtype, name="Mixed_6e")(x, train=train)
        x = InceptionD(dtype=self.dtype, name="Mixed_7a")(x, train=train)
        x = InceptionE(dtype=self.dtype, name="Mixed_7b")(x, train=train)
        x = InceptionE(dtype=self.dtype, name="Mixed_7c")(x, train=train)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=jnp.float32, param_dtype=jnp.float32,
                        name="fc")(x)
