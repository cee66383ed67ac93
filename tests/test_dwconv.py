"""Pallas depthwise-7x7 kernel vs lax.conv: forward and gradients."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from revisiting_at_tpu.ops.dwconv import dwconv7x7


def ref_dwconv(x, w, b):
    C = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    ) + b


def make(B=2, H=12, W=16, C=8, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w = jnp.asarray((rng.randn(7, 7, 1, C) * 0.2).astype(np.float32))
    b = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    return x, w, b


class TestDwconvKernel:
    def test_forward(self):
        x, w, b = make()
        got = dwconv7x7(x, w, b, True)
        ref = ref_dwconv(x, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

    def test_gradients(self):
        x, w, b = make(seed=1)

        def loss_k(x, w, b):
            return jnp.sum(dwconv7x7(x, w, b, True) ** 2)

        def loss_r(x, w, b):
            return jnp.sum(ref_dwconv(x, w, b) ** 2)

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, w, b)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, w, b)
        for n, a, bb in zip(["dx", "dw", "db"], gk, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), atol=2e-3, rtol=1e-3, err_msg=n
            )

    def test_in_model_equivalence(self):
        from functools import partial

        from revisiting_at_tpu.models import ConvStem1
        from revisiting_at_tpu.models.convnext import ConvNeXt

        kw = dict(
            depths=(1, 1, 1, 1), dims=(16, 32, 64, 128),
            stem_factory=partial(ConvStem1, siz=8), num_classes=7,
            dtype=jnp.float32,
        )
        m0 = ConvNeXt(**kw)
        m1 = ConvNeXt(use_pallas_dwconv=True, pallas_interpret=True, **kw)
        v = m0.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
        a = m0.apply(v, x, train=False)
        b = m1.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3, rtol=2e-2)



class TestDwconvKernelV2:
    """v2 hoisted-shift scheduling (VERDICT r2 item 2) — same contract."""

    def test_forward(self):
        from revisiting_at_tpu.ops.dwconv import dwconv7x7_v2

        x, w, b = make(seed=3)
        got = dwconv7x7_v2(x, w, b, True)
        ref = ref_dwconv(x, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

    def test_gradients(self):
        from revisiting_at_tpu.ops.dwconv import dwconv7x7_v2

        x, w, b = make(seed=4)

        def loss_k(x, w, b):
            return jnp.sum(dwconv7x7_v2(x, w, b, True) ** 2)

        def loss_r(x, w, b):
            return jnp.sum(ref_dwconv(x, w, b) ** 2)

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, w, b)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, w, b)
        for n, a, bb in zip(["dx", "dw", "db"], gk, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), atol=2e-3, rtol=1e-3, err_msg=n
            )


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
