"""Space-to-depth stem conv (ops/stem_conv.py): exactness vs lax.conv in
all three directions, and model-level equivalence of the stem_s2d flag
(same param tree, same logits/input-grads)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from revisiting_at_tpu.ops.stem_conv import conv3x3s2_s2d


def direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class TestS2dConvOp:
    @pytest.mark.parametrize("H,Ci,Co", [(8, 3, 5), (16, 4, 7), (32, 48, 96)])
    def test_forward_exact(self, H, Ci, Co):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, H, H, Ci), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, Ci, Co), jnp.float32)
        # accumulation order differs (phase-major); tolerance is fp noise on
        # a 9*Ci-term contraction, not an algorithmic bound
        np.testing.assert_allclose(
            np.asarray(conv3x3s2_s2d(x, w)), np.asarray(direct(x, w)),
            atol=1e-4, rtol=1e-4,
        )

    def test_gradients_exact(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 16, 16, 4), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 4, 6), jnp.float32)
        dy = jnp.asarray(rng.randn(2, 8, 8, 6), jnp.float32)
        g0 = jax.grad(lambda x, w: jnp.sum(direct(x, w) * dy), argnums=(0, 1))(x, w)
        g1 = jax.grad(lambda x, w: jnp.sum(conv3x3s2_s2d(x, w) * dy), argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g0[0]), atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g0[1]), atol=1e-5, rtol=1e-5)


class TestStemS2dFlag:
    @pytest.mark.parametrize("arch", ["convnext_micro", "vit_micro"])
    def test_model_equivalence(self, arch):
        """stem_s2d=True: identical param tree, logits, input grads."""
        from revisiting_at_tpu.models import get_model

        x = jnp.asarray(
            np.random.RandomState(2).uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
        )
        m0, _ = get_model(arch, not_original=True, num_classes=5, dtype=jnp.float32)
        m1, _ = get_model(arch, not_original=True, num_classes=5, dtype=jnp.float32,
                          stem_s2d=True)
        v0 = m0.init(jax.random.PRNGKey(0), x, train=False)
        v1 = m1.init(jax.random.PRNGKey(0), x, train=False)
        assert jax.tree.structure(v0) == jax.tree.structure(v1)
        l0 = m0.apply(v0, x, train=False)
        l1 = m1.apply(v0, x, train=False)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), atol=2e-4, rtol=1e-3)

        def g(m):
            return jax.grad(
                lambda xx: jnp.sum(m.apply(v0, xx, train=False) ** 2)
            )(x)

        np.testing.assert_allclose(np.asarray(g(m1)), np.asarray(g(m0)),
                                   atol=2e-4, rtol=1e-3)


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
