"""Matmul reformulations of stem/downsample convs vs lax.conv (fwd + grads)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from revisiting_at_tpu.ops.conv_lowering import conv3x3_s2_im2col, patchify_conv


def ref_conv(x, w, b, strides, padding):
    y = jax.lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + b


class TestConvLowering:
    @pytest.mark.parametrize("patch", [2, 4])
    def test_patchify_matches(self, patch):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 16, 16, 5).astype(np.float32))
        w = jnp.asarray(rng.randn(patch, patch, 5, 11).astype(np.float32) * 0.2)
        b = jnp.asarray(rng.randn(11).astype(np.float32) * 0.1)
        got = patchify_conv(x, w, b, patch)
        ref = ref_conv(x, w, b, (patch, patch), "VALID")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_im2col_3x3_s2_matches(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 20, 24, 3).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 3, 8).astype(np.float32) * 0.2)
        b = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)
        got = conv3x3_s2_im2col(x, w, b)
        ref = ref_conv(x, w, b, (2, 2), [(1, 1), (1, 1)])
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_im2col_gradients(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32) * 0.3)
        b = jnp.asarray(rng.randn(4).astype(np.float32) * 0.1)

        g1 = jax.grad(lambda *a: jnp.sum(conv3x3_s2_im2col(*a) ** 2), (0, 1, 2))(x, w, b)
        g2 = jax.grad(
            lambda *a: jnp.sum(ref_conv(*a, (2, 2), [(1, 1), (1, 1)]) ** 2), (0, 1, 2)
        )(x, w, b)
        for a, bb in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-4)

    def test_conv_module_unchanged_params_and_outputs(self):
        """models.layers.Conv keeps the nn.Conv param tree and matches it."""
        from flax import linen as nn

        from revisiting_at_tpu.models.layers import Conv

        mod = Conv(8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                   dtype=jnp.float32)
        old = nn.Conv(8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                      dtype=jnp.float32, param_dtype=jnp.float32)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 12, 12, 5))
        v = mod.init(jax.random.PRNGKey(1), x)
        import flax

        paths = set(flax.traverse_util.flatten_dict(v["params"]).keys())
        assert paths == {("Conv_0", "kernel"), ("Conv_0", "bias")}
        v_old = {"params": {"Conv_0": v["params"]["Conv_0"]}}
        # same weights -> same output as flax's nn.Conv
        out_new = mod.apply(v, x)
        out_old = old.apply({"params": v["params"]["Conv_0"]}, x)
        np.testing.assert_allclose(np.asarray(out_new), np.asarray(out_old), atol=2e-5)


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
