"""Fused Pallas attention: numerical parity with the einsum/softmax path,
forward and gradients (interpret mode on CPU), plus in-model equivalence
for the ViT."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from revisiting_at_tpu.ops.attention import fused_attention, fused_attention_qkv


def ref_attention(q, k, v):
    hd = q.shape[-1]
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn * hd**-0.5, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v)


def make_qkv(seed=0, b=2, n=197, h=3, hd=64):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(b, n, h, hd).astype(np.float32) * 0.5)
    return mk(), mk(), mk()


class TestFusedAttention:
    @pytest.mark.parametrize("n", [8, 64, 197])  # incl. non-multiple-of-8
    def test_forward_parity(self, n):
        q, k, v = make_qkv(seed=1, n=n)
        want = np.asarray(ref_attention(q, k, v))
        got = np.asarray(fused_attention(q, k, v, interpret=True))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    def test_gradient_parity(self):
        q, k, v = make_qkv(seed=2, n=29)

        def loss_f(f):
            return lambda *a: jnp.sum(f(*a) ** 2)

        g_ref = jax.grad(loss_f(ref_attention), argnums=(0, 1, 2))(q, k, v)
        g_fused = jax.grad(
            loss_f(lambda *a: fused_attention(*a, interpret=True)), argnums=(0, 1, 2)
        )(q, k, v)
        for name, a, b in zip("qkv", g_fused, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4,
                err_msg=f"d{name}",
            )

    def test_in_model_equivalence(self):
        """vit_micro with use_pallas(interpret) == without: logits and input
        gradients. use_pallas enables BOTH the fused attention kernel and the
        fused MLP tail (tanh-form GELU, |err| <= ~3e-3 — ops/block_mlp.py),
        so the model-level tolerance is the gelu-approximation bound; exact
        attention-kernel parity is asserted by the direct tests above."""
        from revisiting_at_tpu.models import get_model

        x = jnp.asarray(
            np.random.RandomState(3).uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
        )
        m_plain, _ = get_model("vit_micro", num_classes=7, dtype=jnp.float32)
        m_fused, _ = get_model(
            "vit_micro", num_classes=7, dtype=jnp.float32,
            use_pallas=True, pallas_interpret=True,
        )
        variables = m_plain.init(jax.random.PRNGKey(0), x, train=False)
        lp = m_plain.apply(variables, x, train=False)
        lf = m_fused.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lp), atol=5e-3, rtol=1e-2)

        def g(m):
            return jax.grad(
                lambda xx: jnp.sum(m.apply(variables, xx, train=False) ** 2)
            )(x)

        np.testing.assert_allclose(
            np.asarray(g(m_fused)), np.asarray(g(m_plain)), atol=5e-3, rtol=2e-2
        )


class TestFusedAttentionQKV:
    """v2 kernel: consumes the qkv Dense output [B, N, 3D] directly (no
    head transposes / explicit pads; ragged token blocks; fused dqkv)."""

    @staticmethod
    def ref_qkv(qkv, num_heads):
        B, N, tD = qkv.shape
        D = tD // 3
        hd = D // num_heads
        q, k, v = (qkv[..., i * D:(i + 1) * D].reshape(B, N, num_heads, hd)
                   for i in range(3))
        return ref_attention(q, k, v).reshape(B, N, D)

    @pytest.mark.parametrize("n", [8, 197])  # incl. ragged (non-multiple-of-8)
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_forward_parity(self, n, dtype):
        rng = np.random.RandomState(4)
        qkv = jnp.asarray(rng.randn(3, n, 6 * 32).astype(np.float32) * 0.5, dtype)
        want = np.asarray(self.ref_qkv(qkv, 2), np.float32)
        got = np.asarray(fused_attention_qkv(qkv, 2, interpret=True), np.float32)
        atol = 2e-5 if dtype == jnp.float32 else 3e-2
        np.testing.assert_allclose(got, want, atol=atol, rtol=1e-2)

    @pytest.mark.parametrize("n", [16, 197])
    def test_gradient_parity(self, n):
        rng = np.random.RandomState(5)
        qkv = jnp.asarray(rng.randn(2, n, 6 * 32).astype(np.float32) * 0.5)

        g_ref = jax.grad(lambda z: jnp.sum(self.ref_qkv(z, 2) ** 2))(qkv)
        g_fused = jax.grad(
            lambda z: jnp.sum(fused_attention_qkv(z, 2, interpret=True) ** 2)
        )(qkv)
        np.testing.assert_allclose(
            np.asarray(g_fused), np.asarray(g_ref), atol=5e-5, rtol=1e-4
        )

    def test_matches_v1_wrapper(self):
        """Same math as the v1 [B*H, N, hd] kernel, bit-for-bit inputs."""
        rng = np.random.RandomState(6)
        B, N, H, hd = 2, 197, 3, 64
        D = H * hd
        qkv = jnp.asarray(rng.randn(B, N, 3 * D).astype(np.float32) * 0.5)
        q, k, v = (qkv[..., i * D:(i + 1) * D].reshape(B, N, H, hd)
                   for i in range(3))
        v1 = np.asarray(fused_attention(q, k, v, interpret=True)).reshape(B, N, D)
        v2 = np.asarray(fused_attention_qkv(qkv, H, interpret=True))
        np.testing.assert_allclose(v2, v1, atol=2e-5, rtol=1e-5)

    def test_in_model_impl_equivalence(self):
        """vit_micro logits + input grads identical between attn_impl='qkv'
        (default) and attn_impl='bhnd' under one param tree."""
        from revisiting_at_tpu.models import get_model

        x = jnp.asarray(
            np.random.RandomState(7).uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
        )
        kw = dict(num_classes=7, dtype=jnp.float32, use_pallas=True,
                  pallas_interpret=True)
        m_v2, _ = get_model("vit_micro", **kw)  # attn_impl defaults to 'qkv'
        m_v1, _ = get_model("vit_micro", attn_impl="bhnd", **kw)
        variables = m_v2.init(jax.random.PRNGKey(0), x, train=False)
        l2 = m_v2.apply(variables, x, train=False)
        l1 = m_v1.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), atol=1e-4, rtol=1e-4)

        def g(m):
            return jax.grad(
                lambda xx: jnp.sum(m.apply(variables, xx, train=False) ** 2)
            )(x)

        np.testing.assert_allclose(
            np.asarray(g(m_v2)), np.asarray(g(m_v1)), atol=1e-4, rtol=1e-3
        )


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
