"""Pallas fused block-tail kernel vs the plain jnp path: forward and every
gradient must agree (kernel run in interpret mode on CPU)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from revisiting_at_tpu.ops.block_mlp import block_mlp, pick_m_tile


def make_inputs(B=2, M=32, C=16, seed=0):
    rng = np.random.RandomState(seed)
    s = rng.randn(B, M, C).astype(np.float32)
    r = rng.randn(B, M, C).astype(np.float32)
    keep = np.array([1.0, 0.5][:B] + [1.0] * max(0, B - 2), np.float32)[:B]
    ln_g = rng.uniform(0.5, 1.5, C).astype(np.float32)
    ln_b = rng.randn(C).astype(np.float32) * 0.1
    w1 = (rng.randn(C, 4 * C) * 0.1).astype(np.float32)
    b1 = rng.randn(4 * C).astype(np.float32) * 0.1
    w2 = (rng.randn(4 * C, C) * 0.1).astype(np.float32)
    b2 = rng.randn(C).astype(np.float32) * 0.1
    gamma = rng.uniform(0.1, 1.0, C).astype(np.float32)
    return tuple(jnp.asarray(v) for v in (s, r, keep, ln_g, ln_b, w1, b1, w2, b2, gamma))


def ref_impl(s, r, keep, ln_g, ln_b, w1, b1, w2, b2, gamma):
    sf = s.astype(jnp.float32)
    mu = sf.mean(-1, keepdims=True)
    var = ((sf - mu) ** 2).mean(-1, keepdims=True)
    u = (sf - mu) * jax.lax.rsqrt(var + 1e-6) * ln_g + ln_b
    h = u.astype(jnp.bfloat16) @ w1.astype(jnp.bfloat16)
    h = h.astype(jnp.float32) + b1
    g = jax.nn.gelu(h, approximate=False)
    o = g.astype(jnp.bfloat16) @ w2.astype(jnp.bfloat16)
    o = o.astype(jnp.float32) + b2
    return r + keep[:, None, None] * gamma * o


class TestBlockMlpKernel:
    def test_forward_matches(self):
        args = make_inputs()
        y_ref = ref_impl(*args)
        s = args[0]
        y_k = block_mlp(*args, pick_m_tile(s.shape[1], s.shape[2], 4 * s.shape[2]), True)
        np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref), atol=2e-2, rtol=1e-2)

    def test_gradients_match(self):
        args = make_inputs(seed=1)
        m_tile = pick_m_tile(args[0].shape[1], args[0].shape[2], 4 * args[0].shape[2])

        def loss_k(*a):
            return jnp.sum(block_mlp(*a, m_tile, True) ** 2)

        def loss_r(*a):
            return jnp.sum(ref_impl(*a) ** 2)

        # differentiate wrt everything except keep (index 2)
        argnums = (0, 1, 3, 4, 5, 6, 7, 8, 9)
        gk = jax.grad(loss_k, argnums=argnums)(*args)
        gr = jax.grad(loss_r, argnums=argnums)(*args)
        names = ["ds", "dr", "dln_g", "dln_b", "dw1", "db1", "dw2", "db2", "dgamma"]
        for n, a, b in zip(names, gk, gr):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            denom = np.abs(b).max() + 1e-6
            assert np.abs(a - b).max() / denom < 3e-2, (n, np.abs(a - b).max(), denom)

    def test_input_grad_mode_matches_full(self):
        """grad_mode='input' returns the same ds/dr as the full backward
        (and zero, not garbage, param cotangents)."""
        args = make_inputs(seed=3)
        m_tile = pick_m_tile(args[0].shape[1], args[0].shape[2], 4 * args[0].shape[2])

        def loss(mode, *a):
            return jnp.sum(block_mlp(*a, m_tile, True, mode) ** 2)

        g_full = jax.grad(lambda *a: loss("full", *a), argnums=(0, 1))(*args)
        g_inp = jax.grad(lambda *a: loss("input", *a), argnums=(0, 1))(*args)
        for a, b in zip(g_inp, g_full):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
            )
        # param cotangents are exact zeros in input mode
        gp = jax.grad(lambda *a: loss("input", *a), argnums=(5, 7))(*args)
        for g in gp:
            assert float(jnp.abs(g).max()) == 0.0

    def test_input_grad_view_in_apgd(self):
        """The attack on the input-grad view produces the same adversarial
        points as on the full model (pallas interpret, CPU)."""
        from revisiting_at_tpu.attacks import apgd_attack
        from revisiting_at_tpu.models import get_model
        from revisiting_at_tpu.train.train_step import input_grad_view

        model, _ = get_model(
            "convnext_micro", not_original=True, num_classes=7,
            dtype=jnp.float32, use_pallas=True, pallas_interpret=True,
        )
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.uniform(0.1, 0.9, (4, 32, 32, 3)).astype(np.float32))
        y = jnp.asarray(rng.randint(0, 7, 4))
        variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
        view = input_grad_view(model)
        assert view.pallas_grad_mode == "input"

        fn_full = lambda xa: model.apply(variables, xa, train=False)
        fn_view = lambda xa: view.apply(variables, xa, train=False)
        r_full = apgd_attack(fn_full, x, y, norm="Linf", eps=0.03, n_iter=3)
        r_view = apgd_attack(fn_view, x, y, norm="Linf", eps=0.03, n_iter=3)
        np.testing.assert_allclose(
            np.asarray(r_view.x_best), np.asarray(r_full.x_best), atol=1e-6
        )

    def test_uneven_m_tile(self):
        # M not a multiple of any nice tile: pads internally
        args = make_inputs(B=1, M=24, C=16, seed=2)
        y_ref = ref_impl(*args)
        y_k = block_mlp(*args, pick_m_tile(24, 16, 64), True)
        np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref), atol=2e-2, rtol=1e-2)

    def test_in_model_equivalence(self):
        """ConvNeXt with use_pallas (interpret) == without, fwd and input grad."""
        from revisiting_at_tpu.models import get_model

        kw = dict(not_original=True, num_classes=7, dtype=jnp.float32)
        m0, _ = get_model("convnext_micro", **kw)
        m1, _ = get_model("convnext_micro", use_pallas=True, pallas_interpret=True, **kw)
        v = m0.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
        a = m0.apply(v, x, train=False)
        b = m1.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-2)
        ga = jax.grad(lambda xx: jnp.sum(m0.apply(v, xx, train=False)))(x)
        gb = jax.grad(lambda xx: jnp.sum(m1.apply(v, xx, train=False)))(x)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=5e-3, rtol=2e-2)


class TestSplitBackward:
    """grad_mode='split' (ops/block_mlp.py::_bwd_split, VERDICT r4 item#5):
    the two-kernel full backward must return the same cotangents as the
    monolithic kernel (only the f32 tile-accumulation order may differ)."""

    def _grads(self, mode, args, m_tile):
        def loss(*a):
            return jnp.sum(block_mlp(*a, m_tile, True, mode) ** 2)

        argnums = (0, 1, 3, 4, 5, 6, 7, 8, 9)
        return jax.grad(loss, argnums=argnums)(*args)

    def test_split_matches_monolithic(self):
        args = make_inputs(seed=11)
        m_tile = pick_m_tile(args[0].shape[1], args[0].shape[2], 4 * args[0].shape[2])
        gm = self._grads("full", args, m_tile)
        gs = self._grads("split", args, m_tile)
        names = ["ds", "dr", "dln_g", "dln_b", "dw1", "db1", "dw2", "db2", "dgamma"]
        for n, a, b in zip(names, gs, gm):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            denom = np.abs(b).max() + 1e-6
            assert np.abs(a - b).max() / denom < 1e-4, (n, np.abs(a - b).max(), denom)

    def test_split_matches_reference_c512(self):
        # split mode at a heavy width (ViT-M): against the pure-jnp reference
        args = make_inputs(B=1, M=16, C=512, seed=12)
        m_tile = pick_m_tile(16, 512, 2048)
        gk = jax.grad(lambda *a: jnp.sum(block_mlp(*a, m_tile, True, "split") ** 2),
                      argnums=(0, 5, 7))(*args)
        gr = jax.grad(lambda *a: jnp.sum(ref_impl(*a) ** 2),
                      argnums=(0, 5, 7))(*args)
        for n, a, b in zip(("ds", "dw1", "dw2"), gk, gr):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            denom = np.abs(b).max() + 1e-6
            assert np.abs(a - b).max() / denom < 3e-2, (n, np.abs(a - b).max(), denom)

    def test_split_bwd_model_knob(self):
        """split_bwd=True on the model gives the same input grad as the
        monolithic default (convnext_micro, interpret)."""
        from revisiting_at_tpu.models import get_model

        kw = dict(not_original=True, num_classes=7, dtype=jnp.float32,
                  use_pallas=True, pallas_interpret=True)
        m0, _ = get_model("convnext_micro", **kw)
        m1, _ = get_model("convnext_micro", split_bwd=True, **kw)
        v = m0.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
        ga = jax.grad(lambda xx: jnp.sum(m0.apply(v, xx, train=False)))(x)
        gb = jax.grad(lambda xx: jnp.sum(m1.apply(v, xx, train=False)))(x)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-4, rtol=1e-3)


class TestWideTailForwarding:
    """Regression for the round-5 bug find: hierarchical ConvNeXt never
    forwarded wide_tail (or any tail knob added at model level) to its
    blocks, silently turning the knob into a no-op. Count fused-tail
    pallas_calls in the forward jaxpr: a C=768 stage must fuse exactly when
    wide_tail is on."""

    def _n_pallas(self, wide):
        from revisiting_at_tpu.models.convnext import ConvNeXt

        model = ConvNeXt(
            depths=(1, 1), dims=(384, 768), num_classes=5,
            use_pallas=True, pallas_interpret=True, wide_tail=wide,
        )
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), train=False)

        def loss(x):
            return jnp.sum(model.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)}))

        jaxpr = str(jax.make_jaxpr(jax.grad(loss))(jnp.zeros((1, 16, 16, 3))))
        return jaxpr.count("pallas_call")

    def test_wide_tail_reaches_blocks(self):
        assert self._n_pallas(True) > self._n_pallas(False)


class TestWideChannelGate:
    """Channel-width fusion gate (ops/block_mlp.py::tail_fusable) and kernel
    parity at the wide widths it admits (ViT-M heavy, ConvNeXt-B/L
    attack-closure input mode)."""

    def test_tail_fusable_table(self):
        from revisiting_at_tpu.ops.block_mlp import tail_fusable

        assert tail_fusable(96, "full") and tail_fusable(384, "input")
        assert tail_fusable(512, "full")  # ViT-M: heavy bwd fits @ 26 MB
        assert not tail_fusable(768, "full")  # ViT-B full bwd stays on XLA
        assert tail_fusable(768, "input")  # ViT-B attack closure fuses
        assert tail_fusable(1024, "input")  # ConvNeXt-B stage 3 closure
        assert not tail_fusable(1536, "input")  # ConvNeXt-L stage 3: never
        # wide_tail knob: heavy backward admitted through C=1024 against
        # the 64 MB scoped cap; C=1536 impossible at any cap (113 MB fixed)
        assert tail_fusable(768, "full", wide=True)  # ViT-B / L stage 2
        assert tail_fusable(1024, "full", wide=True)  # ConvNeXt-B stage 3
        assert not tail_fusable(1536, "full", wide=True)
        assert not tail_fusable(1536, "input", wide=True)

    def test_wide_tail_heavy_parity_c768(self):
        # the wide_tail path: full backward at C=768 (ViT-B width) — same
        # kernel, wide 56 MB tile budget (pick_m_tile) + 64 MB scoped cap
        args = make_inputs(B=1, M=16, C=768, seed=9)
        m_tile = pick_m_tile(16, 768, 3072)
        gk = jax.grad(lambda *a: jnp.sum(block_mlp(*a, m_tile, True) ** 2),
                      argnums=(0, 5, 7))(*args)
        gr = jax.grad(lambda *a: jnp.sum(ref_impl(*a) ** 2),
                      argnums=(0, 5, 7))(*args)
        for n, a, b in zip(("ds", "dw1", "dw2"), gk, gr):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            denom = np.abs(b).max() + 1e-6
            assert np.abs(a - b).max() / denom < 3e-2, (n, np.abs(a - b).max(), denom)

    def test_wide_heavy_parity_c512(self):
        args = make_inputs(B=1, M=16, C=512, seed=7)
        m_tile = pick_m_tile(16, 512, 2048)
        y_k = np.asarray(block_mlp(*args, m_tile, True), np.float64)
        y_r = np.asarray(ref_impl(*args), np.float64)
        # bf16 accumulation over H=2048 makes elementwise rtol meaningless
        # near zeros — bound the error against the output scale instead
        assert np.abs(y_k - y_r).max() / (np.abs(y_r).max() + 1e-6) < 1e-2
        argnums = (0, 5, 7)
        gk = jax.grad(lambda *a: jnp.sum(block_mlp(*a, m_tile, True) ** 2),
                      argnums=argnums)(*args)
        gr = jax.grad(lambda *a: jnp.sum(ref_impl(*a) ** 2), argnums=argnums)(*args)
        for n, a, b in zip(("ds", "dw1", "dw2"), gk, gr):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            denom = np.abs(b).max() + 1e-6
            assert np.abs(a - b).max() / denom < 3e-2, (n, np.abs(a - b).max(), denom)

    def test_wide_input_mode_parity_c1024(self):
        args = make_inputs(B=1, M=8, C=1024, seed=8)
        m_tile = pick_m_tile(8, 1024, 4096, heavy=False)
        gk = jax.grad(lambda *a: jnp.sum(block_mlp(*a, m_tile, True, "input") ** 2))(
            *args
        )
        gr = jax.grad(lambda *a: jnp.sum(ref_impl(*a) ** 2))(*args)
        a, b = np.asarray(gk, np.float64), np.asarray(gr, np.float64)
        assert np.abs(a - b).max() / (np.abs(b).max() + 1e-6) < 3e-2


class TestVitMlpTail:
    """ViT blocks reuse the fused kernel for norm2->fc1->gelu->fc2->ls2
    (ops/block_mlp.py::vit_mlp_tail); s == r == block input."""

    def _models(self, **kw):
        from revisiting_at_tpu.models import get_model

        common = dict(not_original=True, num_classes=7, dtype=jnp.float32, **kw)
        m0, _ = get_model("vit_micro", **common)
        m1, _ = get_model("vit_micro", use_pallas=True, pallas_interpret=True, **common)
        return m0, m1

    def test_param_tree_identical(self):
        m0, m1 = self._models()
        v0 = m0.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
        v1 = m1.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
        p0 = jax.tree_util.tree_flatten_with_path(v0["params"])[0]
        p1 = jax.tree_util.tree_flatten_with_path(v1["params"])[0]
        assert [(jax.tree_util.keystr(k), v.shape) for k, v in p0] == [
            (jax.tree_util.keystr(k), v.shape) for k, v in p1
        ]

    def test_fwd_and_input_grad_match(self):
        m0, m1 = self._models()
        v = m0.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
        a = m0.apply(v, x, train=False)
        b = m1.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-2)
        ga = jax.grad(lambda xx: jnp.sum(m0.apply(v, xx, train=False)))(x)
        gb = jax.grad(lambda xx: jnp.sum(m1.apply(v, xx, train=False)))(x)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=5e-3, rtol=2e-2)

    def test_input_grad_mode_matches_full(self):
        _, m1 = self._models()
        v = m1.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
        m1i = m1.clone(pallas_grad_mode="input")
        g_full = jax.grad(lambda xx: jnp.sum(m1.apply(v, xx, train=False)))(x)
        g_in = jax.grad(lambda xx: jnp.sum(m1i.apply(v, xx, train=False)))(x)
        np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_in), atol=1e-6)

    def test_droppath_train_path(self):
        """Per-sample keep layout ([B, N, C] grid, tile == token axis)."""
        m0, m1 = self._models(drop_path_rate=0.5)
        v = m0.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
        x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))
        o = m1.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
        assert o.shape == (4, 7) and bool(jnp.all(jnp.isfinite(o)))
        # weight grads flow in train mode (full grad path)
        g = jax.grad(
            lambda p: jnp.sum(
                m1.apply({"params": p}, x, train=True,
                         rngs={"dropout": jax.random.PRNGKey(2)})
            )
        )(v["params"])
        flat = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in flat)


class TestWideTailModel:
    """wide_tail model knob: the fused FULL backward past C=512 must match
    the jnp path it replaces (ViT-B block width 768, ConvNeXt-B stage-3
    width 1024), with identical param trees."""

    def test_vit_block_wide_tail_c768(self):
        from revisiting_at_tpu.models.vit import ViTBlock

        kw = dict(dim=768, num_heads=12, dtype=jnp.float32,
                  use_pallas=True, pallas_interpret=True)
        m_xla = ViTBlock(**kw, wide_tail=False)  # gate blocks C=768 full -> jnp tail
        m_wide = ViTBlock(**kw, wide_tail=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 768)) * 0.5
        v = m_xla.init(jax.random.PRNGKey(1), x, False)
        assert jax.tree_util.tree_structure(
            m_wide.init(jax.random.PRNGKey(1), x, False)
        ) == jax.tree_util.tree_structure(v)
        a = m_xla.apply(v, x, False)
        b = m_wide.apply(v, x, False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-2)
        ga = jax.grad(lambda p: jnp.sum(m_xla.apply({"params": p}, x, False) ** 2))(
            v["params"])
        gb = jax.grad(lambda p: jnp.sum(m_wide.apply({"params": p}, x, False) ** 2))(
            v["params"])
        for (ka, la), (kb, lb) in zip(
            jax.tree_util.tree_flatten_with_path(ga)[0],
            jax.tree_util.tree_flatten_with_path(gb)[0],
        ):
            la, lb = np.asarray(la, np.float64), np.asarray(lb, np.float64)
            denom = np.abs(la).max() + 1e-5
            assert np.abs(la - lb).max() / denom < 3e-2, jax.tree_util.keystr(ka)

    def test_convnext_block_wide_tail_c1024(self):
        from revisiting_at_tpu.models.convnext import ConvNeXtBlock

        kw = dict(dim=1024, dtype=jnp.float32, use_pallas=True,
                  pallas_interpret=True)
        m_xla = ConvNeXtBlock(**kw, wide_tail=False)
        m_wide = ConvNeXtBlock(**kw, wide_tail=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 1024)) * 0.5
        v = m_xla.init(jax.random.PRNGKey(1), x, False)
        a = m_xla.apply(v, x, False)
        b = m_wide.apply(v, x, False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-2)
        gxa = jax.grad(lambda xx: jnp.sum(m_xla.apply(v, xx, False) ** 2))(x)
        gxb = jax.grad(lambda xx: jnp.sum(m_wide.apply(v, xx, False) ** 2))(x)
        da, db = np.asarray(gxa, np.float64), np.asarray(gxb, np.float64)
        assert np.abs(da - db).max() / (np.abs(da).max() + 1e-5) < 3e-2


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
