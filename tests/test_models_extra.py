"""Tests for the remaining zoo entries (DenseNet-201, Inception-v3), the
remat flag, and layer freezing."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from revisiting_at_tpu.models import get_model


def n_params(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


class TestExtraModels:
    def test_densenet201_param_parity(self):
        model, meta = get_model("densnet201", dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
        # torchvision densenet201: 20,013,928 params
        assert n_params(variables["params"]) == 20_013_928
        assert meta.has_batch_stats and "batch_stats" in variables

    def test_inception_param_parity_and_forward(self):
        model, meta = get_model("inception", dtype=jnp.float32)
        # inception_v3 needs 299x299; use 128 to keep CPU time sane (all convs
        # are size-agnostic; pooling shrinks to >=1)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)), train=False)
        # torchvision inception_v3 without aux classifier: 23,834,568 params
        assert n_params(variables["params"]) == 23_834_568
        out = model.apply(variables, jnp.ones((1, 299, 299, 3)) * 0.5, train=False)
        assert out.shape == (1, 1000)

    def test_remat_same_function(self):
        kw = dict(not_original=True, num_classes=7, dtype=jnp.float32)
        m0, _ = get_model("convnext_micro", remat=False, **kw)
        m1, _ = get_model("convnext_micro", remat=True, **kw)
        v = m0.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
        a = m0.apply(v, x, train=False)
        b = m1.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        # grads also agree
        ga = jax.grad(lambda xx: jnp.sum(m0.apply(v, xx, train=False)))(x)
        gb = jax.grad(lambda xx: jnp.sum(m1.apply(v, xx, train=False)))(x)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-5)


class TestFreezing:
    def test_stem_only_updates(self):
        import optax

        from revisiting_at_tpu.train.optimizer import freeze_labels, make_optimizer

        model, meta = get_model(
            "convnext_micro", not_original=True, num_classes=7, dtype=jnp.float32
        )
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)[
            "params"
        ]
        labels = freeze_labels(params, early=True)
        import flax

        flat = flax.traverse_util.flatten_dict(labels)
        assert any(v == "train" for v in flat.values())
        assert any(v == "freeze" for v in flat.values())

        tx = make_optimizer(
            optimizer="adamw", weight_decay=0.05, family=meta.family,
            learning_rate=1e-3, params=params, freeze_some=True, early=True,
        )
        opt_state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, opt_state, params)
        flat_u = flax.traverse_util.flatten_dict(updates)
        for path, u in flat_u.items():
            lbl = flat[path]
            moved = bool(jnp.any(u != 0))
            assert moved == (lbl == "train"), (path, lbl)


class TestBlurPool:
    def test_blur_matches_reference_formula(self):
        # reference BlurPoolConv2d (main.py:246-257): depthwise 3x3 binomial
        # /16, stride 1, zero 'SAME' padding, applied BEFORE the strided conv
        torch = pytest.importorskip("torch")
        from revisiting_at_tpu.models.layers import blur_pool_2d

        rng = np.random.RandomState(0)
        x = rng.uniform(0, 1, (2, 9, 9, 16)).astype(np.float32)
        ours = np.asarray(blur_pool_2d(jnp.asarray(x)))

        filt = torch.tensor([[[[1.0, 2, 1], [2, 4, 2], [1, 2, 1]]]]) / 16.0
        filt = filt.repeat(16, 1, 1, 1)
        ref = torch.nn.functional.conv2d(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), filt,
            stride=1, padding=(1, 1), groups=16,
        ).numpy()
        np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 3, 1)),
                                   atol=1e-6)

    def test_gating_and_param_tree_invariance(self):
        # blur has no params: enabling use_blurpool must not change the
        # checkpoint tree; it activates only on strided convs with >=16
        # input channels (reference apply_blurpool, main.py:808-813)
        from revisiting_at_tpu.models.layers import Conv

        x16 = jnp.asarray(np.random.RandomState(1).uniform(0, 1, (1, 8, 8, 16)),
                          jnp.float32)
        x8 = x16[..., :8]
        for xin, strides, expect_blur in (
            (x16, (2, 2), True),   # strided, wide enough
            (x16, (1, 1), False),  # stride 1
            (x8, (2, 2), False),   # <16 channels
        ):
            plain = Conv(features=4, kernel_size=(3, 3), strides=strides)
            blurred = Conv(features=4, kernel_size=(3, 3), strides=strides,
                           use_blurpool=True)
            v = plain.init(jax.random.PRNGKey(0), xin)
            assert jax.tree.structure(v) == jax.tree.structure(
                blurred.init(jax.random.PRNGKey(0), xin)
            )
            changed = bool(np.any(
                np.asarray(plain.apply(v, xin))
                != np.asarray(blurred.apply(v, xin))
            ))
            assert changed == expect_blur, (strides, xin.shape)


class TestCheckImgs:
    def test_norms_and_range(self):
        from revisiting_at_tpu.ops.norms import check_imgs

        x = jnp.zeros((2, 4, 4, 1)) + 0.5
        adv = x.at[0, 0, 0, 0].add(0.25).at[1].add(-0.1)
        mx, lo, hi = check_imgs(adv, x, "Linf")
        assert np.isclose(mx, 0.25) and np.isclose(lo, 0.4) and np.isclose(hi, 0.75)
        mx2, _, _ = check_imgs(adv, x, "L2")
        assert np.isclose(mx2, np.sqrt(16 * 0.1**2), atol=1e-6)
        mx1, _, _ = check_imgs(adv, x, "L1")
        assert np.isclose(mx1, 16 * 0.1, atol=1e-5)
        with pytest.raises(ValueError):
            check_imgs(adv, x, "L0")


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
