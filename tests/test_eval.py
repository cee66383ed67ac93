"""AutoAttack evaluator tests: worklist semantics, invariants, and
effectiveness on a weak model (robust acc must drop vs clean)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from revisiting_at_tpu.evals import AutoAttack, AutoAttackConfig, square_attack


def make_model(seed=0, d=48, nc=7):
    rng = np.random.RandomState(seed)
    w = (rng.randn(d, nc) * 0.8).astype(np.float32)
    b = np.zeros(nc, np.float32)
    wj, bj = jnp.asarray(w), jnp.asarray(b)

    def fn(xa):
        return xa.reshape(xa.shape[0], -1) @ wj + bj

    return fn


def make_data(n=32, hw=4, nc=7, seed=1):
    rng = np.random.RandomState(seed)
    x = rng.uniform(0.1, 0.9, size=(n, hw, hw, 3)).astype(np.float32)
    y = rng.randint(0, nc, size=n).astype(np.int64)
    return x, y


class TestAutoAttackShort:
    def test_short_mode_breaks_weak_model(self):
        fn = make_model()
        x, y = make_data()
        cfg = AutoAttackConfig(
            norm="Linf", eps=0.1, attacks_to_run=("apgd-ce", "apgd-t"),
            n_iter=20, n_target_classes=3, batch_size=16, verbose=False,
        )
        aa = AutoAttack(fn, cfg, logger=None)
        clean = aa.clean_accuracy(x, y).mean()
        x_adv, robust = aa.run_standard_evaluation(x, y)
        assert robust.mean() < clean
        # ball + box invariants
        assert np.abs(x_adv - x).max() <= 0.1 + 1e-5
        assert x_adv.min() >= 0 and x_adv.max() <= 1
        # flipped points really are misclassified; robust points unchanged
        final = aa.clean_accuracy(x_adv, y)
        np.testing.assert_array_equal(final, robust)
        np.testing.assert_allclose(x_adv[robust], x[robust])

    def test_uneven_last_batch_padding(self):
        fn = make_model(seed=2)
        x, y = make_data(n=19)
        cfg = AutoAttackConfig(
            norm="Linf", eps=0.1, attacks_to_run=("apgd-ce",),
            n_iter=10, batch_size=8, verbose=False,
        )
        aa = AutoAttack(fn, cfg, logger=None)
        x_adv, robust = aa.run_standard_evaluation(x, y)
        assert len(x_adv) == 19 and len(robust) == 19


class TestSquare:
    def test_square_reduces_margin_and_respects_ball(self):
        fn = make_model(seed=3)
        x, y = make_data(n=16, seed=4)
        x_adv, acc = square_attack(
            fn, jnp.asarray(x), jnp.asarray(y), eps=0.1, n_queries=300,
            rng=jax.random.PRNGKey(0),
        )
        x_adv = np.asarray(x_adv)
        assert np.abs(x_adv - x).max() <= 0.1 + 1e-5
        assert x_adv.min() >= 0 and x_adv.max() <= 1
        # weak linear model + generous eps: square should break some points
        clean_correct = (np.asarray(fn(jnp.asarray(x))).argmax(-1) == y).mean()
        assert np.asarray(acc).mean() < clean_correct

    def test_square_in_autoattack_chain(self):
        fn = make_model(seed=5)
        x, y = make_data(n=16, seed=6)
        cfg = AutoAttackConfig(
            norm="Linf", eps=0.08, attacks_to_run=("apgd-ce", "square"),
            n_iter=10, square_n_queries=200, batch_size=16, verbose=False,
        )
        aa = AutoAttack(fn, cfg, logger=None)
        x_adv, robust = aa.run_standard_evaluation(x, y)
        assert np.abs(x_adv - x).max() <= 0.08 + 1e-5


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
