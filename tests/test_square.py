"""Square attack: official-algorithm parity (eager oracle) + invariants.

The autoattack library is not installed here, so parity evidence is
manufactured as in tests/test_apgd.py: `evals/square_oracle.py` is an
eager NumPy transcription of the official square.py (checkable line by
line against the published algorithm), and these tests assert the jitted
static-shape implementation follows it exactly, random draw for random
draw."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from revisiting_at_tpu.evals.square import (
    _eta_value,
    _tail_table,
    square_attack,
)
from revisiting_at_tpu.evals import square_oracle as oracle
from revisiting_at_tpu.ops import l2_norm


def make_model(seed=0, d=300, nc=7):
    rng = np.random.RandomState(seed)
    w = jnp.asarray((rng.randn(d, nc) * 0.8).astype(np.float32))
    return lambda xa: xa.reshape(xa.shape[0], -1) @ w


class TestEtaPattern:
    @pytest.mark.parametrize("s", [2, 3, 5, 7, 9, 15, 44])
    @pytest.mark.parametrize("transpose", [False, True])
    def test_analytic_matches_official_transcription(self, s, transpose):
        size = s + 4
        tail = _tail_table(size + 2)
        di = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
        dj = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
        analytic = np.asarray(
            _eta_value(di, dj, jnp.asarray(s), tail, jnp.asarray(transpose))
        )
        official = oracle.eta(s, transpose)
        np.testing.assert_allclose(analytic[:s, :s], official, atol=2e-6)
        assert np.abs(analytic[s:, :]).max() == 0.0  # support is the window
        assert np.abs(analytic[:, s:]).max() == 0.0
        np.testing.assert_allclose((analytic**2).sum(), 1.0, atol=1e-5)


class TestOracleParity:
    """Jitted lax.scan vs eager official transcription, same randoms."""

    def _data(self, seed, b=4, h=10, w=10, c=3):
        rng = np.random.RandomState(seed)
        x = rng.uniform(0.25, 0.75, size=(b, h, w, c)).astype(np.float32)
        y = rng.randint(0, 7, size=b).astype(np.int64)
        return x, y

    def test_l2_trajectory(self):
        fn = make_model(seed=1)
        x, y = self._data(seed=2)
        kw = dict(eps=1.5, n_queries=30, rng=jax.random.PRNGKey(7))
        xa, acc = square_attack(fn, jnp.asarray(x), jnp.asarray(y), norm="L2", **kw)
        xo, acco = oracle.square_l2_oracle(fn, x, y, **kw)
        np.testing.assert_allclose(np.asarray(xa), xo, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(acc), acco)

    def test_linf_trajectory(self):
        fn = make_model(seed=5)
        x, y = self._data(seed=6)
        kw = dict(eps=0.05, n_queries=30, rng=jax.random.PRNGKey(13))
        xa, acc = square_attack(fn, jnp.asarray(x), jnp.asarray(y), norm="Linf", **kw)
        xo, acco = oracle.square_linf_oracle(fn, x, y, **kw)
        np.testing.assert_allclose(np.asarray(xa), xo, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(acc), acco)

    def test_l1_trajectory(self):
        fn = make_model(seed=3)
        x, y = self._data(seed=4)
        kw = dict(eps=12.0, n_queries=30, rng=jax.random.PRNGKey(11))
        xa, acc = square_attack(fn, jnp.asarray(x), jnp.asarray(y), norm="L1", **kw)
        xo, acco = oracle.square_l1_oracle(fn, x, y, **kw)
        np.testing.assert_allclose(np.asarray(xa), xo, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(acc), acco)


class TestSquareL2:
    def test_ball_box_and_effectiveness(self):
        fn = make_model(seed=1, d=300)
        rng = np.random.RandomState(2)
        x = rng.uniform(0.2, 0.8, size=(16, 10, 10, 3)).astype(np.float32)
        y = rng.randint(0, 7, size=16).astype(np.int64)
        eps = 1.5
        x_adv, acc = square_attack(
            fn, jnp.asarray(x), jnp.asarray(y), norm="L2", eps=eps,
            n_queries=300, rng=jax.random.PRNGKey(0),
        )
        x_adv = np.asarray(x_adv)
        assert float(l2_norm(jnp.asarray(x_adv - x)).max()) <= eps + 1e-4
        assert x_adv.min() >= 0 and x_adv.max() <= 1
        clean = (np.asarray(fn(jnp.asarray(x))).argmax(-1) == y).mean()
        assert np.asarray(acc).mean() < clean  # broke someone

    def test_init_uses_full_budget(self):
        fn = make_model(seed=3, d=300)
        rng = np.random.RandomState(4)
        x = rng.uniform(0.4, 0.6, size=(4, 10, 10, 3)).astype(np.float32)
        y = rng.randint(0, 7, size=4).astype(np.int64)
        eps = 0.5
        x_adv, _ = square_attack(
            fn, jnp.asarray(x), jnp.asarray(y), norm="L2", eps=eps,
            n_queries=2, rng=jax.random.PRNGKey(1),
        )
        norms = np.asarray(l2_norm(jnp.asarray(np.asarray(x_adv) - x)))
        # init point saturates the ball (up to box clipping)
        assert (norms > 0.8 * eps).all()


class TestSquareL1:
    def test_ball_box_and_effectiveness(self):
        fn = make_model(seed=5, d=300)
        rng = np.random.RandomState(6)
        x = rng.uniform(0.2, 0.8, size=(16, 10, 10, 3)).astype(np.float32)
        # label = clean prediction: clean acc 100%, attack must break someone
        y = np.asarray(fn(jnp.asarray(x))).argmax(-1).astype(np.int64)
        eps = 12.0
        x_adv, acc = square_attack(
            fn, jnp.asarray(x), jnp.asarray(y), norm="L1", eps=eps,
            n_queries=300, rng=jax.random.PRNGKey(0),
        )
        x_adv = np.asarray(x_adv)
        l1 = np.abs(x_adv - x).sum(axis=(1, 2, 3))
        assert float(l1.max()) <= eps + 1e-3
        assert x_adv.min() >= 0 and x_adv.max() <= 1
        clean = (np.asarray(fn(jnp.asarray(x))).argmax(-1) == y).mean()
        assert np.asarray(acc).mean() < clean


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
