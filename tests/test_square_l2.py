"""L2 Square attack: ball/box invariants and effectiveness on a weak model."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from revisiting_at_tpu.evals.square import square_attack
from revisiting_at_tpu.ops import l2_norm


def make_model(seed=0, d=48, nc=7):
    rng = np.random.RandomState(seed)
    w = jnp.asarray((rng.randn(d, nc) * 0.8).astype(np.float32))
    return lambda xa: xa.reshape(xa.shape[0], -1) @ w


class TestSquareL2:
    def test_ball_box_and_effectiveness(self):
        fn = make_model(seed=1)
        rng = np.random.RandomState(2)
        x = rng.uniform(0.2, 0.8, size=(16, 4, 4, 3)).astype(np.float32)
        y = rng.randint(0, 7, size=16).astype(np.int64)
        eps = 1.0
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


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
