"""Unit + golden-parity tests for threat-model math (norms, projections)."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from revisiting_at_tpu.ops import (
    l0_norm,
    l1_norm,
    l1_projection,
    l2_norm,
    l2_project,
    linf_project,
)
from tests.conftest import REFERENCE_DIR, requires_reference


def rand(shape, seed=0, lo=0.0, hi=1.0):
    rng = np.random.RandomState(seed)
    return rng.uniform(lo, hi, size=shape).astype(np.float32)


class TestNorms:
    def test_l1_l2_l0(self):
        x = rand((4, 3, 5, 5), seed=1, lo=-1, hi=1)
        np.testing.assert_allclose(
            np.asarray(l1_norm(jnp.asarray(x))), np.abs(x).reshape(4, -1).sum(-1), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(l2_norm(jnp.asarray(x))),
            np.sqrt((x**2).reshape(4, -1).sum(-1)),
            rtol=1e-5,
        )
        x[0, 0, 0, 0] = 0.0
        np.testing.assert_allclose(
            np.asarray(l0_norm(jnp.asarray(x))), (x.reshape(4, -1) != 0).sum(-1)
        )

    def test_keepdims_shape(self):
        x = jnp.ones((2, 4, 4, 3))
        assert l2_norm(x, keepdims=True).shape == (2, 1, 1, 1)


class TestLinfL2Project:
    def test_linf_inside_ball_and_box(self):
        x = jnp.asarray(rand((8, 6, 6, 3), seed=2))
        xa = x + jnp.asarray(rand((8, 6, 6, 3), seed=3, lo=-0.3, hi=0.3))
        eps = 4.0 / 255.0
        z = linf_project(xa, x, eps)
        assert float(jnp.max(jnp.abs(z - x))) <= eps + 1e-6
        assert float(jnp.min(z)) >= 0.0 and float(jnp.max(z)) <= 1.0

    def test_l2_inside_ball(self):
        x = jnp.asarray(rand((8, 6, 6, 3), seed=4))
        xa = x + jnp.asarray(rand((8, 6, 6, 3), seed=5, lo=-1, hi=1))
        eps = 0.5
        z = l2_project(xa, x, eps)
        assert float(jnp.max(l2_norm(z - x))) <= eps + 1e-4
        assert float(jnp.min(z)) >= 0.0 and float(jnp.max(z)) <= 1.0

    def test_l2_noop_inside(self):
        x = jnp.asarray(rand((4, 4, 4, 3), seed=6, lo=0.3, hi=0.7))
        xa = x + 1e-3
        z = l2_project(xa, x, eps=10.0)
        np.testing.assert_allclose(np.asarray(z), np.asarray(xa), atol=1e-6)


class TestL1Projection:
    """The L1 projection is the numerically hard part (SURVEY.md §7 hard parts)."""

    def _check_feasible(self, x, y, eps):
        delta = l1_projection(jnp.asarray(x), jnp.asarray(y), eps)
        z = x + y + np.asarray(delta)
        assert z.min() >= -1e-5 and z.max() <= 1.0 + 1e-5, "box violated"
        norms = np.abs((y + np.asarray(delta)).reshape(x.shape[0], -1)).sum(-1)
        assert (norms <= eps + 1e-3).all(), f"L1 ball violated: {norms.max()} > {eps}"
        return np.asarray(delta), norms

    def test_feasibility_random(self):
        x = rand((16, 3, 8, 8), seed=7)
        y = rand((16, 3, 8, 8), seed=8, lo=-0.5, hi=0.5)
        self._check_feasible(x, y, eps=12.0)

    def test_tight_when_outside(self):
        x = rand((16, 3, 8, 8), seed=9)
        y = rand((16, 3, 8, 8), seed=10, lo=-0.5, hi=0.5)
        # project where the point is clearly outside the ball
        eps = 5.0
        _, norms = self._check_feasible(x, y, eps)
        inside_box = ((x + y) >= 0).all(axis=(1, 2, 3)) & ((x + y) <= 1).all(axis=(1, 2, 3))
        l1_before = np.abs(y.reshape(16, -1)).sum(-1)
        tight = (l1_before > eps) & inside_box
        # ||y + delta||_1 == eps on rows that genuinely needed shrinking
        np.testing.assert_allclose(norms[tight], eps, rtol=1e-3)

    def test_zero_delta_when_inside(self):
        x = rand((4, 3, 4, 4), seed=11, lo=0.3, hi=0.7)
        y = rand((4, 3, 4, 4), seed=12, lo=-0.002, hi=0.002)
        delta = l1_projection(jnp.asarray(x), jnp.asarray(y), eps1=75.0)
        np.testing.assert_allclose(np.asarray(delta), 0.0, atol=1e-6)

    @requires_reference
    def test_golden_vs_reference(self):
        """Exact parity with the reference sort+bisection implementation."""
        sys.path.insert(0, REFERENCE_DIR)
        import torch
        from autopgd_train_clean import L1_projection as ref_L1_projection

        for seed, eps in [(13, 3.0), (14, 10.0), (15, 40.0)]:
            x = rand((8, 3, 10, 10), seed=seed)
            y = rand((8, 3, 10, 10), seed=seed + 100, lo=-0.6, hi=0.6)
            ours = np.asarray(l1_projection(jnp.asarray(x), jnp.asarray(y), eps))
            ref = ref_L1_projection(torch.from_numpy(x), torch.from_numpy(y), eps).numpy()
            np.testing.assert_allclose(ours, ref, atol=2e-4)


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
