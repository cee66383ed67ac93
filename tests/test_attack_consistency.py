"""Cross-attack consistency suite (VERDICT r2 item 3).

With the official autoattack library unavailable here, these tests
manufacture correctness evidence from the attacks' mathematical contracts
instead of a library oracle:

- robust accuracy must be non-increasing as the ε-ball grows (per-point
  for the deterministic attacks, with one-point slack for the randomized
  Square at a fixed query budget);
- FAB-T is a *minimum-norm* attack: its reported adversarial distances
  must predict APGD's success/failure at a fixed ε (points whose minimal
  adversarial perturbation is well inside the ball fall to APGD; points
  well outside survive);
- Square's success-over-queries curve must have the published shape:
  front-loaded successes, then a plateau (Andriushchenko et al. 2020 §5).

Complements tests/test_square.py's exact trajectory parity vs the eager
official transcription. Reference context: AA_eval.py:226-239.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from revisiting_at_tpu.attacks.apgd import apgd_attack
from revisiting_at_tpu.evals.fab import fab_attack_targeted
from revisiting_at_tpu.evals.square import square_attack


def make_mlp(seed=0, d=108, hid=48, nc=7):
    """Small tanh MLP — nonlinear so FAB's linearization is non-trivial."""
    rng = np.random.RandomState(seed)
    w1 = jnp.asarray((rng.randn(d, hid) * 0.5).astype(np.float32))
    w2 = jnp.asarray((rng.randn(hid, nc) * 0.8).astype(np.float32))

    def fn(xa):
        h = jnp.tanh(xa.reshape(xa.shape[0], -1) @ w1)
        return h @ w2

    return fn


def make_data(fn, seed, b=32, h=6, w=6, c=3):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.uniform(0.2, 0.8, size=(b, h, w, c)).astype(np.float32))
    y = jnp.argmax(fn(x), -1)  # clean acc 100%
    return x, y


def topk_targets(fn, x, y, k=3):
    z = np.array(fn(x))
    z[np.arange(len(np.asarray(y))), np.asarray(y)] = -np.inf
    order = np.argsort(-z, axis=1)[:, :k]
    return jnp.asarray(order)


class TestEpsMonotonicity:
    EPS = [0.02, 0.05, 0.1, 0.2]

    def _robust(self, attack_fn):
        accs = []
        for eps in self.EPS:
            acc = attack_fn(eps)
            accs.append(np.asarray(acc))
        return accs

    def test_apgd_ce_pointwise(self):
        fn = make_mlp(seed=1)
        x, y = make_data(fn, seed=2)
        accs = self._robust(
            lambda eps: apgd_attack(
                fn, x, y, norm="Linf", eps=eps, n_iter=20, loss="ce",
                is_train=False, rng=jax.random.PRNGKey(0),
            ).acc
        )
        for lo, hi in zip(accs[1:], accs[:-1]):
            # deterministic attack from x: per-point dominance in a larger ball
            assert not np.any(lo & ~hi), "point robust at larger eps but broken at smaller"

    def test_fab_t_aggregate(self):
        fn = make_mlp(seed=3)
        x, y = make_data(fn, seed=4)
        yt = topk_targets(fn, x, y, k=3)
        accs = self._robust(
            lambda eps: ~fab_attack_targeted(
                fn, x, y, yt, norm="Linf", eps=eps, n_iter=20,
                rng=jax.random.PRNGKey(0),
            )[1]
        )
        means = [a.mean() for a in accs]
        for m2, m1 in zip(means[1:], means[:-1]):
            assert m2 <= m1 + 1e-9

    def test_square_aggregate(self):
        fn = make_mlp(seed=5)
        x, y = make_data(fn, seed=6)
        accs = self._robust(
            lambda eps: square_attack(
                fn, x, y, norm="Linf", eps=eps, n_queries=200,
                rng=jax.random.PRNGKey(0),
            )[1]
        )
        means = [a.mean() for a in accs]
        b = len(np.asarray(y))
        for m2, m1 in zip(means[1:], means[:-1]):
            # randomized search at fixed budget: allow one-point slack
            assert m2 <= m1 + 1.0 / b + 1e-9


class TestFabApgdCrossover:
    def test_min_norm_distance_predicts_apgd_success(self):
        fn = make_mlp(seed=7)
        x, y = make_data(fn, seed=8, b=48)
        yt = topk_targets(fn, x, y, k=3)

        # FAB with a huge ball => unconstrained minimum-norm distances
        adv, success = fab_attack_targeted(
            fn, x, y, yt, norm="Linf", eps=10.0, n_iter=50,
            rng=jax.random.PRNGKey(1),
        )
        d = np.asarray(
            jnp.max(jnp.abs(adv - x).reshape(x.shape[0], -1), axis=1)
        )
        success = np.asarray(success)
        assert success.mean() > 0.8  # FAB should break nearly all with eps=10

        eps_star = float(np.median(d[success]))
        res = apgd_attack(
            fn, x, y, norm="Linf", eps=eps_star, n_iter=50, loss="ce",
            is_train=False, rng=jax.random.PRNGKey(2),
        )
        broken = ~np.asarray(res.acc)

        # points whose minimal distance is well inside the ball must fall;
        # points well outside must survive (0.7/1.5 margins absorb the
        # upper-bound nature of FAB's distance and APGD's suboptimality)
        easy = success & (d < 0.7 * eps_star)
        hard = success & (d > 1.5 * eps_star)
        if easy.sum() >= 4:
            assert broken[easy].mean() >= 0.75, (d[easy], broken[easy])
        if hard.sum() >= 4:
            assert broken[hard].mean() <= 0.34, (d[hard], broken[hard])


class TestSquareQueryEfficiency:
    @pytest.mark.parametrize("norm,eps", [("Linf", 0.15), ("L2", 1.0)])
    def test_success_curve_shape(self, norm, eps):
        """Success counts must be front-loaded: the first half of the query
        budget yields the majority of total successes (the published curves
        plateau well before the full budget)."""
        fn = make_mlp(seed=9)
        x, y = make_data(fn, seed=10, b=48)
        full_q = 1000
        _, acc_half = square_attack(
            fn, x, y, norm=norm, eps=eps, n_queries=full_q // 2,
            rng=jax.random.PRNGKey(3),
        )
        _, acc_full = square_attack(
            fn, x, y, norm=norm, eps=eps, n_queries=full_q,
            rng=jax.random.PRNGKey(3),
        )
        broke_half = float((~np.asarray(acc_half)).mean())
        broke_full = float((~np.asarray(acc_full)).mean())
        assert broke_full > 0.2  # attack works at all
        assert broke_half >= 0.6 * broke_full, (broke_half, broke_full)


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
