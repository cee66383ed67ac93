"""Chunked-dispatch parity: FAB/Square split across bounded device
programs must be bit-identical to the single-program run.

Why this exists: at the biggest eval shapes (ConvNeXt-L / ViT-B @320) one
device program holding all 900 FAB or 5000 Square model evaluations runs
for many minutes and gets the tunnel's TPU worker killed ("worker crashed
or restarted", queue13). The driver therefore dispatches carry-resumable
chunks (evals/autoattack.py cfg.fab_iter_chunk / cfg.square_query_chunk).
Draws are keyed on the absolute iteration index and the tail is masked
with lax.cond, so chunking must not change a single accepted iterate.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from revisiting_at_tpu.evals import AutoAttack, AutoAttackConfig
from revisiting_at_tpu.evals.fab import (
    fab_attack_single_target,
    fab_single_chunk,
    fab_single_init,
)
from revisiting_at_tpu.evals.square import (
    square_attack,
    square_attack_chunk,
    square_attack_finish,
    square_attack_init,
)


def make_model(seed=0, d=48, nc=7):
    rng = np.random.RandomState(seed)
    w = jnp.asarray((rng.randn(d, nc) * 0.8).astype(np.float32))

    def fn(xa):
        return xa.reshape(xa.shape[0], -1) @ w

    return fn


def make_data(n=12, hw=4, nc=7, seed=1):
    rng = np.random.RandomState(seed)
    x = rng.uniform(0.1, 0.9, size=(n, hw, hw, 3)).astype(np.float32)
    y = rng.randint(0, nc, size=n).astype(np.int64)
    return jnp.asarray(x), jnp.asarray(y)


EPS = {"Linf": 0.06, "L2": 0.8, "L1": 6.0}


class TestSquareChunked:
    @pytest.mark.parametrize("norm", ["Linf", "L2", "L1"])
    def test_chunked_equals_single_program(self, norm):
        fn = make_model()
        x, y = make_data()
        k = jax.random.PRNGKey(7)
        n_queries = 30
        eps = EPS[norm]

        ref_x, ref_acc = square_attack(
            fn, x, y, norm=norm, eps=eps, n_queries=n_queries, rng=k
        )

        # chunk=7 over 29 iterations: 5 dispatches, last one masked (29=4*7+1)
        n = n_queries - 1
        chunk = 7
        carry = square_attack_init(fn, x, y, norm=norm, eps=eps, rng=k)
        it0 = 0
        while it0 < n:
            carry = square_attack_chunk(
                fn, x, y, carry, jnp.int32(it0), chunk, jnp.int32(n),
                norm=norm, eps=eps, rng=k,
            )
            it0 += chunk
        got_x, got_acc = square_attack_finish(carry)

        np.testing.assert_array_equal(np.asarray(ref_acc), np.asarray(got_acc))
        np.testing.assert_array_equal(np.asarray(ref_x), np.asarray(got_x))


class TestFabChunked:
    @pytest.mark.parametrize("norm", ["Linf", "L2", "L1"])
    def test_chunked_equals_single_program(self, norm):
        fn = make_model(seed=2)
        x, y = make_data(seed=3)
        yt = (y + 1) % 7
        n_iter = 20

        ref_x, ref_res = fab_attack_single_target(
            fn, x, y, yt, norm=norm, n_iter=n_iter
        )

        # chunk=7 with n_valid masking: dispatches of 7, 7, 6 real iters
        chunk = 7
        carry = fab_single_init(x)
        done = 0
        while done < n_iter:
            nv = min(chunk, n_iter - done)
            carry = fab_single_chunk(
                fn, x, y, yt, carry, chunk, jnp.int32(nv), norm=norm
            )
            done += nv
        _, got_x, got_res = carry

        np.testing.assert_allclose(
            np.asarray(ref_res), np.asarray(got_res), rtol=0, atol=0
        )
        np.testing.assert_array_equal(np.asarray(ref_x), np.asarray(got_x))


class TestAutoAttackChunked:
    def test_driver_chunk_size_is_invisible(self):
        """End-to-end: tiny chunk sizes (many dispatches) and huge chunk
        sizes (one dispatch per attack stage) give the same robust set and
        the same adversarial points through the full fab-t + square
        waterfall."""
        fn = make_model(seed=4)
        x, y = make_data(n=16, seed=5)
        x, y = np.asarray(x), np.asarray(y)
        base = dict(
            norm="Linf", eps=0.1, attacks_to_run=("fab-t", "square"),
            n_iter=8, n_target_classes=2, square_n_queries=12,
            batch_size=8, verbose=False,
        )
        adv_small, rob_small = AutoAttack(
            fn, AutoAttackConfig(**base, fab_iter_chunk=3, square_query_chunk=5),
            logger=None,
        ).run_standard_evaluation(x, y)
        adv_big, rob_big = AutoAttack(
            fn, AutoAttackConfig(**base, fab_iter_chunk=10_000,
                                 square_query_chunk=10_000),
            logger=None,
        ).run_standard_evaluation(x, y)
        np.testing.assert_array_equal(rob_small, rob_big)
        np.testing.assert_array_equal(adv_small, adv_big)
        # the attacks must actually do something on this weak model
        assert rob_small.mean() < 1.0
