"""Unit + golden-parity tests for attack/training losses."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from revisiting_at_tpu.ops import (
    ce_indiv,
    dlr_loss,
    dlr_loss_targeted,
    is_correct,
    smoothed_ce,
    soft_target_ce,
)
from tests.conftest import REFERENCE_DIR, requires_reference


def logits_and_labels(bs=16, nc=10, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(bs, nc).astype(np.float32) * 3
    y = rng.randint(0, nc, size=bs).astype(np.int32)
    return logits, y


class TestCE:
    def test_hard_labels_matches_manual(self):
        logits, y = logits_and_labels()
        out = np.asarray(ce_indiv(jnp.asarray(logits), jnp.asarray(y)))
        z = logits - logits.max(-1, keepdims=True)
        logp = z - np.log(np.exp(z).sum(-1, keepdims=True))
        np.testing.assert_allclose(out, -logp[np.arange(16), y], rtol=1e-4)

    def test_soft_labels(self):
        logits, y = logits_and_labels(seed=1)
        onehot = np.eye(10, dtype=np.float32)[y]
        hard = np.asarray(ce_indiv(jnp.asarray(logits), jnp.asarray(y)))
        soft = np.asarray(ce_indiv(jnp.asarray(logits), jnp.asarray(onehot)))
        np.testing.assert_allclose(hard, soft, rtol=1e-5)

    def test_smoothed_ce_zero_smoothing_equals_mean_ce(self):
        logits, y = logits_and_labels(seed=2)
        a = float(smoothed_ce(jnp.asarray(logits), jnp.asarray(y), 0.0, 10))
        b = float(np.asarray(ce_indiv(jnp.asarray(logits), jnp.asarray(y))).mean())
        np.testing.assert_allclose(a, b, rtol=1e-5)


class TestDLR:
    def test_correct_prediction_negative(self):
        # if the true class is the max logit, dlr < 0 (margin to runner-up)
        logits = np.array([[5.0, 1.0, 0.5, 0.2]], dtype=np.float32)
        y = np.array([0], dtype=np.int32)
        val = float(dlr_loss(jnp.asarray(logits), jnp.asarray(y))[0])
        expected = -(5.0 - 1.0) / (5.0 - 0.5 + 1e-12)
        np.testing.assert_allclose(val, expected, rtol=1e-5)

    def test_wrong_prediction_positive(self):
        logits = np.array([[1.0, 5.0, 0.5, 0.2]], dtype=np.float32)
        y = np.array([0], dtype=np.int32)
        val = float(dlr_loss(jnp.asarray(logits), jnp.asarray(y))[0])
        expected = -(1.0 - 5.0) / (5.0 - 0.5 + 1e-12)
        np.testing.assert_allclose(val, expected, rtol=1e-5)

    @requires_reference
    def test_golden_vs_reference(self):
        sys.path.insert(0, REFERENCE_DIR)
        import torch
        from autopgd_train_clean import dlr_loss as ref_dlr
        from autopgd_train_clean import dlr_loss_targeted as ref_dlr_t
        from autopgd_train_clean import softloss as ref_softloss

        logits, y = logits_and_labels(bs=32, nc=17, seed=3)
        yt = (y + 3) % 17
        ours = np.asarray(dlr_loss(jnp.asarray(logits), jnp.asarray(y)))
        ref = ref_dlr(torch.from_numpy(logits), torch.from_numpy(y).long()).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4)

        ours_t = np.asarray(
            dlr_loss_targeted(jnp.asarray(logits), jnp.asarray(y), jnp.asarray(yt))
        )
        ref_t = ref_dlr_t(
            torch.from_numpy(logits), torch.from_numpy(y).long(), torch.from_numpy(yt).long()
        ).numpy()
        np.testing.assert_allclose(ours_t, ref_t, rtol=1e-4)

        onehot = np.eye(17, dtype=np.float32)[y]
        ours_s = float(soft_target_ce(jnp.asarray(logits), jnp.asarray(onehot)))
        ref_s = float(ref_softloss(torch.from_numpy(logits), torch.from_numpy(onehot)))
        np.testing.assert_allclose(ours_s, ref_s, rtol=1e-5)


class TestIsCorrect:
    def test_hard_and_soft(self):
        logits, y = logits_and_labels(seed=4)
        onehot = np.eye(10, dtype=np.float32)[y]
        a = np.asarray(is_correct(jnp.asarray(logits), jnp.asarray(y)))
        b = np.asarray(is_correct(jnp.asarray(logits), jnp.asarray(onehot)))
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, logits.argmax(-1) == y)


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
