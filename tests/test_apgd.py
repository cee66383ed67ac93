"""APGD golden-parity and invariant tests.

The golden tests run the reference's eager PyTorch `apgd_train` and our
`lax.scan` implementation on an IDENTICAL tiny linear model (same weights,
same inputs) and require the returned iterates to match — this pins down
the momentum, best-tracking, checkpoint/step-halving and projection
semantics exactly (SURVEY.md §4 'golden-value parity tests').
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from revisiting_at_tpu.attacks import apgd_attack, fgsm_train, pgd_attack
from revisiting_at_tpu.ops import l1_norm, l2_norm
from tests.conftest import REFERENCE_DIR, requires_reference

BS, C, H, W_ = 8, 10, 8, 8
NCLS = 7
D = C_IN = None  # silence linters


def make_problem(seed=0):
    rng = np.random.RandomState(seed)
    x = rng.uniform(0.05, 0.95, size=(BS, 3, H, W_)).astype(np.float32)
    y = rng.randint(0, NCLS, size=BS).astype(np.int64)
    w = (rng.randn(3 * H * W_, NCLS) * 0.3).astype(np.float32)
    b = (rng.randn(NCLS) * 0.1).astype(np.float32)
    return x, y, w, b


def jax_logits_fn(w, b):
    wj, bj = jnp.asarray(w), jnp.asarray(b)
    return lambda xa: xa.reshape(xa.shape[0], -1) @ wj + bj


def torch_model(w, b):
    import torch

    lin = torch.nn.Linear(3 * H * W_, NCLS)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w.T))
        lin.bias.copy_(torch.from_numpy(b))
    model = torch.nn.Sequential(torch.nn.Flatten(), lin)
    model.eval()
    return model


class TestApgdInvariants:
    @pytest.mark.parametrize("norm,eps", [("Linf", 0.03), ("L2", 1.0), ("L1", 12.0)])
    def test_ball_and_box(self, norm, eps):
        x, y, w, b = make_problem(1)
        res = apgd_attack(
            jax_logits_fn(w, b), jnp.asarray(x), jnp.asarray(y),
            norm=norm, eps=eps, n_iter=10,
        )
        for out in (res.x_best, res.x_best_adv):
            delta = np.asarray(out) - x
            assert np.asarray(out).min() >= -1e-6 and np.asarray(out).max() <= 1 + 1e-6
            if norm == "Linf":
                assert np.abs(delta).max() <= eps + 1e-6
            elif norm == "L2":
                assert float(l2_norm(jnp.asarray(delta)).max()) <= eps + 1e-4
            else:
                assert float(l1_norm(jnp.asarray(delta)).max()) <= eps + 1e-3

    def test_loss_increases(self):
        x, y, w, b = make_problem(2)
        fn = jax_logits_fn(w, b)
        from revisiting_at_tpu.ops import ce_indiv

        li0 = ce_indiv(fn(jnp.asarray(x)), jnp.asarray(y))
        res = apgd_attack(fn, jnp.asarray(x), jnp.asarray(y), norm="Linf", eps=0.05, n_iter=10)
        assert bool(jnp.all(res.loss_best >= li0 - 1e-6))

    @pytest.mark.parametrize("norm,eps", [("Linf", 0.03), ("L2", 1.0), ("L1", 12.0)])
    def test_random_start_in_ball(self, norm, eps):
        # eval-flavour init: random point inside the ball∩box; for L1 the
        # exact projection makes the init sparse (AutoAttack's L1 init)
        x, y, w, b = make_problem(4)
        res = apgd_attack(
            jax_logits_fn(w, b), jnp.asarray(x), jnp.asarray(y),
            norm=norm, eps=eps, n_iter=3, is_train=False,
            rng=jax.random.PRNGKey(0), random_start=True,
        )
        delta = np.asarray(res.x_best) - x
        assert np.asarray(res.x_best).min() >= -1e-6
        assert np.asarray(res.x_best).max() <= 1 + 1e-6
        if norm == "Linf":
            assert np.abs(delta).max() <= eps + 1e-6
        elif norm == "L2":
            assert float(l2_norm(jnp.asarray(delta)).max()) <= eps + 1e-4
        else:
            assert float(l1_norm(jnp.asarray(delta)).max()) <= eps + 1e-3

    def test_l1_random_start_is_sparse_and_random(self):
        x, y, w, b = make_problem(5)
        from revisiting_at_tpu.ops.norms import l1_projection

        t = jax.random.normal(jax.random.PRNGKey(1), x.shape, jnp.float32)
        x0 = np.asarray(jnp.asarray(x) + t + l1_projection(jnp.asarray(x), t, 12.0))
        delta = x0 - x
        # soft-thresholding leaves most coordinates exactly at zero
        frac_nonzero = (np.abs(delta.reshape(BS, -1)) > 1e-9).mean()
        assert frac_nonzero < 0.5
        assert (np.abs(delta.reshape(BS, -1)).sum(-1) <= 12.0 + 1e-3).all()
        # and it is not the clean point
        assert np.abs(delta).max() > 1e-3

    def test_jits_cleanly(self):
        x, y, w, b = make_problem(3)
        fn = jax_logits_fn(w, b)

        @jax.jit
        def run(xx, yy):
            return apgd_attack(fn, xx, yy, norm="Linf", eps=0.03, n_iter=3).x_best

        out = run(jnp.asarray(x), jnp.asarray(y))
        assert out.shape == x.shape


@requires_reference
class TestApgdGoldenParity:
    def _run_both(self, norm, eps, n_iter, seed=0, loss="ce"):
        sys.path.insert(0, REFERENCE_DIR)
        import torch
        from autopgd_train_clean import apgd_train as ref_apgd

        x, y, w, b = make_problem(seed)
        model = torch_model(w, b)
        xb_t, acc_t, lb_t, xba_t = ref_apgd(
            model, torch.from_numpy(x), torch.from_numpy(y),
            norm=norm, eps=eps, n_iter=n_iter, loss=loss, is_train=True,
        )
        res = apgd_attack(
            jax_logits_fn(w, b), jnp.asarray(x), jnp.asarray(y),
            norm=norm, eps=eps, n_iter=n_iter, loss=loss, is_train=True,
        )
        return (
            (xb_t.detach().numpy(), acc_t.numpy(), lb_t.detach().numpy(), xba_t.detach().numpy()),
            (np.asarray(res.x_best), np.asarray(res.acc), np.asarray(res.loss_best),
             np.asarray(res.x_best_adv)),
        )

    @pytest.mark.parametrize("n_iter", [1, 2, 5, 10])
    def test_linf_parity(self, n_iter):
        (xb_t, acc_t, lb_t, xba_t), (xb_j, acc_j, lb_j, xba_j) = self._run_both(
            "Linf", 0.03, n_iter
        )
        np.testing.assert_allclose(xb_j, xb_t, atol=2e-5)
        np.testing.assert_array_equal(acc_j, acc_t.astype(bool))
        np.testing.assert_allclose(lb_j, lb_t, atol=1e-4)
        np.testing.assert_allclose(xba_j, xba_t, atol=2e-5)

    @pytest.mark.parametrize("n_iter", [2, 10])
    def test_l2_parity(self, n_iter):
        (xb_t, _, lb_t, _), (xb_j, _, lb_j, _) = self._run_both("L2", 1.0, n_iter, seed=4)
        np.testing.assert_allclose(xb_j, xb_t, atol=5e-5)
        np.testing.assert_allclose(lb_j, lb_t, atol=2e-4)

    @pytest.mark.parametrize("n_iter", [2, 10])
    def test_l1_parity(self, n_iter):
        (xb_t, _, lb_t, _), (xb_j, _, lb_j, _) = self._run_both("L1", 12.0, n_iter, seed=5)
        np.testing.assert_allclose(xb_j, xb_t, atol=1e-4)
        np.testing.assert_allclose(lb_j, lb_t, atol=5e-4)

    def test_dlr_loss_parity(self):
        (xb_t, _, lb_t, _), (xb_j, _, lb_j, _) = self._run_both(
            "Linf", 0.03, 5, seed=6, loss="dlr"
        )
        np.testing.assert_allclose(xb_j, xb_t, atol=2e-5)
        np.testing.assert_allclose(lb_j, lb_t, atol=1e-4)

    def test_eval_schedule_parity_100_iter(self):
        """Eval-flavour APGD = 100 iterations: pins the full checkpoint
        cascade (windows 22,19,16,13,10,7,6,... -> checkpoints at
        22,41,57,70,80,87,93,99) that AutoAttack's eval APGD uses — the
        reference apgd_train implements the same schedule (:151-157)."""
        (xb_t, acc_t, lb_t, xba_t), (xb_j, acc_j, lb_j, xba_j) = self._run_both(
            "Linf", 0.03, 100, seed=10
        )
        np.testing.assert_allclose(xb_j, xb_t, atol=5e-5)
        np.testing.assert_array_equal(acc_j, acc_t.astype(bool))
        np.testing.assert_allclose(lb_j, lb_t, atol=2e-4)
        np.testing.assert_allclose(xba_j, xba_t, atol=5e-5)

    def test_eval_l1_topk_parity(self):
        """is_train=False flips the L1 sparsity init to 0.2 (reference :162)."""
        sys.path.insert(0, REFERENCE_DIR)
        import torch
        from autopgd_train_clean import apgd_train as ref_apgd

        x, y, w, b = make_problem(11)
        model = torch_model(w, b)
        xb_t, _, lb_t, _ = ref_apgd(
            model, torch.from_numpy(x), torch.from_numpy(y),
            norm="L1", eps=12.0, n_iter=25, loss="ce", is_train=False,
        )
        res = apgd_attack(
            jax_logits_fn(w, b), jnp.asarray(x), jnp.asarray(y),
            norm="L1", eps=12.0, n_iter=25, loss="ce", is_train=False,
        )
        np.testing.assert_allclose(np.asarray(res.x_best), xb_t.detach().numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.loss_best), lb_t.detach().numpy(), atol=5e-4)

    @pytest.mark.parametrize("n_iter", [5, 100])
    def test_dlr_targeted_parity(self, n_iter):
        """APGD-T's loss (AutoAttack's targeted flavour): bind y_target into
        the reference criterion_dict and compare full iterate trajectories."""
        sys.path.insert(0, REFERENCE_DIR)
        import torch
        import autopgd_train_clean as ref_mod

        x, y, w, b = make_problem(12)
        rng = np.random.RandomState(13)
        # a target class != y per sample (AA uses 2nd..10th most likely)
        y_t = ((y + 1 + rng.randint(0, NCLS - 1, size=BS)) % NCLS).astype(np.int64)
        yt_torch = torch.from_numpy(y_t)
        key = "dlr-targeted-bound"
        ref_mod.criterion_dict[key] = lambda logits, yy: ref_mod.dlr_loss_targeted(
            logits, yy, yt_torch
        )
        try:
            model = torch_model(w, b)
            xb_t, acc_t, lb_t, xba_t = ref_mod.apgd_train(
                model, torch.from_numpy(x), torch.from_numpy(y),
                norm="Linf", eps=0.03, n_iter=n_iter, loss=key,
            )
        finally:
            del ref_mod.criterion_dict[key]
        res = apgd_attack(
            jax_logits_fn(w, b), jnp.asarray(x), jnp.asarray(y),
            norm="Linf", eps=0.03, n_iter=n_iter, loss="dlr-targeted",
            y_target=jnp.asarray(y_t),
        )
        np.testing.assert_allclose(np.asarray(res.x_best), xb_t.detach().numpy(), atol=5e-5)
        np.testing.assert_array_equal(np.asarray(res.acc), acc_t.numpy().astype(bool))
        np.testing.assert_allclose(np.asarray(res.loss_best), lb_t.detach().numpy(), atol=2e-4)
        # x_best_adv ("last flipped point") accumulates f32 op-ordering drift
        # over 100 chaotic iterations; a handful of elements reach ~3e-4
        np.testing.assert_allclose(
            np.asarray(res.x_best_adv), xba_t.detach().numpy(),
            atol=5e-5 if n_iter <= 5 else 5e-4,
        )

    def test_soft_targets_parity(self):
        """Mixup path: y is a soft-target matrix, CE handles it (main.py:965-966)."""
        sys.path.insert(0, REFERENCE_DIR)
        import torch
        from autopgd_train_clean import apgd_train as ref_apgd

        x, y, w, b = make_problem(7)
        rng = np.random.RandomState(8)
        soft = rng.dirichlet(np.ones(NCLS), size=BS).astype(np.float32)
        model = torch_model(w, b)
        xb_t, acc_t, _, _ = ref_apgd(
            model, torch.from_numpy(x), torch.from_numpy(soft),
            norm="Linf", eps=0.03, n_iter=3, loss="ce", mixup=object(),
        )
        res = apgd_attack(
            jax_logits_fn(w, b), jnp.asarray(x), jnp.asarray(soft),
            norm="Linf", eps=0.03, n_iter=3, loss="ce",
        )
        np.testing.assert_allclose(np.asarray(res.x_best), xb_t.detach().numpy(), atol=2e-5)
        np.testing.assert_array_equal(np.asarray(res.acc), acc_t.numpy().astype(bool))


@requires_reference
class TestFgsmGoldenParity:
    def test_no_rs_parity(self):
        sys.path.insert(0, REFERENCE_DIR)
        import types

        import torch

        # the reference module imports robustbench/autoattack at module level
        # but fgsm_train itself doesn't need them — stub to import it
        for mod in ("robustbench", "autoattack"):
            sys.modules.setdefault(mod, types.ModuleType(mod))
        from fgsm_train import fgsm_train as ref_fgsm

        x, y, w, b = make_problem(9)
        model = torch_model(w, b)
        ref = ref_fgsm(
            model, torch.from_numpy(x), torch.from_numpy(y), 0.03,
            alpha=1.25, use_rs=False,
        ).detach().numpy()
        ours = np.asarray(
            fgsm_train(
                jax_logits_fn(w, b), jnp.asarray(x), jnp.asarray(y),
                eps=0.03, alpha=1.25, use_rs=False,
            )
        )
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_no_rs_skip_projection_parity(self):
        # the deterministic path with the two non-default knobs the trainer
        # can bind (fgsm_train.py:93-97): skip_projection leaves the step
        # unprojected/unclamped; alpha scales it
        sys.path.insert(0, REFERENCE_DIR)
        import types

        import torch

        for mod in ("robustbench", "autoattack"):
            sys.modules.setdefault(mod, types.ModuleType(mod))
        from fgsm_train import fgsm_train as ref_fgsm

        x, y, w, b = make_problem(12)
        model = torch_model(w, b)
        ref = ref_fgsm(
            model, torch.from_numpy(x), torch.from_numpy(y), 0.05,
            alpha=2.0, use_rs=False, skip_projection=True,
        ).detach().numpy()
        ours = np.asarray(
            fgsm_train(
                jax_logits_fn(w, b), jnp.asarray(x), jnp.asarray(y),
                eps=0.05, alpha=2.0, use_rs=False, skip_projection=True,
            )
        )
        np.testing.assert_allclose(ours, ref, atol=1e-6)
        # genuinely unprojected: some perturbation must exceed eps
        assert np.abs(ours - x).max() > 0.05

    def test_rs_ball_invariant(self):
        x, y, w, b = make_problem(10)
        out = fgsm_train(
            jax_logits_fn(w, b), jnp.asarray(x), jnp.asarray(y),
            eps=0.03, alpha=1.25, use_rs=True, rng=jax.random.PRNGKey(0),
        )
        delta = np.asarray(out) - x
        assert np.abs(delta).max() <= 0.03 + 1e-6
        assert np.asarray(out).min() >= 0 and np.asarray(out).max() <= 1


class TestPgd:
    def test_ball_invariant_and_loss(self):
        x, y, w, b = make_problem(11)
        fn = jax_logits_fn(w, b)
        out = pgd_attack(
            fn, jnp.asarray(x), jnp.asarray(y), norm="Linf", eps=0.03,
            n_iter=10, rng=jax.random.PRNGKey(1),
        )
        delta = np.asarray(out) - x
        assert np.abs(delta).max() <= 0.03 + 1e-6
        from revisiting_at_tpu.ops import ce_indiv

        li0 = ce_indiv(fn(jnp.asarray(x)), jnp.asarray(y))
        li1 = ce_indiv(fn(out), jnp.asarray(y))
        assert float(jnp.mean(li1 - li0)) > 0


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))


class TestAdversarialModel:
    """API-parity wrapper (reference WrappedModel, main.py:260-301)."""

    def test_perturb_toggle_and_ball(self):
        from revisiting_at_tpu.attacks import AdversarialModel
        from revisiting_at_tpu.models import get_model

        model, _ = get_model("convnext_micro", not_original=True, num_classes=7,
                             dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                               train=False)
        x = jnp.asarray(np.random.RandomState(0).uniform(0.1, 0.9, (4, 32, 32, 3)),
                        jnp.float32)
        y = jnp.arange(4) % 7
        wrapped = AdversarialModel(model, variables, attack="apgd", eps=0.05, n_iter=2)

        clean = wrapped(x)
        wrapped.set_perturb(True)
        adv_logits = wrapped(x, y, train=False)
        assert adv_logits.shape == clean.shape
        z = wrapped.perturb(x, y)
        assert float(jnp.abs(z - x).max()) <= 0.05 + 1e-6
        assert float(z.min()) >= 0 and float(z.max()) <= 1
        wrapped.set_perturb(False)
        np.testing.assert_allclose(np.asarray(wrapped(x)), np.asarray(clean))
