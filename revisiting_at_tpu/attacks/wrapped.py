"""AdversarialModel — API-parity sugar for the reference's WrappedModel.

The reference wraps the network so `forward(x, y)` first generates
adversarial examples, then does the training forward on them, toggled via
`set_perturb(bool)` (main.py:260-301). In this framework that fusion lives
inside the jitted train step (train/train_step.py), which is what training
uses; this wrapper exists for users who ported code against the reference's
object API (e.g. custom loops calling `model(x, y)`).

Functional equivalent:
    wrapped = AdversarialModel(model, variables, attack="apgd", eps=...)
    wrapped.set_perturb(True)
    logits = wrapped(x, y)        # attack (eval-mode) + forward (train-mode)
    wrapped.set_perturb(False)
    logits = wrapped(x)           # clean forward
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .apgd import apgd_train
from .fgsm import fgsm_train


class AdversarialModel:
    def __init__(
        self,
        model,
        variables: Any,
        *,
        attack: str = "apgd",
        norm: str = "Linf",
        eps: float = 4.0 / 255.0,
        n_iter: int = 2,
        alpha: float = 1.25,
        noise_level: float = 1.0,
        skip_projection: bool = False,
        seed: int = 0,
    ):
        self.model = model
        self.variables = variables
        self.attack = attack
        self.norm = norm
        self.eps = eps
        self.n_iter = n_iter
        self.alpha = alpha
        self.noise_level = noise_level
        self.skip_projection = skip_projection
        self.perturb_input = False
        self._rng = jax.random.PRNGKey(seed)
        self._calls = 0

    def set_perturb(self, mode: bool) -> None:
        self.perturb_input = bool(mode)

    def perturb(self, x: jax.Array, y: jax.Array) -> jax.Array:
        """Generate adversarial examples with the model in eval mode
        (reference main.py:279: `base_model.eval()` during the attack)."""

        def eval_logits(xa):
            return self.model.apply(self.variables, xa, train=False)

        if self.attack == "apgd":
            return jax.lax.stop_gradient(
                apgd_train(
                    eval_logits, x, y, norm=self.norm, eps=self.eps,
                    n_iter=self.n_iter,
                ).x_best
            )
        if self.attack == "fgsm":
            self._calls += 1
            rng = jax.random.fold_in(self._rng, self._calls)
            return jax.lax.stop_gradient(
                fgsm_train(
                    eval_logits, x, y, eps=self.eps, rng=rng, alpha=self.alpha,
                    use_rs=True, noise_level=self.noise_level,
                    skip_projection=self.skip_projection,
                )
            )
        raise ValueError(f"unknown attack {self.attack!r}")

    def __call__(self, x: jax.Array, y: jax.Array | None = None, *, train: bool = True,
                 rngs: dict | None = None) -> jax.Array:
        if self.perturb_input:
            assert y is not None, "perturb mode needs labels (main.py:275)"
            z = self.perturb(x, y)
            return self.model.apply(self.variables, z, train=train, rngs=rngs or {})
        return self.model.apply(self.variables, x, train=False)
