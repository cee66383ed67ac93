"""Single-step FGSM adversarial training attack (RS-FGSM style).

Semantic parity with the reference `fgsm_train`
(/root/reference/fgsm_train.py:72-98): optional random init in
±eps·noise_level, one forward + one input-gradient, step alpha·eps·sign(g),
optional skip of projection/clamp. The trainer binds use_rs=True,
alpha=1.25-style settings via config (reference main.py:837-842).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.losses import make_criterion

Array = jax.Array


def fgsm_train(
    logits_fn: Callable[[Array], Array],
    x: Array,
    y: Array,
    *,
    eps: float,
    rng: Array | None = None,
    loss: str = "ce",
    alpha: float = 1.25,
    use_rs: bool = False,
    noise_level: float = 1.0,
    skip_projection: bool = False,
) -> Array:
    x = x.astype(jnp.float32)
    if use_rs:
        assert rng is not None, "use_rs needs an rng"
        t = jax.random.uniform(rng, x.shape, jnp.float32)
        x_adv = x + (2.0 * t - 1.0) * eps * noise_level
        if not skip_projection:
            x_adv = jnp.clip(x_adv, 0.0, 1.0)
    else:
        x_adv = x

    criterion = make_criterion(loss)

    def f(xa):
        return jnp.sum(criterion(logits_fn(xa), y))

    grad = jax.grad(f)(x_adv)

    x_adv = x_adv + alpha * eps * jnp.sign(grad)
    if not skip_projection:
        x_adv = x + jnp.clip(x_adv - x, -eps, eps)
        x_adv = jnp.clip(x_adv, 0.0, 1.0)
    return x_adv
