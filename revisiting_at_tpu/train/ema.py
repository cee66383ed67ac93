"""Model EMA as a pure PyTree update inside the jitted train step.

Parity with timm's ModelEmaV2(decay=0.9999) used by the reference
(main.py:882-887,996-997) — but on-device, not a host-side CPU copy:
the EMA tree lives in the TrainState and updates fuse into the step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def ema_update(ema: Any, new: Any, decay: float = 0.9999) -> Any:
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema, new
    )


def ema_init(params: Any) -> Any:
    # must COPY: jnp.asarray would alias the param buffers, and a TrainState
    # holding aliased params/ema under donate_argnums means donating the same
    # buffer twice (runtime error on every backend)
    return jax.tree.map(lambda p: jnp.array(p, jnp.float32, copy=True), params)
