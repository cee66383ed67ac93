"""FLOP accounting via XLA cost analysis.

The TPU equivalent of the reference's fvcore/ptflops FLOP tables printed at
model build (main.py:846-854, AA_eval.py:172-177) — used to verify the
architecture surgery produced the intended network.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def forward_flops(model, variables, input_shape=(1, 224, 224, 3)) -> float:
    """FLOPs of one eval-mode forward pass, from XLA's cost analysis."""
    x = jnp.zeros(input_shape, jnp.float32)
    lowered = jax.jit(lambda v, xx: model.apply(v, xx, train=False)).lower(variables, x)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0]
    return float(cost.get("flops", -1.0))


def sizeof_fmt(num: float, suffix: str = "Flops") -> str:
    for unit in ["", "Ki", "Mi", "G", "T"]:
        if abs(num) < 1000.0:
            return f"{num:3.3f}{unit}{suffix}"
        num /= 1000.0
    return f"{num:.1f}P{suffix}"


def param_count(params) -> int:
    import numpy as np

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
