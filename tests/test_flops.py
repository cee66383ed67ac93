"""FLOP accounting (utils/flops.py) — the TPU replacement for the
reference's fvcore/ptflops tables (main.py:846-854) used to verify
architecture surgery. Checks the XLA cost-analysis plumbing returns
sane, resolution-scaling numbers."""

import jax
import jax.numpy as jnp
import pytest

from revisiting_at_tpu.models import get_model
from revisiting_at_tpu.utils.flops import forward_flops, param_count, sizeof_fmt


@pytest.fixture(scope="module")
def micro():
    model, _ = get_model("convnext_micro", not_original=True, num_classes=10,
                         dtype=jnp.float32)
    variables = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, 32, 32, 3)), train=False)
    )(jax.random.PRNGKey(0))
    return model, variables


def test_forward_flops_sane(micro):
    model, variables = micro
    f32 = forward_flops(model, variables, input_shape=(1, 32, 32, 3))
    n_params = param_count(variables["params"])
    # every param participates in >=1 multiply-add
    assert f32 > 2 * n_params > 0

    # conv-net FLOPs scale ~quadratically with resolution (stem convs and
    # dwconvs exactly 4x; the head is constant) — catches cost-analysis
    # returning something unrelated to the traced program
    f64 = forward_flops(model, variables, input_shape=(1, 64, 64, 3))
    assert 3.0 < f64 / f32 < 4.5


def test_flops_batch_scaling(micro):
    model, variables = micro
    f1 = forward_flops(model, variables, input_shape=(1, 32, 32, 3))
    f4 = forward_flops(model, variables, input_shape=(4, 32, 32, 3))
    assert 3.5 < f4 / f1 < 4.5


def test_sizeof_fmt():
    assert sizeof_fmt(1.5e9) == "1.500GFlops"
    assert sizeof_fmt(123.0) == "123.000Flops"
