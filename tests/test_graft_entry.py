"""Driver-contract guard for __graft_entry__.py.

The round driver compile-checks entry() single-chip and runs
dryrun_multichip(8) on a virtual CPU mesh. Neither was covered by the test
suite, so an import error or trace break in the contract file would first
surface in the driver's round-end artifacts (MULTICHIP_r*.json), too late
to fix. This test keeps the cheap half (entry) green: build, trace
abstractly, and check the output contract. dryrun_multichip is exercised
by the driver itself (minutes of CPU work — deliberately not duplicated
here); we only assert its signature survives refactors.
"""

import inspect

import jax
import jax.numpy as jnp

import __graft_entry__ as ge


def test_entry_returns_jittable_fn_and_args():
    fn, args = ge.entry()
    # abstract trace only — no compile of the full forward
    out = jax.eval_shape(fn, *args)
    assert out.shape == (args[1].shape[0], 1000)
    assert out.dtype in (jnp.bfloat16, jnp.float32)
    # example batch is the attack's domain: [0,1] pixels, NHWC
    assert args[1].shape[1:] == (224, 224, 3)


def test_dryrun_multichip_signature():
    sig = inspect.signature(ge.dryrun_multichip)
    assert list(sig.parameters) == ["n_devices"]
