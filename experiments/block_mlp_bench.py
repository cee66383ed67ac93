"""Micro-bench: fused block-tail kernel fwd / full-bwd per ConvNeXt-T stage.

Methodology (matches PROFILE.md's dwconv bench): an in-jit lax.scan chain of
K backward calls with the cotangent perturbed per iteration (prevents CSE),
readback-forced timing, real chip. Reports ms/call and the MFU of the
*useful* backward matmul work (4 units: dW1, dW2, dg, du — the h recompute
is flash-style overhead, counted separately as "in-kernel" MFU).

Run: python experiments/block_mlp_bench.py [--stages 0,1,2] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from revisiting_at_tpu.ops.block_mlp import convnext_block_tail

# ConvNeXt-T stage shapes at 224, bs 80 (PROFILE.md's profiled config)
STAGES = {
    0: (80, 56, 56, 96),
    1: (80, 28, 28, 192),
    2: (80, 14, 14, 384),
}

BF16_PEAK_TFS = 197.0  # v5e per-chip


def bench_stage(B, Hs, Ws, C, iters, seed=0):
    rng = np.random.RandomState(seed)
    H4 = 4 * C
    f = jnp.float32
    s = jnp.asarray(rng.randn(B, Hs, Ws, C), jnp.bfloat16)
    r = jnp.asarray(rng.randn(B, Hs, Ws, C), jnp.bfloat16)
    params = dict(
        ln_g=jnp.asarray(rng.uniform(0.5, 1.5, C), f),
        ln_b=jnp.asarray(rng.randn(C) * 0.1, f),
        w1=jnp.asarray(rng.randn(C, H4) * 0.05, f),
        b1=jnp.asarray(rng.randn(H4) * 0.1, f),
        w2=jnp.asarray(rng.randn(H4, C) * 0.05, f),
        b2=jnp.asarray(rng.randn(C) * 0.1, f),
        gamma=jnp.asarray(rng.uniform(0.1, 1.0, C), f),
    )
    dy = jnp.asarray(rng.randn(B, Hs, Ws, C), jnp.bfloat16)

    def tail(s_, r_, p):
        return convnext_block_tail(
            s_, r_, None, p["ln_g"], p["ln_b"], p["w1"], p["b1"],
            p["w2"], p["b2"], p["gamma"],
        )

    @jax.jit
    def fwd_chain(s0, r_, p):
        def body(c, _):
            y = tail(c, r_, p)
            return y * jnp.bfloat16(1e-3), ()
        out, _ = jax.lax.scan(body, s0, None, length=iters)
        return out

    @jax.jit
    def bwd_chain(s0, r_, p, dy0):
        y, vjp = jax.vjp(lambda ss, pp: tail(ss, r_, pp), s0, p)

        def body(c, _):
            ds, dp = vjp(c)
            # fold every cotangent back into the next dy (prevents DCE/CSE)
            mix = sum(jnp.sum(v) for v in jax.tree.leaves(dp)).astype(jnp.bfloat16)
            return ds.astype(jnp.bfloat16) * jnp.bfloat16(1e-3) + mix * 0, ()

        out, _ = jax.lax.scan(body, dy0, None, length=iters)
        return out

    def timeit(fn, *args):
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))  # force readback
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters * 1e3

    ms_fwd = timeit(fwd_chain, s, r, params)
    # bwd_chain includes ONE forward (the vjp trace) outside the scan —
    # amortized over `iters` calls it's <5% and ignored.
    ms_bwd = timeit(bwd_chain, s, r, params, dy)

    M = B * Hs * Ws
    unit = 2.0 * M * C * H4  # one [M,C]x[C,4C] matmul
    useful_bwd = 4 * unit
    inkernel_bwd = 5 * unit  # + h recompute
    res = dict(
        shape=[B, Hs, Ws, C],
        ms_fwd_call=round(ms_fwd, 3),
        ms_bwd_call=round(ms_bwd, 3),
        mfu_fwd=round(2 * unit / (ms_fwd * 1e-3) / 1e12 / BF16_PEAK_TFS, 3),
        mfu_bwd_useful=round(useful_bwd / (ms_bwd * 1e-3) / 1e12 / BF16_PEAK_TFS, 3),
        mfu_bwd_inkernel=round(inkernel_bwd / (ms_bwd * 1e-3) / 1e12 / BF16_PEAK_TFS, 3),
    )
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="0,1,2")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    out = []
    for si in [int(x) for x in args.stages.split(",")]:
        r = bench_stage(*STAGES[si], args.iters)
        r["stage"] = si
        print(json.dumps(r))
        out.append(r)
    # per-AT-step totals over ConvNeXt-T depths (3,3,9) for stages 0-2
    depths = {0: 3, 1: 3, 2: 9}
    tot_bwd = sum(r["ms_bwd_call"] * depths[r["stage"]] for r in out)
    tot_fwd = sum(r["ms_fwd_call"] * depths[r["stage"]] for r in out)
    print(json.dumps({"total_fwd_ms_per_model_call": round(tot_fwd, 2),
                      "total_bwd_ms_per_model_call": round(tot_bwd, 2)}))


if __name__ == "__main__":
    main()
