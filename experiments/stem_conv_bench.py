"""Stem stride-2 conv micro-bench: XLA direct vs space-to-depth stride-1.

Motivation (PROFILE.md / opstats_vit_s.json): the ConvStem's stride-2 3x3
convs run at 15-25 bf16 TF/s under XLA's direct lowering — 4-6% MFU, at
neither roofline — and cost 24.4 ms (22%) of the ViT-S AT step and
12.3 ms (10%) of the ConvNeXt-T step. ops/stem_conv.py reformulates them
as stride-1 2x2 convs on a 2x2-phase-packed image (1.78x the FLOPs, but
every direction becomes stride-1/matmul-shaped).

Shapes: every distinct stride-2 stem conv in the zoo at bs 80 @224.
Modes per shape: fwd, fwd+dx (the attack closure), fwd+dx+dw (train).
Timing: in-jit chained scan (defeats CSE), forced readback (CLAUDE.md).

  python experiments/stem_conv_bench.py            # all shapes
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B = 80
REPS = 20

# (name, H_in, Cin, Cout): stride-2 3x3 pad-1 convs in the stems
# (models/stems.py; ViT ConvStem/ConvStem2 trunk = conv0..3, ConvNeXt
# ConvStem1 = conv0..1, ConvStem3-B/L = conv0..1 at siz 64/96)
SHAPES = [
    ("vit_conv0", 224, 3, 48),
    ("vit_conv1", 112, 48, 96),
    ("vit_conv2", 56, 96, 192),
    ("vit_conv3", 28, 192, 384),
    ("cnb_conv1", 112, 64, 96),     # ConvStem3 siz=64 (ConvNeXt-B)
    ("cnl_conv1", 112, 96, 144),    # ConvStem3 siz=96 (ConvNeXt-L)
]


def direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def timed(loop, *args):
    out = loop(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # readback: b_u_r lies on the tunnel
    t0 = time.perf_counter()
    out = loop(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / REPS * 1e3


def bench_fn(fn, x, w, mode):
    """ms per iteration of fn under `mode` ('fwd'|'dx'|'dxdw').
    The chained carry is the INPUT (same shape across iterations): outputs
    are reduced to a scalar and folded into the carry to serialize."""

    @jax.jit
    def loop(x, w):
        def body(c, _):
            if mode == "fwd":
                y = fn(c, w)
                s = jnp.sum(y.astype(jnp.float32))
            elif mode == "dx":
                y, vjp = jax.vjp(lambda xx: fn(xx, w), c)
                (dx,) = vjp(y)
                s = jnp.sum(dx.astype(jnp.float32))
            else:
                y, vjp = jax.vjp(fn, c, w)
                dx, dw = vjp(y)
                s = jnp.sum(dx.astype(jnp.float32)) + jnp.sum(dw.astype(jnp.float32))
            return c * 0.999 + (s * 1e-20).astype(c.dtype), ()

        out, _ = jax.lax.scan(body, x, None, length=REPS)
        return out

    return timed(loop, x, w)


def main() -> None:
    from revisiting_at_tpu.ops.stem_conv import conv3x3s2_s2d
    from revisiting_at_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    results = []
    for name, H, Ci, Co in SHAPES:
        x = jnp.asarray(rng.randn(B, H, H, Ci), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, Ci, Co) * (Ci * 9) ** -0.5, jnp.bfloat16)
        # parity first (tunnel-cheap shapes share the compile)
        y0 = direct(x[:2].astype(jnp.float32), w.astype(jnp.float32))
        y1 = conv3x3s2_s2d(x[:2].astype(jnp.float32), w.astype(jnp.float32))
        err = float(jnp.max(jnp.abs(y0 - y1)))
        row = {"shape": name, "H": H, "Ci": Ci, "Co": Co, "bs": B,
               "parity_err_f32": err}
        gflop = 2 * B * (H // 2) ** 2 * Co * 9 * Ci / 1e9
        for mode in ("fwd", "dx", "dxdw"):
            t_d = bench_fn(direct, x, w, mode)
            t_s = bench_fn(conv3x3s2_s2d, x, w, mode)
            row[f"{mode}_direct_ms"] = round(t_d, 3)
            row[f"{mode}_s2d_ms"] = round(t_s, 3)
            row[f"{mode}_speedup"] = round(t_d / t_s, 2)
            eq = {"fwd": 1, "dx": 2, "dxdw": 3}[mode]
            row[f"{mode}_direct_tfs"] = round(gflop * eq / t_d, 1)
            row[f"{mode}_s2d_tfs"] = round(gflop * eq / t_s, 1)
        print(json.dumps(row), flush=True)
        results.append(row)

    out = Path(__file__).parent / "RESULTS_stem_conv.json"
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
