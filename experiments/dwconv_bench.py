"""dwconv 7x7 micro-bench: XLA direct vs Pallas v1 vs v2 hoisted-shift.

VERDICT r2 item 2 / NEXT.md item 3: the v1 kernel lost to XLA because 42
of its 49 tap reads were sublane-misaligned; v2 hoists the W-shifts into 7
aligned ring buffers. Target: >=1.3x vs XLA's 1.49 ms stage-0 forward, or
a measured negative result recorded in PROFILE.md.

Shapes: the four ConvNeXt-T stages at 224 (bs 80). Timing: in-jit loop of
N calls on chained values (defeats CSE), forced readback.
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

STAGES = [  # (H, W, C) after each downsample, bs fixed at 80
    (56, 56, 96),
    (28, 28, 192),
    (14, 14, 384),
    (7, 7, 768),
]
B = 80
REPS = 30


def timed(fn, x, w, b):
    @jax.jit
    def loop(x, w, b):
        def body(c, _):
            y = fn(c, w, b)
            # chain: feed output back (same shape) so iterations serialize
            return y * 0.999, ()

        out, _ = jax.lax.scan(body, x, None, length=REPS)
        return out

    out = loop(x, w, b)
    _ = float(jnp.sum(out))  # readback: block_until_ready can lie on the tunnel
    t0 = time.perf_counter()
    out = loop(x, w, b)
    _ = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / REPS
    return dt * 1e3


def timed_fwdbwd(fn, x, w, b):
    """Forward + full VJP per iteration (the AT step runs both)."""

    @jax.jit
    def loop(x, w, b):
        def body(c, _):
            y, vjp = jax.vjp(lambda xx: fn(xx, w, b), c)
            (dx,) = vjp(y)
            return dx * 1e-3, ()

        out, _ = jax.lax.scan(body, x, None, length=REPS)
        return out

    out = loop(x, w, b)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    out = loop(x, w, b)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / REPS * 1e3


def main() -> None:
    import argparse

    from revisiting_at_tpu.ops.dwconv import dwconv7x7, dwconv7x7_v2

    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--shapes", default="", help="extra H,W,C triples, e.g. 40,40,192")
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    def xla_dw(x, w, b):
        # flax Conv(dtype=bf16) computes in the activation dtype
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=x.shape[-1],
        ) + b.astype(x.dtype)

    shapes = list(STAGES)
    for t in filter(None, args.shapes.split(";")):
        shapes.append(tuple(int(v) for v in t.split(",")))

    rows = []
    for (H, W, C) in shapes:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, H, W, C), dt)
        w = jnp.asarray(rng.randn(7, 7, 1, C) * 0.1, jnp.float32)
        b = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
        row = {"shape": f"{B}x{H}x{W}x{C}", "dtype": args.dtype}
        row["xla_ms"] = round(timed(xla_dw, x, w, b), 3)
        row["v1_ms"] = round(timed(lambda x, w, b: dwconv7x7(x, w, b), x, w, b), 3)
        row["v2_ms"] = round(timed(lambda x, w, b: dwconv7x7_v2(x, w, b), x, w, b), 3)
        row["v2_vs_xla"] = round(row["xla_ms"] / row["v2_ms"], 2)
        row["xla_fb_ms"] = round(timed_fwdbwd(xla_dw, x, w, b), 3)
        row["v2_fb_ms"] = round(
            timed_fwdbwd(lambda x, w, b: dwconv7x7_v2(x, w, b), x, w, b), 3
        )
        row["v2_fb_vs_xla"] = round(row["xla_fb_ms"] / row["v2_fb_ms"], 2)
        print(json.dumps(row), flush=True)
        rows.append(row)

    out = Path(__file__).parent / "RESULTS_dwconv.json"
    existing = []
    if out.exists():
        existing = json.loads(out.read_text())
    existing = [r for r in existing if not any(
        r.get("shape") == n["shape"] and r.get("dtype") == n.get("dtype")
        for n in rows
    )]
    out.write_text(json.dumps(existing + rows, indent=1))


if __name__ == "__main__":
    main()
