"""Reproducible xprof capture + per-op summary for any bench config.

Replaces the ad-hoc /tmp scripts behind PROFILE.md's per-op tables
(reference culture: ad-hoc wall-clock dicts in apgd, SURVEY.md §5 —
rebuilt here on jax.profiler + xprof, the TPU-native tracing stack).

  python experiments/profile_step.py t224 [--bs 80] [--steps 3]
  python experiments/profile_step.py vit_s --no-remat

Captures a jax.profiler trace of the fused AT train step (or eval
forward) for the chosen config from big_model_bench.CONFIGS, converts the
xplane with xprof's framework_op_stats, prints the top device ops grouped
by operation type, and writes the full table to
experiments/artifacts/opstats_<config>.json.
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def summarize_xplane(xplane_paths: list[str], steps: int) -> list[dict]:
    """framework_op_stats rows -> list of dicts (device ops only)."""
    from xprof.convert import raw_to_tool_data as r

    data, _ = r.xspace_to_tool_data(xplane_paths, "framework_op_stats", {"tqx": "out:csv;"})
    assert data is not None, (
        f"xprof conversion returned no data for {xplane_paths} — mixed "
        "profiler sessions in one directory break it (use a fresh outdir)"
    )
    s = data if isinstance(data, str) else data.decode()
    obj = json.loads(s)
    tbl = obj[0] if isinstance(obj, list) else obj
    cols = [c["label"] for c in tbl["cols"]]
    rows = []
    for row in tbl["rows"]:
        vals = [c.get("v") if c else None for c in row["c"]]
        rec = dict(zip(cols, vals))
        if rec.get("Host/device") != "Device":
            continue
        rows.append(
            {
                "type": rec["Operation Type"],
                "name": rec["Operation Name"],
                "occurrences": rec["#Occurrences"],
                "ms_per_step": round(rec["Total self-time (us)"] / 1e3 / steps, 3),
                "device_pct": round(100 * rec["Total self-time on Device (%)"], 2),
                "gflops_per_s": rec.get("Model FLOP Rate (GFLOP/s)"),
                "bw_gb_s": rec.get("Measured Memory BW (GBytes/Sec)"),
                "bound_by": rec.get("Bound by"),
            }
        )
    return rows


def main() -> None:
    from big_model_bench import CONFIGS, build_state

    ap = argparse.ArgumentParser()
    ap.add_argument("config", choices=sorted(CONFIGS))
    ap.add_argument("--bs", type=int, default=80)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--outdir", type=str, default="")
    args = ap.parse_args()
    c = CONFIGS[args.config]

    from revisiting_at_tpu.data.augment import RandAugmentConfig
    from revisiting_at_tpu.data.mixup import MixupConfig
    from revisiting_at_tpu.models import get_model
    from revisiting_at_tpu.train.train_step import AdvConfig, make_train_step
    from revisiting_at_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    res, at = c["res"], c["mode"] == "at"
    model, meta = get_model(
        c["arch"], not_original=True, dtype=jnp.bfloat16,
        use_pallas=not args.no_pallas, remat=at and not args.no_remat,
    )
    params = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, res, res, 3)), train=False)
    )(jax.random.PRNGKey(0))["params"]

    rng = np.random.RandomState(0)
    if c.get("aug"):
        images = jnp.asarray(rng.randint(0, 256, (args.bs, res, res, 3)), jnp.uint8)
    else:
        images = jnp.asarray(rng.uniform(0, 1, (args.bs, res, res, 3)), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 1000, args.bs), jnp.int32)

    if at:
        state, tx = build_state(model, meta, params)
        step_fn = make_train_step(
            model, tx,
            adv=AdvConfig(attack="apgd", norm="Linf", eps=4 / 255, n_iter=2),
            mixup=MixupConfig(num_classes=1000, label_smoothing=0.1),
            randaug=RandAugmentConfig() if c.get("aug") else None,
            ema_decay=0.9999, has_batch_stats=False,
        )

        def run_once():
            nonlocal state
            state, metrics = step_fn(state, images, labels)
            return metrics["loss"]
    else:
        variables = {"params": params}
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
        xb = images.astype(jnp.bfloat16)

        def run_once():
            return jnp.sum(fwd(variables, xb))

    t0 = time.perf_counter()
    for _ in range(3):
        out = run_once()
    _ = float(jnp.sum(out))  # readback: block_until_ready lies on the tunnel
    print(f"warmup+compile {time.perf_counter() - t0:.1f}s", flush=True)

    import os

    # unique per invocation: a reused directory accumulates profiler
    # sessions and the recursive xplane glob then feeds xprof MIXED
    # sessions, which it rejects (queue10 job-1 failure mode)
    outdir = args.outdir or f"/tmp/xprof_{args.config}_{os.getpid()}"
    jax.profiler.start_trace(outdir)
    for _ in range(args.steps):
        out = run_once()
    _ = float(jnp.sum(out))
    jax.profiler.stop_trace()

    xplanes = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
    rows = summarize_xplane(xplanes, args.steps)
    total = sum(r["ms_per_step"] for r in rows)

    by_type = collections.defaultdict(float)
    for r in rows:
        by_type[r["type"]] += r["ms_per_step"]
    print(f"\n== {args.config} device self-time: {total:.1f} ms/step ==")
    for t, ms in sorted(by_type.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{ms:8.2f} ms  {100 * ms / total:5.1f}%  {t}")
    print("\ntop single ops:")
    for r in rows[:12]:
        print(f"{r['ms_per_step']:8.2f} ms  {r['type']:<24} {r['name'][-80:]}")

    art = Path(__file__).parent / "artifacts"
    art.mkdir(exist_ok=True)
    out_path = art / f"opstats_{args.config}.json"
    out_path.write_text(json.dumps(
        {"config": args.config, "bs": args.bs, "steps": args.steps,
         "total_device_ms_per_step": round(total, 2), "rows": rows}, indent=1))
    print("\nwrote", out_path)


if __name__ == "__main__":
    main()
