"""Big-model on-chip proof: ConvNeXt-B/L-CvSt AT steps + L@320 eval forward.

The reference's headline results are ConvNeXt-B/L-CvSt and ViT-B
(/root/reference/README.md:40-45, recipe run_train.sh:10-18). This script
compiles and times those configurations on the real TPU chip — the full
fused 2-step APGD Linf AT train step at the reference's per-accelerator
batch of 80, plus the high-res eval-mode forward of ConvNeXt-L-CvSt @320
(README.md:45 evaluates L at 320).

One config per process invocation (short processes survive tunnel flakes;
the persistent compile cache makes re-runs cheap):

  python experiments/big_model_bench.py b224          # ConvNeXt-B-CvSt @224 AT step
  python experiments/big_model_bench.py l224          # ConvNeXt-L-CvSt @224 AT step
  python experiments/big_model_bench.py l320eval      # ConvNeXt-L-CvSt @320 eval fwd
  python experiments/big_model_bench.py vit_s         # ViT-S-CvSt @224 AT step (regression row)

Flags: --bs N (default 80), --accum K (grad accumulation; micro-batch =
bs/K per optimizer step), --no-remat, --no-pallas, --steps N.

Emits one JSON line per run and appends it to experiments/RESULTS_big.json.
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

CONFIGS = {
    "b224": dict(arch="convnext_base", res=224, mode="at"),
    "l224": dict(arch="convnext_large", res=224, mode="at"),
    "l320eval": dict(arch="convnext_large", res=320, mode="eval"),
    "b256eval": dict(arch="convnext_base", res=256, mode="eval"),  # README.md:43
    "vit_s": dict(arch="vit_s", res=224, mode="at"),
    "vit_m": dict(arch="vit_m", res=224, mode="at"),  # C=512: heavy fused tail
    "vit_b": dict(arch="vit_b", res=224, mode="at"),  # C=768: input-mode tail only
    "vit_s_320eval": dict(arch="vit_s", res=320, mode="eval"),  # 401 tokens
    "t224": dict(arch="convnext_tiny", res=224, mode="at"),
    # remaining README.md:32,38 headline-table archs
    "s224": dict(arch="convnext_small", res=224, mode="at"),
    "iso224": dict(arch="convnext_iso", res=224, mode="at"),
    # the paper recipe's production step: uint8 batch -> on-device
    # RandAugment/erasing/hflip -> mixup/cutmix -> 2-step APGD -> update
    "t224_fullrecipe": dict(arch="convnext_tiny", res=224, mode="at", aug=True),
    # BASELINE.json config #4 verbatim: "full paper recipe: APGD AT +
    # augmentations + EMA + label smoothing, ConvNeXt-B-CvSt"
    "b224_fullrecipe": dict(arch="convnext_base", res=224, mode="at", aug=True),
}


def build_state(model, meta, params, iters_per_epoch=5000, accum=1):
    from revisiting_at_tpu.train.ema import ema_init
    from revisiting_at_tpu.train.optimizer import make_optimizer
    from revisiting_at_tpu.train.schedule import LRConfig, make_lr_schedule
    from revisiting_at_tpu.train.state import TrainState

    sched = make_lr_schedule(LRConfig(lr=1e-3, lr_peak_epoch=20, epochs=300),
                             iters_per_epoch)
    tx = make_optimizer(
        optimizer="adamw", weight_decay=0.05, family=meta.family,
        learning_rate=sched, params=params, grad_accum=accum,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=ema_init(params),
    )
    return state, tx


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("config", choices=sorted(CONFIGS))
    ap.add_argument("--bs", type=int, default=80)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--attn-impl", choices=["qkv", "bhnd"], default="qkv",
                    help="ViT fused-attention kernel version (A/B)")
    ap.add_argument("--stem-s2d", action="store_true",
                    help="stem stride-2 convs via space-to-depth (A/B)")
    ap.add_argument("--wide-tail", action="store_true",
                    help="fused-tail full backward past C=512 (A/B)")
    ap.add_argument("--split-bwd", action="store_true",
                    help="two-kernel full backward (ds+dA pass then dw1 pass; A/B)")
    ap.add_argument("--no-cache", action="store_true",
                    help="skip the persistent compile cache (fresh compile)")
    args = ap.parse_args()
    c = CONFIGS[args.config]

    if not args.no_cache:
        from revisiting_at_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()

    from revisiting_at_tpu.data.augment import RandAugmentConfig
    from revisiting_at_tpu.data.mixup import MixupConfig
    from revisiting_at_tpu.models import get_model
    from revisiting_at_tpu.train.train_step import AdvConfig, make_train_step
    from revisiting_at_tpu.utils.flops import param_count

    res = c["res"]
    at = c["mode"] == "at"
    use_aug = bool(c.get("aug"))
    use_remat = at and not args.no_remat
    use_pallas = not args.no_pallas
    model, meta = get_model(
        c["arch"], not_original=True, dtype=jnp.bfloat16,
        use_pallas=use_pallas, remat=use_remat, attn_impl=args.attn_impl,
        stem_s2d=args.stem_s2d, wide_tail=args.wide_tail,
        split_bwd=args.split_bwd,
    )
    t0 = time.perf_counter()
    params = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, res, res, 3)), train=False)
    )(jax.random.PRNGKey(0))["params"]
    jax.block_until_ready(params)
    t_init = time.perf_counter() - t0
    n_params = param_count(params)
    print(f"[{args.config}] {c['arch']} params={n_params/1e6:.1f}M init={t_init:.1f}s "
          f"devices={jax.devices()} param_device={jax.tree.leaves(params)[0].devices()}",
          flush=True)

    rng = np.random.RandomState(0)
    # micro-batch = bs/accum: with optax.MultiSteps each call consumes one
    # micro-batch; an optimizer step happens every `accum` calls
    micro = args.bs // max(args.accum, 1)
    if use_aug:
        # production input contract: uint8 batches from tf.data; RandAugment/
        # erasing/hflip run on device inside the fused step
        images = jnp.asarray(rng.randint(0, 256, (micro, res, res, 3)), jnp.uint8)
    else:
        images = jnp.asarray(rng.uniform(0, 1, (micro, res, res, 3)), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 1000, micro), jnp.int32)

    if at:
        state, tx = build_state(model, meta, params, accum=args.accum)
        step_fn = make_train_step(
            model, tx,
            adv=AdvConfig(attack="apgd", norm="Linf", eps=4 / 255, n_iter=2),
            mixup=MixupConfig(num_classes=1000, label_smoothing=0.1),
            randaug=RandAugmentConfig() if use_aug else None,
            ema_decay=0.9999, has_batch_stats=False,
        )

        t0 = time.perf_counter()
        state, metrics = step_fn(state, images, labels)
        # force a readback: block_until_ready can lie on the tunnel
        # (CLAUDE.md) — without this the timed loop absorbs the compile tail
        loss0 = float(metrics["loss"])
        t_compile = time.perf_counter() - t0
        print(f"[{args.config}] compile+first step {t_compile:.1f}s "
              f"loss={loss0:.3f}", flush=True)
        for _ in range(2):
            state, metrics = step_fn(state, images, labels)
        _ = float(metrics["loss"])

        n = args.steps
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step_fn(state, images, labels)
        # force a readback: block_until_ready can lie on the tunnel
        _ = float(metrics["loss"])
        dt = (time.perf_counter() - t0) / n
        # attack-steps/s normalized to the full bs-80 optimizer step:
        # `accum` micro-steps of 2 attack iterations each
        att_per_s = 2.0 / (dt * max(args.accum, 1)) * 1  # per chip (1 chip)
        record = {
            "config": args.config, "arch": c["arch"], "res": res,
            "mode": "at", "params_m": round(n_params / 1e6, 1),
            "batch": args.bs, "micro_batch": micro, "grad_accum": args.accum,
            "remat": use_remat, "use_pallas": use_pallas,
            "attn_impl": args.attn_impl if c["arch"].startswith("vit") else None,
            "stem_s2d": args.stem_s2d,
            "wide_tail": args.wide_tail,
            "split_bwd": args.split_bwd,
            "ms_per_micro_step": round(dt * 1e3, 1),
            "attack_steps_per_s_per_chip": round(att_per_s, 3),
            "compile_s": round(t_compile, 1),
        }
    else:
        variables = {"params": params}

        @jax.jit
        def fwd(v, x):
            return model.apply(v, x, train=False)

        t0 = time.perf_counter()
        out = fwd(variables, images.astype(jnp.bfloat16))
        _ = float(jnp.sum(out))  # true sync (block_until_ready lies here)
        t_compile = time.perf_counter() - t0
        for _ in range(2):
            out = fwd(variables, images.astype(jnp.bfloat16))
        _ = float(jnp.sum(out))
        n = args.steps
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(variables, images.astype(jnp.bfloat16))
        _ = float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / n
        record = {
            "config": args.config, "arch": c["arch"], "res": res,
            "mode": "eval_fwd", "params_m": round(n_params / 1e6, 1),
            "batch": micro, "use_pallas": use_pallas,
            "ms_per_batch": round(dt * 1e3, 1),
            "imgs_per_s": round(micro / dt, 1),
            "compile_s": round(t_compile, 1),
        }

    print(json.dumps(record), flush=True)
    out_path = Path(__file__).parent / "RESULTS_big.json"
    rows = []
    if out_path.exists():
        rows = json.loads(out_path.read_text())
    rows = [r for r in rows if not (
        r.get("config") == record["config"]
        and r.get("batch") == record["batch"]
        and r.get("grad_accum") == record.get("grad_accum")
        and r.get("use_pallas") == record.get("use_pallas")
        and r.get("remat") == record.get("remat")
        and r.get("attn_impl") == record.get("attn_impl")
        and bool(r.get("stem_s2d")) == bool(record.get("stem_s2d"))
        and bool(r.get("wide_tail")) == bool(record.get("wide_tail"))
        and bool(r.get("split_bwd")) == bool(record.get("split_bwd"))
    )]
    rows.append(record)
    out_path.write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
