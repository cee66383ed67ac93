"""Full-AutoAttack protocol cost AT SHAPE for the big eval configs.

BASELINE config #5 is "full AA on ConvNeXt-L-CvSt @320" (reference
README.md:45, driven by AA_eval.py:226-239 with img_size=320). No ImageNet
is available here, so accuracy is not reproducible — but the PROTOCOL COST
and memory behavior at shape are measurable: every attack kernel in
evals/ is a fixed-shape scan whose cost does not depend on attack success,
so a synthetic run with a tiny ε exercises the exact compiled programs of
a real evaluation (APGD-CE 100 it -> APGD-T 9 targets -> FAB-T -> Square
5000 queries) on the worklist that survives the clean pass.

Mechanics: fabricates a run dir (params.json via the config-as-artifact
contract + an orbax checkpoint of random-init params), then drives the
REAL eval CLI (cli/eval.py) end-to-end so restore -> model rebuild ->
attack waterfall -> ε-invariants -> re-score all run at shape. A small
class count keeps the post-clean worklist non-empty (chance accuracy
~1/num_classes); the tiny ε keeps it non-empty through all four attacks.

Usage (real chip):
  python experiments/aa_at_shape.py --arch convnext_large --img_size 320
CPU smoke:
  python experiments/aa_at_shape.py --arch convnext_micro --img_size 32 \
      --n_ex 8 --batch_size 8 --n_iter 3 --square_queries 20 --use_pallas 0
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", type=str, default="convnext_large")
    p.add_argument("--img_size", type=int, default=320)
    p.add_argument("--n_ex", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--n_iter", type=int, default=100)
    p.add_argument("--square_queries", type=int, default=5000)
    p.add_argument("--num_classes", type=int, default=10)
    p.add_argument("--eps", type=float, default=1e-4,
                   help="tiny by default: attacks then fail to break points, "
                        "so the worklist survives every stage (cost proof)")
    p.add_argument("--use_pallas", type=int, default=1)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke tests; the env var "
                        "alone is rewritten by the TPU plugin, CLAUDE.md)")
    p.add_argument("--out", type=str, default="experiments/RESULTS_l320_aa.json")
    return p.parse_args()


def main() -> None:
    args = get_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from revisiting_at_tpu.config.config import Config
    from revisiting_at_tpu.models import get_model
    from revisiting_at_tpu.utils.cache import enable_compilation_cache
    from revisiting_at_tpu.utils.retry import retry_transient

    enable_compilation_cache()

    run_dir = Path("experiments/artifacts") / f"aa_shape_{args.arch}_{args.img_size}"
    run_dir.mkdir(parents=True, exist_ok=True)

    # config-as-artifact: the eval CLI rebuilds the model from params.json
    cfg = Config()
    cfg.model.arch = args.arch
    cfg.model.not_original = 1  # CvSt variant, the headline config
    cfg.model.add_normalization = 0
    cfg.data.num_classes = args.num_classes
    cfg.dump_params_json(run_dir / "params.json")

    model, _meta = get_model(
        args.arch, not_original=True, num_classes=args.num_classes,
        dtype=jnp.bfloat16,
    )
    t0 = time.time()
    params = retry_transient(
        lambda: jax.jit(
            lambda r: model.init(
                r, jnp.zeros((1, args.img_size, args.img_size, 3)), train=False
            )
        )(jax.random.PRNGKey(0))["params"]
    )
    params = jax.device_get(params)
    init_s = time.time() - t0

    mgr = ocp.CheckpointManager(
        (run_dir / "ckpt").absolute(),
        options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True),
    )
    mgr.save(0, args=ocp.args.StandardSave({"params": params}))
    mgr.wait_until_finished()

    log_path = run_dir / "evaluated_logs_Linf_1.txt"
    if log_path.exists():
        log_path.unlink()

    from revisiting_at_tpu.cli.eval import main as eval_main

    t0 = time.time()
    eval_main([
        "--run_dir", str(run_dir),
        "--synthetic",
        "--img_size", str(args.img_size),
        "--n_ex", str(args.n_ex),
        "--batch_size", str(args.batch_size),
        "--full_aa", "1",
        "--eps", str(args.eps),
        "--n_iter", str(args.n_iter),
        "--square_queries", str(args.square_queries),
        "--use_pallas", str(args.use_pallas),
    ])
    wall_s = time.time() - t0

    log = log_path.read_text() if log_path.exists() else ""
    waterfall = {
        m.group(1).lower(): float(m.group(2))
        for m in re.finditer(r"robust accuracy after (\S+): ([\d.]+)%", log)
    }
    clean = re.search(r"initial \(clean\) accuracy: ([\d.]+)%", log)

    record = {
        "what": (
            "full AutoAttack protocol cost AT SHAPE via the real eval CLI "
            "(fabricated random-init run dir, synthetic pixels, tiny eps so "
            "the post-clean worklist survives all four attacks; per-attack "
            "kernels are fixed-shape scans, so this is the compiled-program "
            "cost of a real evaluation at this shape)"
        ),
        "arch": args.arch + "-CvSt",
        "img_size": args.img_size,
        "n_ex": args.n_ex,
        "batch_size": args.batch_size,
        "n_iter": args.n_iter,
        "square_queries": args.square_queries,
        "num_classes": args.num_classes,
        "eps": args.eps,
        "use_pallas": bool(args.use_pallas),
        "init_s": round(init_s, 1),
        "wall_s": round(wall_s, 1),
        "clean_acc_pct": float(clean.group(1)) if clean else None,
        "waterfall_pct": waterfall,
        "n_devices": jax.device_count(),
    }
    out = Path(args.out)
    existing = []
    if out.exists():
        try:
            existing = json.loads(out.read_text())
            if not isinstance(existing, list):
                existing = [existing]
        except ValueError:
            existing = []
    existing.append(record)
    out.write_text(json.dumps(existing, indent=1))
    print(json.dumps(record))


if __name__ == "__main__":
    main()
