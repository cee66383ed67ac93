"""Export a run's checkpoint to the reference's PyTorch format.

    python -m revisiting_at_tpu.cli.export --run_dir runs/model_... \
        --out weights.pt [--use_ema 1] [--best] [--epoch N]

Reads the run's params.json (the config-as-artifact contract the reference
evaluator also relies on, AA_eval.py:134-138), restores the orbax
checkpoint, and writes a plain timm-0.8 state_dict via
ckpt/torch_export.py — the file format of the reference's weights_{e}.pt
(main.py:737-741), loadable by its prefix cascade and by RobustBench-style
submission code (rb_architecture_util.py). ConvNeXt/ViT families only.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def get_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", type=str, required=True)
    p.add_argument("--out", type=str, required=True, help="output .pt path")
    p.add_argument("--epoch", type=int, default=-1, help="-1: latest checkpoint")
    p.add_argument("--best", action="store_true",
                   help="export the best-adv-val checkpoint (ckpt_best)")
    p.add_argument("--use_ema", type=int, default=0,
                   help="export the EMA weights (the reference's weights_ema_{e}.pt)")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    from ..ckpt.checkpoint import restore_run_params
    from ..ckpt.torch_export import save_torch_checkpoint
    from ..config import load_params_json

    run_dir = Path(args.run_dir)
    cfg = load_params_json(run_dir / "params.json")

    params, _, step = restore_run_params(
        run_dir, best=args.best, epoch=args.epoch, use_ema=bool(args.use_ema)
    )
    save_torch_checkpoint(params, cfg.model.arch, args.out)
    which = "ema" if args.use_ema else "raw"
    print(
        f"exported {cfg.model.arch} ({which} params, ckpt step {step}) "
        f"-> {args.out} (timm-0.8 state_dict)"
    )


if __name__ == "__main__":
    main(sys.argv[1:])
