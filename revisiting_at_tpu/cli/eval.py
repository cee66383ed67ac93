"""Robustness evaluation entry point (AA_eval.py rebuild).

Loads a run checkpoint + its params.json (the config-as-artifact contract,
AA_eval.py:134-138), rebuilds the model, optionally resizes ViT pos-embeds
for high-res eval (AA_eval.py:196-211), and runs batched AutoAttack per
norm with the reference ε table {Linf: 4/255, L2: 2, L1: 75}.

Usage:
  python -m revisiting_at_tpu.cli.eval --run_dir runs/<run> [--epoch N]
      [--l_norms Linf] [--full_aa 0] [--img_size 224] [--n_ex 5000]
      [--data_dir /path/to/imagenet/val] [--batch_size 200]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", type=str, required=True)
    p.add_argument("--epoch", type=int, default=-1, help="-1: latest checkpoint")
    p.add_argument("--best", action="store_true",
                   help="read the best-adv-val checkpoint (<run_dir>/ckpt_best)")
    p.add_argument("--batch_size", type=int, default=200)
    p.add_argument("--n_ex", type=int, default=5000)
    p.add_argument("--l_norms", type=str, default="Linf", help="comma-separated")
    p.add_argument("--eps", type=float, default=None)
    p.add_argument("--l_epss", type=str, default="",
                   help="comma-separated per-norm eps aligned with --l_norms "
                        "(reference AA_eval.py:76); overrides --eps")
    p.add_argument("--full_aa", type=int, default=0)
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--synthetic", action="store_true",
                   help="explicitly evaluate on random synthetic images "
                        "(smoke tests only — numbers are meaningless)")
    p.add_argument("--only_clean", action="store_true")
    p.add_argument("--use_ema", type=int, default=0)
    p.add_argument("--save_imgs", action="store_true")
    p.add_argument("--n_iter", type=int, default=100)
    p.add_argument("--square_queries", type=int, default=5000,
                   help="Square attack query budget (autoattack n_queries)")
    p.add_argument("--fab_iter_chunk", type=int, default=50,
                   help="FAB iterations per device dispatch (bounded-"
                        "duration programs; trajectories are chunk-"
                        "invariant — tests/test_dispatch_chunking.py)")
    p.add_argument("--square_query_chunk", type=int, default=500,
                   help="Square queries per device dispatch (see "
                        "--fab_iter_chunk)")
    p.add_argument("--torch_ckpt", type=str, default="",
                   help="load a reference PyTorch .pt checkpoint instead of orbax")
    p.add_argument("--use_pallas", type=int, default=0,
                   help="fused block-tail kernel for ConvNeXt eval (TPU only)")
    p.add_argument("--stem_s2d", type=int, default=0,
                   help="stem stride-2 convs via space-to-depth (ops/stem_conv.py)")
    p.add_argument("--wide_tail", type=int, default=-1,
                   help="fused-tail full backward past C=512 (ops/block_mlp.py); "
                        "-1 = auto (ON for convnext_base/large)")
    p.add_argument("--shard_eval", type=int, default=0,
                   help="shard each eval batch over ALL local devices (data-"
                        "parallel single-eval multi-chip; params replicated)")
    p.add_argument("--tp", type=int, default=0,
                   help="tensor-parallel axis size: shard the block-MLP "
                        "params over a 'model' mesh axis (parallel/tp.py; "
                        "latency lever for the large models at high res); "
                        "remaining local devices form the data axis; "
                        "requires --use_pallas 0")
    p.add_argument("--multihost", type=int, default=0,
                   help="jax.distributed.initialize(); each process attacks "
                        "its own round-robin shard of the eval set and robust "
                        "counts are globally summed (the reference's GPU-farm "
                        "parallelism, runner_aa_eval.py, mapped to hosts)")
    return p.parse_args(argv)


def load_eval_set(args, num_classes: int):
    """Fixed val subset: resize(/0.875)+center-crop at img_size
    (AA_eval.py:104-117). Synthetic data requires the explicit --synthetic
    flag — robust accuracy on random pixels is not a result."""
    if args.data_dir:
        from ..data.folder import FolderConfig, make_folder_dataset

        it_fn, _ = make_folder_dataset(
            FolderConfig(
                root=args.data_dir,
                resolution=args.img_size,
                batch_size=args.batch_size,
                is_train=False,
                drop_remainder=False,
                # robustbench subset order: first n_ex val images by
                # basename (class-diverse), not by class dir — see
                # FolderConfig.sort_by_basename
                sort_by_basename=True,
                subset_size=args.n_ex,
            )
        )
        xs, ys = [], []
        n = 0
        for img, lab in it_fn():
            xs.append(img)
            ys.append(lab)
            n += len(lab)
            if n >= args.n_ex:
                break
        # stay uint8 on host — the AA driver converts per dispatched batch
        # (5000x224² is 0.7 GB as uint8 vs 2.8 GB as f32)
        x = np.concatenate(xs)[: args.n_ex]
        y = np.concatenate(ys)[: args.n_ex].astype(np.int64)
        return x, y
    if not args.synthetic:
        raise SystemExit(
            "no --data_dir given: pass --data_dir /path/to/val for a real "
            "evaluation, or --synthetic to explicitly run on random images "
            "(smoke test only)"
        )
    print("WARNING: --synthetic evaluation — accuracies below are meaningless")
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 1, size=(args.n_ex, args.img_size, args.img_size, 3)).astype(
        np.float32
    )
    y = rng.randint(0, num_classes, size=args.n_ex).astype(np.int64)
    return x, y


def main(argv=None):
    args = get_args(argv)
    import jax
    import jax.numpy as jnp

    if args.multihost:
        jax.distributed.initialize()  # before any device use

    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ..config import load_params_json
    from ..evals import EPS_DICT, SHORT_ATTACKS, STANDARD_ATTACKS, AutoAttack, AutoAttackConfig
    from ..models import get_model, resize_vit_pos_embed
    from ..utils.logging import EvalLogger

    run_dir = Path(args.run_dir)
    cfg = load_params_json(run_dir / "params.json")

    model, meta = get_model(
        cfg.model.arch,
        not_original=bool(cfg.model.not_original),
        updated=bool(cfg.model.updated),
        num_classes=cfg.data.num_classes,
        dtype=jnp.bfloat16,
        use_blurpool=bool(cfg.training.use_blurpool),
        add_normalization=bool(cfg.model.add_normalization),
        use_pallas=bool(args.use_pallas),
        stem_s2d=bool(args.stem_s2d),
        wide_tail=None if args.wide_tail < 0 else bool(args.wide_tail),
        tp_attn=args.tp if args.tp and args.tp > 1 else 0,
    )

    if args.torch_ckpt:
        # published-checkpoint bridge (reference main.py:856-872 semantics)
        from ..ckpt.torch_import import load_torch_checkpoint

        target_vars = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 224, 224, 3), jnp.float32),
                train=False,
            )
        )
        target_vars = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), target_vars
        )
        if meta.has_batch_stats:
            params, batch_stats = load_torch_checkpoint(
                args.torch_ckpt, cfg.model.arch, target_vars["params"],
                not_original=bool(cfg.model.not_original),
                target_batch_stats=target_vars["batch_stats"],
            )
        else:
            params = load_torch_checkpoint(
                args.torch_ckpt, cfg.model.arch, target_vars["params"],
                not_original=bool(cfg.model.not_original),
            )
            batch_stats = None
    else:
        # restore checkpoint via orbax (shared eval/export CLI path;
        # --use_ema errors if the run kept no EMA rather than silently
        # evaluating raw weights)
        from ..ckpt.checkpoint import restore_run_params

        params, batch_stats, _ = restore_run_params(
            run_dir, best=args.best, epoch=args.epoch, use_ema=bool(args.use_ema)
        )

    if meta.family == "vit" and args.img_size != 224:
        params = resize_vit_pos_embed(params, args.img_size, meta.patch_size)

    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats

    mesh = None
    mesh_ctx = None
    try:
        if args.tp and args.tp > 1:
            # tensor parallel: block-MLP params sharded over the "model"
            # axis, batch over the remaining ("data") devices — the SURVEY
            # §2.3 option of model-axis sharding for large models at high res
            if args.use_pallas:
                raise SystemExit("--tp requires --use_pallas 0 (parallel/tp.py)")
            from ..parallel import (
                MeshConfig, make_mesh, tp_sharded_leaf_count, tp_tree_shardings,
            )

            mesh = make_mesh(MeshConfig(model=args.tp), devices=jax.local_devices())
            # ViT tp_attn constraints resolve against the thread-local
            # context mesh; set it INSIDE the try so a failing TP-rule
            # assert or device_put still restores it for in-process callers
            mesh_ctx = jax.set_mesh(mesh)
            tp_sh = tp_tree_shardings(mesh, variables)
            assert tp_sharded_leaf_count(tp_sh) > 0, (
                f"--tp {args.tp}: no param matched the TP rules for this arch"
            )
            variables = jax.device_put(variables, tp_sh)
        elif args.shard_eval:
            # multi-chip: shard the batch dim of every dispatched eval batch
            # over this process's devices; params replicated (the reference
            # instead farms whole eval jobs across GPUs, runner_aa_eval.py)
            from ..parallel.mesh import make_mesh, replicated

            mesh = make_mesh(devices=jax.local_devices())
            variables = jax.device_put(variables, replicated(mesh))
        else:
            # put params on device BEFORE closing over them: numpy closure
            # constants are INLINED into the lowered module (198M f32 params
            # = ~800 MB of request body -> the tunnel's remote-compile 413
            # cap, and a different persistent-cache key per checkpoint);
            # device arrays are hoisted as executable parameters instead
            variables = jax.device_put(variables)

        from ..train.train_step import input_grad_view

        # all eval attacks differentiate w.r.t. the input only
        attack_view = input_grad_view(model)

        # variables flow into every attack program as a JIT ARGUMENT (not a
        # closure): closure params inline into the lowered module as
        # constants — ~800 MB for ConvNeXt-L, breaking the tunnel's
        # remote-compile cap and the persistent-cache key (autoattack.py)
        def logits_fn(v, xb):
            return attack_view.apply(v, xb, train=False)

        x, y = load_eval_set(args, cfg.data.num_classes)
        if args.multihost:
            from ..evals import shard_for_process

            x, y = shard_for_process(x, y)

        norms = args.l_norms.split(",")
        epss = [float(e) for e in args.l_epss.split(",")] if args.l_epss else None
        if epss is not None:
            assert len(epss) == len(norms), "--l_epss must align with --l_norms"
        # one writer per log file: non-zero ranks log to console only
        log_path = str(run_dir / f"evaluated_logs_{args.l_norms}_{args.full_aa}.txt")
        logger = EvalLogger(log_path if jax.process_index() == 0 else None)

        for norm_idx, norm in enumerate(norms):
            if epss is not None:
                eps = epss[norm_idx]
            else:
                eps = args.eps if args.eps is not None else EPS_DICT["imagenet"][norm]
            if eps > 1 and norm == "Linf":
                eps /= 255.0
            attacks = STANDARD_ATTACKS if args.full_aa else SHORT_ATTACKS
            aa_cfg = AutoAttackConfig(
                norm=norm, eps=eps, attacks_to_run=attacks, n_iter=args.n_iter,
                square_n_queries=args.square_queries,
                batch_size=args.batch_size, mesh=mesh,
                fab_iter_chunk=args.fab_iter_chunk,
                square_query_chunk=args.square_query_chunk,
            )
            aa = AutoAttack(logits_fn, aa_cfg, logger=logger, variables=variables)
            logger.log(f"norm={norm} eps={eps:.5f} attacks={attacks}")
            from ..evals import global_robust_accuracy

            if args.only_clean:
                acc, n_glob = global_robust_accuracy(aa.clean_accuracy(x, y))
                logger.log(f"clean accuracy: {acc:.2%} ({n_glob} pts)")
                continue
            out_path = None
            if args.save_imgs:
                # per-rank suffix under multihost: each process holds only
                # its own eval-set shard, and ranks share run_dir on a
                # common fs. The evaluator assembles the f32 x_adv STRAIGHT
                # into this .npy as a memmap (never resident in host RAM —
                # VERDICT r4 weak#8).
                rank = f"_r{jax.process_index()}" if jax.process_count() > 1 else ""
                out_path = run_dir / f"aa_adv_{args.n_ex}_{norm}_{eps:.5f}{rank}.npy"
            x_adv, robust = aa.run_standard_evaluation(x, y, out_path=out_path)
            racc, n_glob = global_robust_accuracy(robust)
            logger.log(f"robust accuracy ({norm}): {racc:.2%} ({n_glob} pts)")
    finally:
        if mesh_ctx is not None:
            mesh_ctx.__exit__(None, None, None)


if __name__ == "__main__":
    main(sys.argv[1:])
