"""Training entry point.

Usage (reference run_train.sh parity):
  python -m revisiting_at_tpu.cli.train \
      --model.arch convnext_tiny --model.not_original 1 \
      --adv.attack apgd --adv.n_iter 2 --adv.norm Linf --adv.eps 0.0156862745 \
      --data.augmentations 1 --model.model_ema 1 \
      --training.batch_size 80 --lr.lr 1e-3 --lr.lr_peak_epoch 20 \
      --training.epochs 300 --training.label_smoothing 0.1 \
      --data.dataset folder --data.train_dataset /path/to/imagenet/train ...

No mp.spawn / process groups: a single process drives the whole mesh
(multi-host via jax.distributed.initialize when launched per host).
"""

from __future__ import annotations

import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    from ..config import config_from_args
    from ..utils.cache import enable_compilation_cache

    # persistent compile cache: reliably replays small/medium programs
    # across processes (measured 11.6 s -> 0.6 s); NOTE the axon tunnel
    # appears to re-do server-side work for very large executables (the
    # 95 MB ViT AT step still takes minutes on a key hit), see utils/cache.py
    enable_compilation_cache()

    cfg = config_from_args(argv)

    if cfg.dist.multihost:
        # one process per host; coordinator/process ids from the TPU env —
        # XLA then sees the global device set and pjit shards across hosts
        import jax

        jax.distributed.initialize()

    if cfg.data.dataset not in ("folder", "synthetic"):
        raise SystemExit(
            f"unknown data.dataset={cfg.data.dataset!r}: supported values are "
            "'folder' (ImageFolder layout via tf.data) and 'synthetic'"
        )

    train_data = val_data = train_data_factory = None
    if cfg.data.dataset == "folder" and cfg.data.train_dataset:
        import jax

        from ..data.folder import FolderConfig, make_folder_dataset

        def train_data_factory(res: int):
            """Rebuild the train pipeline at a new resolution (the reference's
            resolution ramp re-sizes the decoder output, main.py:714-718)."""
            it_fn, n = make_folder_dataset(
                FolderConfig(
                    root=cfg.data.train_dataset,
                    resolution=res,
                    batch_size=cfg.training.batch_size,
                    is_train=True,
                    seed=cfg.data.seed,
                    num_parallel=cfg.data.num_workers,
                    subset_size=cfg.data.subset_size,
                    cache_decoded=bool(cfg.data.in_memory),
                ),
                jax.process_index(),
                jax.process_count(),
            )

            class _Wrap:
                def __len__(self):
                    return n

                def __iter__(self):
                    return iter(it_fn())

            return _Wrap()

        train_data = train_data_factory(
            # start at the ramp's initial resolution (constant max_res in the
            # paper recipe where min_res == max_res)
            cfg.resolution.min_res
            if cfg.resolution.min_res < cfg.resolution.max_res
            else cfg.resolution.max_res
        )
        if cfg.data.val_dataset:
            val_iter_fn, n_val = make_folder_dataset(
                FolderConfig(
                    root=cfg.data.val_dataset,
                    resolution=cfg.validation.resolution,
                    batch_size=cfg.validation.batch_size,
                    is_train=False,
                    drop_remainder=True,
                    cache_decoded=bool(cfg.data.in_memory),
                ),
                jax.process_index(),
                jax.process_count(),
            )

            class _WrapV:
                def __len__(self):
                    return n_val

                def __iter__(self):
                    return iter(val_iter_fn())

            val_data = _WrapV()

    from ..train.trainer import Trainer

    trainer = Trainer(
        cfg, train_data=train_data, val_data=val_data,
        train_data_factory=train_data_factory,
    )
    if cfg.model.ckpt_path:
        trainer.try_resume()
    if cfg.training.eval_only:
        acc, n = trainer.single_val()
        trainer.logger.log({"eval_only_acc": acc, "points": n})
        return
    trainer.train()


if __name__ == "__main__":
    main()
