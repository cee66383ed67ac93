"""Trainer: epochs loop, validation, checkpointing, metric logging.

The ImageNetTrainer capability (reference main.py:328-1152) rebuilt around
the fused jitted train step:
  * initial clean validation before training (main.py:703)
  * per-epoch train loop; LR interpolation lives INSIDE the jitted step
    (train/schedule.py), not in host code
  * NaN-loss kills the run (main.py:729-730)
  * per-epoch checkpoints + every-5-epoch full state; TRUE resume of
    params/opt_state/EMA/step (fixes the reference gap, SURVEY.md §5)
  * JSONL metrics with relative timestamps; params.json config artifact
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..ckpt.checkpoint import CheckpointManager
from ..config import Config
from ..data.augment import RandAugmentConfig
from ..data.mixup import MixupConfig
from ..data.synthetic import SyntheticData
from ..models import get_model
from ..parallel import (
    MeshConfig, batch_sharding, make_mesh, param_shardings, replicated,
    tree_shardings,
)
from ..utils.flops import param_count
from ..utils.logging import RunLogger, make_run_name
from .ema import ema_init
from .optimizer import make_optimizer
from .schedule import LRConfig, get_resolution, make_lr_schedule
from .state import TrainState
from .train_step import (
    AdvConfig, make_adv_eval_step, make_eval_step, make_train_step,
)
from ..utils.retry import buffers_intact, retry_transient


class Trainer:
    """train_data_factory: optional callable res -> iterable, used to rebuild
    the input pipeline when the resolution ramp changes the train resolution
    (reference get_resolution/decoder.output_size, main.py:372-388,714-718;
    constant 224 in the paper recipe)."""

    def __init__(self, cfg: Config, train_data=None, val_data=None,
                 train_data_factory=None):
        self.train_data_factory = train_data_factory
        self.cfg = cfg
        t = cfg.training

        if cfg.misc.debug_nans:
            jax.config.update("jax_debug_nans", True)

        tp = max(int(getattr(cfg.dist, "tp", 1)), 1)
        if tp > 1 and t.use_pallas:
            raise ValueError(
                "dist.tp > 1 requires training.use_pallas=0: the Pallas "
                "custom calls are opaque to the SPMD partitioner, and the "
                "tensor-parallel path is XLA auto-partitioned (parallel/tp.py)"
            )
        self.mesh = make_mesh(MeshConfig(fsdp=cfg.dist.fsdp, model=tp))
        self.batch_sharding = batch_sharding(self.mesh)
        self._mesh_ctx = None
        if tp > 1:
            # ViT attention-head constraints (models/vit.py Attention.tp_attn)
            # resolve their PartitionSpec against the context mesh at trace
            # time; jax.set_mesh swaps the THREAD-LOCAL context globally, so
            # keep the token for release_mesh() (in-process embedders/tests
            # must not leak this mesh into later Trainer instances)
            self._mesh_ctx = jax.set_mesh(self.mesh)

        try:
            self._init_rest(cfg, t, tp, train_data, val_data)
        except BaseException:
            # a failed construction (bad arch for the TP rules, missing
            # pretrained file, ckpt-load error, ...) must not leak the
            # thread-local mesh context: the half-built Trainer is
            # unreachable, so nobody could call release_mesh() afterwards
            self.release_mesh()
            raise

    def _init_rest(self, cfg: Config, t, tp: int, train_data, val_data):
        dtype = jnp.bfloat16 if t.precision == "bf16" else jnp.float32
        self.model, self.meta = get_model(
            cfg.model.arch,
            not_original=bool(cfg.model.not_original),
            updated=bool(cfg.model.updated),
            num_classes=cfg.data.num_classes,
            dtype=dtype,
            drop_path_rate=cfg.model.drop_path_rate,
            use_blurpool=bool(t.use_blurpool),
            add_normalization=bool(cfg.model.add_normalization),
            use_pallas=bool(t.use_pallas),
            remat=bool(t.remat),
            stem_s2d=bool(t.stem_s2d),
            wide_tail=None if t.wide_tail < 0 else bool(t.wide_tail),
            split_bwd=bool(t.split_bwd),
            tp_attn=tp if tp > 1 else 0,  # ViT families only (factory)
        )

        res = cfg.resolution.max_res
        self.res = res
        rng = jax.random.PRNGKey(t.seed)
        variables = jax.jit(
            lambda r: self.model.init(r, jnp.zeros((1, res, res, 3)), train=False)
        )(rng)
        params = variables["params"]
        batch_stats = variables.get("batch_stats")

        # pretrained init (reference get_new_model(pretrained=True); the 21k
        # zoo entries are 21k-pretrained-ft-1k timm weights and are
        # meaningless from random init, utils_architecture.py:247,295)
        wants_pretrained = bool(cfg.model.pretrained) or cfg.model.arch.endswith("_21k")
        if wants_pretrained:
            if not cfg.model.pretrained_path:
                raise ValueError(
                    f"model.pretrained=1 (or a *_21k arch, {cfg.model.arch!r}) needs "
                    "model.pretrained_path pointing at a local timm checkpoint: this "
                    "environment cannot download weights (reference: timm fetches "
                    "them, utils_architecture.py:242-295)"
                )
            from ..ckpt.torch_import import load_timm_pretrained

            params, report = load_timm_pretrained(
                cfg.model.pretrained_path, cfg.model.arch, params,
                target_batch_stats=batch_stats,
            )
            if report.get("batch_stats") is not None:
                batch_stats = report["batch_stats"]
            print(
                f"pretrained init from {cfg.model.pretrained_path}: "
                f"{len(report['loaded'])} tensors loaded, "
                f"{len(report['kept_random'])} kept at random init "
                f"(e.g. {report['kept_random'][:3]})"
            )

        # data
        self.train_data = train_data
        self.val_data = val_data
        if self.train_data is None:
            self.train_data = SyntheticData(
                t.batch_size, res, cfg.data.num_classes, seed=cfg.data.seed
            )
        if self.val_data is None:
            self.val_data = SyntheticData(
                cfg.validation.batch_size, cfg.validation.resolution,
                cfg.data.num_classes, seed=cfg.data.seed + 1, n_batches=8,
            )
        self.iters_per_epoch = len(self.train_data)

        # optimizer with in-step LR schedule
        lr_cfg = LRConfig(
            lr=cfg.lr.lr,
            schedule_type=cfg.lr.lr_schedule_type,
            lr_peak_epoch=cfg.lr.lr_peak_epoch,
            step_ratio=cfg.lr.step_ratio,
            step_length=cfg.lr.step_length,
            epochs=t.epochs,
        )
        # LR schedule advances per OPTIMIZER step (grad_accum micro-batches)
        accum = max(int(t.grad_accum), 1)
        self.lr_schedule = make_lr_schedule(
            lr_cfg, max(self.iters_per_epoch // accum, 1)
        )
        self.tx = make_optimizer(
            optimizer=t.optimizer,
            weight_decay=t.weight_decay,
            momentum=t.momentum,
            family=self.meta.family,
            learning_rate=self.lr_schedule,
            params=params,
            freeze_some=bool(cfg.model.freeze_some),
            early=bool(cfg.model.early),
            grad_accum=accum,
        )
        opt_state = self.tx.init(params)

        use_ema = cfg.model.model_ema > 0
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            ema_params=ema_init(params) if use_ema else None,
            batch_stats=batch_stats,
            ema_batch_stats=ema_init(batch_stats) if (use_ema and batch_stats) else None,
        )
        # place: params/opt/ema FSDP-or-replicated (opt moments shard exactly
        # like their params — ZeRO; scalar counts replicate), batch sharded
        # at call sites. Under dist.tp > 1 the TP rules take precedence and
        # unmatched leaves fall back to the FSDP rule (parallel/tp.py).
        if tp > 1:
            from ..parallel import tp_sharded_leaf_count, tp_tree_shardings

            _param_sh = lambda m, p: tp_tree_shardings(m, p)  # noqa: E731
            _tree_sh = tp_tree_shardings
            n_tp = tp_sharded_leaf_count(tp_tree_shardings(self.mesh, params))
            assert n_tp > 0, (
                f"dist.tp={tp} but no param matched the TP rules for arch "
                f"{cfg.model.arch!r} (parallel/tp.py TP_RULES)"
            )
        else:
            _param_sh, _tree_sh = param_shardings, tree_shardings
        shardings = TrainState(
            step=replicated(self.mesh),
            params=_param_sh(self.mesh, params),
            opt_state=_tree_sh(self.mesh, opt_state),
            ema_params=_param_sh(self.mesh, params) if use_ema else None,
            batch_stats=jax.tree.map(lambda _: replicated(self.mesh), batch_stats)
            if batch_stats is not None
            else None,
            ema_batch_stats=jax.tree.map(lambda _: replicated(self.mesh), batch_stats)
            if (use_ema and batch_stats is not None)
            else None,
        )
        self.state = jax.device_put(state, shardings)
        self.state_shardings = shardings

        mixup = None
        if cfg.data.augmentations:
            mixup = MixupConfig(
                label_smoothing=t.label_smoothing, num_classes=cfg.data.num_classes
            )
        self.mixup = mixup
        self.use_randaug = bool(cfg.data.augmentations)

        adv = AdvConfig(
            attack=cfg.adv.attack,
            norm=cfg.adv.norm,
            eps=cfg.adv.eps,
            n_iter=cfg.adv.n_iter,
            alpha=cfg.adv.alpha if cfg.adv.attack == "fgsm" else 1.25,
            noise_level=cfg.adv.noise_level,
            skip_projection=bool(cfg.adv.skip_projection),
        )
        # Pallas custom calls aren't auto-partitionable: under a multi-device
        # mesh the step runs in shard_map. With fsdp > 1 the shard_map step
        # runs manual ZeRO-3 (differentiable all_gather of param shards), so
        # the fused kernel composes with FSDP instead of silently downgrading.
        use_shard_map = bool(t.use_pallas) and self.mesh.size > 1
        state_specs = None
        if use_shard_map and cfg.dist.fsdp > 1:
            state_specs = jax.tree.map(
                lambda ns: ns.spec, shardings,
                is_leaf=lambda x: hasattr(x, "spec"),
            )
        self.train_step = make_train_step(
            self.model,
            self.tx,
            adv=adv,
            mixup=mixup,
            randaug=RandAugmentConfig() if self.use_randaug else None,
            ema_decay=cfg.model.model_ema_decay if use_ema else 0.0,
            seed=t.seed,
            has_batch_stats=self.meta.has_batch_stats,
            mesh=self.mesh if use_shard_map else None,
            state_specs=state_specs,
        )
        # optional f32 val forward (validation.precision='fp32'): a compute-
        # dtype twin sharing the identical (f32) param tree; XLA path — the
        # Pallas kernels are bf16-internal and eval fwd perf is not critical
        val_model = self.model
        if cfg.validation.precision == "fp32" and t.precision != "fp32":
            val_model, _ = get_model(
                cfg.model.arch,
                not_original=bool(cfg.model.not_original),
                updated=bool(cfg.model.updated),
                num_classes=cfg.data.num_classes,
                dtype=jnp.float32,
                drop_path_rate=cfg.model.drop_path_rate,
                use_blurpool=bool(t.use_blurpool),
                add_normalization=bool(cfg.model.add_normalization),
                tp_attn=tp if tp > 1 else 0,
            )
        self.eval_step = make_eval_step(val_model, lr_tta=bool(cfg.validation.lr_tta))
        self.accum = accum

        # in-training adversarial validation + best-checkpoint tracking
        # (reference best_adv_weights intent, main.py:1069-1072)
        self.adv_eval_step = None
        self.best_adv_acc = -1.0
        if cfg.validation.adv_val_freq > 0:
            adv_val = AdvConfig(
                attack="apgd", norm=cfg.adv.norm, eps=cfg.adv.eps,
                n_iter=cfg.validation.adv_val_iter,
            )
            self.adv_eval_step = make_adv_eval_step(self.model, adv=adv_val)

        # logging & checkpoints; model.ckpt_path pointing at an existing run
        # dir means "resume that run in place" (true resume, SURVEY.md §5 gap)
        if cfg.model.ckpt_path:
            run_path = Path(cfg.model.ckpt_path)
            self.logger = RunLogger(str(run_path.parent), run_path.name)
        else:
            run_name = make_run_name(
                cfg.model.arch, cfg.adv.attack, cfg.model.not_original,
                cfg.model.updated, cfg.logging.addendum,
            )
            self.logger = RunLogger(cfg.logging.folder, run_name)
        cfg.dump_params_json(self.logger.dir / "params.json")
        self.ckpt = CheckpointManager(self.logger.dir, save_freq=cfg.logging.save_freq)
        self.start_epoch = 0

        init_record = {
            "event": "init",
            "arch": cfg.model.arch,
            "params": param_count(params),
            "devices": len(jax.devices()),
            "mesh": dict(self.mesh.shape),
            "iters_per_epoch": self.iters_per_epoch,
        }
        if cfg.misc.log_flops:
            # the reference's fvcore FLOP table at model build (main.py:846-854);
            # opt-in: costs one extra eval-mode compile on the tunnel
            from ..utils.flops import forward_flops

            init_record["forward_flops"] = forward_flops(
                self.model, {"params": params} if batch_stats is None
                else {"params": params, "batch_stats": batch_stats},
                input_shape=(1, res, res, 3),
            )
        self.logger.log(init_record)

    # ------------------------------------------------------------- resume
    def release_mesh(self) -> None:
        """Restore the global mesh context captured when dist.tp > 1.

        The train CLI never needs this (the process exits); in-process
        users (tests, notebooks) must call it before building another
        Trainer/jit on a different mesh, or every later trace sees this
        trainer's ("data","fsdp","model") mesh."""
        if self._mesh_ctx is not None:
            self._mesh_ctx.__exit__(None, None, None)
            self._mesh_ctx = None

    def try_resume(self) -> bool:
        restored = self.ckpt.restore_latest(self.state)
        if restored is None:
            return False
        self.state, epoch = restored
        self.start_epoch = epoch + 1
        self.logger.log({"event": "resume", "epoch": epoch})
        return True

    # ------------------------------------------------------------- batching
    def _put_batch(self, images, labels):
        """Place a PER-PROCESS batch onto the mesh. Under multi-host each
        process contributes its shard of the global batch, so in-step
        reductions (grad psum, val top1 sums) are GLOBAL — the torchmetrics
        dist_reduce_fx='sum' capability (reference main.py:1155-1167)."""
        images = jnp.asarray(images)
        labels = jnp.asarray(labels)
        if jax.process_count() > 1:
            images = jax.make_array_from_process_local_data(self.batch_sharding, images)
            labels = jax.make_array_from_process_local_data(self.batch_sharding, labels)
        else:
            images = jax.device_put(images, self.batch_sharding)
            labels = jax.device_put(labels, self.batch_sharding)
        return images, labels

    # ---------------------------------------------------------- validation
    def single_val(self) -> tuple[float, int]:
        """Clean accuracy on <=max_batches val batches (main.py:897-939).
        `correct` and `total` are global under multi-host: eval_step sums
        top1/top5 over the globally-sharded batch, and labels.shape[0] is
        the global batch size of the assembled array."""
        correct = 0
        correct5 = 0
        total = 0
        for i, (images, labels) in enumerate(self.val_data):
            images, labels = self._put_batch(images, labels)
            top1, top5 = self.eval_step(self.state, images, labels)
            correct += int(top1)
            correct5 += int(top5)
            total += labels.shape[0]
            if i + 1 >= self.cfg.validation.max_batches:
                break  # cap at max_batches processed (main.py:928-929)
        acc = correct / max(total, 1)
        self._last_top5 = correct5 / max(total, 1)
        return acc, total

    def adv_val(self, epoch: int) -> tuple[float, int]:
        """Quick APGD-CE robust accuracy on a few val batches."""
        assert self.adv_eval_step is not None
        rng = jax.random.fold_in(
            jax.random.PRNGKey(self.cfg.training.seed + 7), epoch
        )
        correct = 0
        total = 0
        for i, (images, labels) in enumerate(self.val_data):
            images, labels = self._put_batch(images, labels)
            correct += int(
                self.adv_eval_step(self.state, images, labels,
                                   jax.random.fold_in(rng, i))
            )
            total += labels.shape[0]
            if i + 1 >= self.cfg.validation.adv_val_batches:
                break
        return correct / max(total, 1), total

    # ------------------------------------------------------------ training
    def train_loop(self, epoch: int) -> float:
        losses = []
        profile_steps = self.cfg.misc.profile_steps if epoch == self.start_epoch else 0
        log_every = int(self.cfg.logging.log_every_steps)
        window_t0 = time.time()
        for ix, (images, labels) in enumerate(self.train_data):
            if profile_steps and ix == 1:  # skip the compile step
                jax.profiler.start_trace(str(self.logger.dir / "trace"))
            if profile_steps and ix == 1 + profile_steps:
                jax.block_until_ready(self.state.params)
                jax.profiler.stop_trace()
                self.logger.log({"event": "trace_written",
                                 "dir": str(self.logger.dir / "trace")})
                profile_steps = 0
            # RandAugment/erasing run INSIDE the fused train step (on device)
            images, labels = self._put_batch(images, labels)
            if ix == 0 and epoch == self.start_epoch:
                # first call compiles: retry transient tunnel failures (the
                # failure precedes execution, so donated buffers are intact)
                self.state, metrics = retry_transient(
                    lambda: self.train_step(self.state, images, labels),
                    # the step donates state: never retry once those
                    # buffers were consumed (runtime-flavored transients)
                    should_retry=lambda: buffers_intact(self.state, images, labels),
                    on_retry=lambda a, e: self.logger.log(
                        {"event": "compile_retry", "attempt": a, "error": str(e)[:200]}
                    ),
                )
            else:
                self.state, metrics = self.train_step(self.state, images, labels)
            losses.append(metrics["loss"])
            if log_every and (ix + 1) % log_every == 0:
                # one device sync per record (reference prints per-iter
                # lr/loss, main.py:1002-1017)
                now = time.time()
                self.logger.log({
                    "event": "step",
                    "epoch": epoch,
                    "step": int(self.state.step),
                    "loss": float(metrics["loss"]),
                    "lr": float(self.lr_schedule(int(self.state.step) // self.accum)),
                    "imgs_per_s": log_every * labels.shape[0] / max(now - window_t0, 1e-9),
                })
                window_t0 = time.time()
        mean_loss = float(jnp.mean(jnp.stack(losses)))
        return mean_loss

    def train(self) -> None:
        cfg = self.cfg
        # first eval_step call compiles over the tunnel: retry transients
        acc, n = retry_transient(self.single_val)
        self.logger.log({"Validation acc": acc, "top5": self._last_top5, "points": n})

        for epoch in range(self.start_epoch, cfg.training.epochs):
            res = get_resolution(
                epoch, cfg.resolution.min_res, cfg.resolution.max_res,
                cfg.resolution.start_ramp, cfg.resolution.end_ramp,
            )
            if res != self.res and self.train_data_factory is not None:
                self.logger.log({"event": "resolution_change", "res": res})
                self.train_data = self.train_data_factory(res)
                self.res = res
            t0 = time.time()
            train_loss = self.train_loop(epoch)
            epoch_time = time.time() - t0

            if math.isnan(train_loss):
                self.logger.log({"event": "nan_loss", "epoch": epoch})
                sys.exit(1)

            # the schedule advances per OPTIMIZER step: index with
            # step // grad_accum (optax.MultiSteps applies every k micro-steps)
            lr_now = float(self.lr_schedule(int(self.state.step) // self.accum))
            self.logger.log(
                {
                    "epoch": epoch,
                    "train_loss": train_loss,
                    "current_lr": lr_now,
                    "epoch_time": epoch_time,
                    "steps_per_sec": self.iters_per_epoch / max(epoch_time, 1e-9),
                }
            )
            last = epoch == cfg.training.epochs - 1
            self.ckpt.maybe_save(epoch, self.state, last=last)

            freq = cfg.validation.adv_val_freq
            if self.adv_eval_step is not None and ((epoch + 1) % freq == 0 or last):
                adv_acc, n_adv = self.adv_val(epoch)
                self.logger.log({"event": "adv_val", "epoch": epoch,
                                 "adv_acc": adv_acc, "points": n_adv})
                if adv_acc > self.best_adv_acc:
                    self.best_adv_acc = adv_acc
                    self.ckpt.save_best(epoch, self.state)
                    self.logger.log({"event": "best_adv", "epoch": epoch,
                                     "adv_acc": adv_acc})

        acc, n = self.single_val()
        self.logger.log({"event": "final_val", "Validation acc": acc,
                         "top5": self._last_top5, "points": n})
        self.ckpt.wait()
