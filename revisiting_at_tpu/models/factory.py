"""Model factory — name → Flax module (+ metadata).

Capability parity with the reference `get_new_model`
(utils_architecture.py:225-322): same model names, same `not_original`
(ConvStem swap) and `updated` (iso 432-dim stem) semantics, same ConvStem
wiring:

  convnext_tiny/small  + not_original -> ConvStem1(48)
  convnext_base        + not_original -> ConvStem3(64)
  convnext_large       + not_original -> ConvStem3(96)
  convnext_iso         + not_original -> ConvStem(48, 8, fin 432 if updated else 384)
  vit_s / deit_s       + not_original -> ConvStem(48, 8)   [384]
  vit_m (deit3-medium) + not_original -> ConvStem2(48)     [512]
  vit_b                + not_original -> ConvStem(48, 16, fin_dim=None -> 768)

`normalize_model` prepends the ImageNormalizer so attacks stay in [0,1]
pixel space (utils_architecture.py:111-117; note the paper recipe trains
with add_normalization=0, run_train.sh:15).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .convnext import CONVNEXT_CFGS, ConvNeXt, ConvNeXtIsotropic
from .layers import NormalizedModel
from .resnet import RESNET_CFGS, ResNet
from .stems import ConvStem, ConvStem1, ConvStem2, ConvStem3
from .vit import VIT_CFGS, VisionTransformer

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class ModelMeta:
    name: str
    family: str  # 'convnext' | 'vit' | 'resnet' — drives the WD-exclusion rule
    has_batch_stats: bool = False
    patch_size: int = 16  # for pos-embed interpolation on ViTs


def get_model(
    name: str,
    *,
    not_original: bool = False,
    updated: bool = False,
    num_classes: int = 1000,
    dtype: Any = jnp.bfloat16,
    drop_path_rate: float = 0.0,
    use_blurpool: bool = False,
    add_normalization: bool = False,
    remat: bool = False,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    tp_attn: int = 0,  # ViT attention-head TP (parallel/tp.py; vit families only)
    attn_impl: str = "qkv",  # ViT fused-attention kernel version (models/vit.py Attention)
    stem_s2d: bool = False,  # ConvStem stride-2 convs via space-to-depth (ops/stem_conv.py)
    # fused-tail FULL backward past C=512 (ops/block_mlp.py::tail_fusable).
    # None = auto: ON for convnext_large only — the round-5 TRUE A/B
    # (queue18, after fixing the forwarding bug that made the knob a no-op
    # on hierarchical ConvNeXt): L@224 AT 674.8 -> 604.5 ms (-10.4%, the
    # 27 C=768 stage-2 blocks), B@224 305.4 -> 305.4 (dead neutral: only
    # 3 C=1024 blocks and accumulator-starved tiles), ViT-B neutral-
    # negative (230.8 -> 232.6). PROFILE.md round-5 has the full story,
    # including the retraction of the r4 stale-control "A/B".
    wide_tail: bool | None = None,
    # two-kernel full backward for the fused tail (VERDICT r4 item#5 A/B;
    # ops/block_mlp.py::_bwd_split)
    split_bwd: bool = False,
) -> tuple[nn.Module, ModelMeta]:
    """Build a model by reference name. Returns (module, meta).

    The module's signature is `module(x, train=False)` with NHWC [0,1] inputs.
    """
    if wide_tail is None:
        wide_tail = name == "convnext_large"
    common = dict(num_classes=num_classes, dtype=dtype, use_blurpool=use_blurpool)
    meta = None

    if name in ("convnext_tiny", "convnext_small", "convnext_base", "convnext_large",
                "convnext_tiny_21k"):
        size = name.replace("convnext_", "").replace("_21k", "")
        cfg = CONVNEXT_CFGS[size]
        stem = None
        if not_original and name != "convnext_tiny_21k":
            if size in ("tiny", "small"):
                stem = partial(ConvStem1, siz=48, s2d=stem_s2d)
            elif size == "base":
                stem = partial(ConvStem3, siz=64, s2d=stem_s2d)
            elif size == "large":
                stem = partial(ConvStem3, siz=96, s2d=stem_s2d)
        model = ConvNeXt(
            depths=cfg["depths"], dims=cfg["dims"], stem_factory=stem,
            drop_path_rate=drop_path_rate, remat=remat, use_pallas=use_pallas, pallas_interpret=pallas_interpret, wide_tail=wide_tail, split_bwd=split_bwd, **common,
        )
        meta = ModelMeta(name, "convnext")

    elif name == "convnext_iso":
        stem = None
        if not_original:
            stem = partial(ConvStem, siz=48, end_siz=8, fin_dim=432 if updated else 384, s2d=stem_s2d)
        model = ConvNeXtIsotropic(
            dim=432 if updated else 384, depth=18, stem_factory=stem,
            drop_path_rate=drop_path_rate, remat=remat, use_pallas=use_pallas, pallas_interpret=pallas_interpret, wide_tail=wide_tail, split_bwd=split_bwd, **common,
        )
        meta = ModelMeta(name, "convnext")

    elif name in ("vit_s", "deit_s", "vit_s_21k"):
        cfg = dict(VIT_CFGS["s"])
        embed = partial(ConvStem, siz=48, end_siz=8, s2d=stem_s2d) if not_original else None
        model = VisionTransformer(
            embed_factory=embed, drop_path_rate=drop_path_rate, remat=remat,
            use_pallas=use_pallas, pallas_interpret=pallas_interpret,
            tp_attn=tp_attn, attn_impl=attn_impl, wide_tail=wide_tail, split_bwd=split_bwd, **cfg, **common
        )
        meta = ModelMeta(name, "vit")

    elif name == "vit_m":
        cfg = dict(VIT_CFGS["m"])
        embed = partial(ConvStem2, siz=48, s2d=stem_s2d) if not_original else None
        model = VisionTransformer(
            embed_factory=embed, drop_path_rate=drop_path_rate, remat=remat,
            use_pallas=use_pallas, pallas_interpret=pallas_interpret,
            tp_attn=tp_attn, attn_impl=attn_impl, wide_tail=wide_tail, split_bwd=split_bwd, **cfg, **common
        )
        meta = ModelMeta(name, "vit")

    elif name == "vit_b":
        cfg = dict(VIT_CFGS["b"])
        embed = partial(ConvStem, siz=48, end_siz=16, fin_dim=None, s2d=stem_s2d) if not_original else None
        model = VisionTransformer(
            embed_factory=embed, drop_path_rate=drop_path_rate, remat=remat,
            use_pallas=use_pallas, pallas_interpret=pallas_interpret,
            tp_attn=tp_attn, attn_impl=attn_impl, wide_tail=wide_tail, split_bwd=split_bwd, **cfg, **common
        )
        meta = ModelMeta(name, "vit")

    elif name == "convnext_micro":
        # framework-native smoke-test model (not in the reference zoo):
        # same topology as convnext_tiny at 1/6 width, 4 blocks
        stem = partial(ConvStem1, siz=8, s2d=stem_s2d) if not_original else None
        model = ConvNeXt(
            depths=(1, 1, 1, 1), dims=(16, 32, 64, 128), stem_factory=stem,
            drop_path_rate=drop_path_rate, remat=remat, use_pallas=use_pallas, pallas_interpret=pallas_interpret, wide_tail=wide_tail, split_bwd=split_bwd, **common,
        )
        meta = ModelMeta(name, "convnext")

    elif name == "vit_micro":
        # framework-native smoke-test model (not in the reference zoo)
        embed = partial(ConvStem, siz=4, end_siz=8, s2d=stem_s2d) if not_original else None
        model = VisionTransformer(
            embed_dim=32, depth=2, num_heads=2, embed_factory=embed,
            drop_path_rate=drop_path_rate, use_pallas=use_pallas,
            pallas_interpret=pallas_interpret, tp_attn=tp_attn,
            attn_impl=attn_impl, split_bwd=split_bwd, **common,
        )
        meta = ModelMeta(name, "vit")

    elif name in ("resnet50", "resnet50_gelu", "resnet101", "wrn_50_2"):
        key = "resnet50" if name.startswith("resnet50") else name
        cfg = RESNET_CFGS[key]
        act = nn.gelu if name.endswith("gelu") else nn.relu
        model = ResNet(
            stage_sizes=cfg["stage_sizes"], width_factor=cfg["width_factor"],
            act=act, num_classes=num_classes, dtype=dtype,
        )
        meta = ModelMeta(name, "resnet", has_batch_stats=True)

    elif name == "densnet201":  # reference spelling (utils_architecture.py:310)
        from .densenet import DenseNet

        model = DenseNet(num_classes=num_classes, dtype=dtype)
        meta = ModelMeta(name, "resnet", has_batch_stats=True)  # BN family rule

    elif name == "inception":
        from .inception import InceptionV3

        model = InceptionV3(num_classes=num_classes, dtype=dtype)
        meta = ModelMeta(name, "resnet", has_batch_stats=True)

    else:
        raise ValueError(f"unknown model {name!r}; available: {', '.join(list_models())}")

    if add_normalization and name != "convnext_tiny_21k":
        model = NormalizedModel(model, IMAGENET_MEAN, IMAGENET_STD)

    return model, meta


def list_models() -> Sequence[str]:
    return (
        "convnext_tiny", "convnext_small", "convnext_base", "convnext_large",
        "convnext_iso", "convnext_tiny_21k", "vit_s", "deit_s", "vit_s_21k",
        "vit_m", "vit_b", "resnet50", "resnet50_gelu", "resnet101", "wrn_50_2",
        "densnet201", "inception", "convnext_micro", "vit_micro",
    )
