"""Import published PyTorch checkpoints (the reference's timm models) into
our Flax param trees — the eval-parity bridge.

The reference saves raw timm state_dicts with optional 'module.' (DDP) and
'base_model.' (WrappedModel) prefixes, handled by a strip cascade
(main.py:856-872, AA_eval.py:185-189). This module reproduces that prefix
handling and maps timm-0.8 parameter names/layouts to ours:

  torch Linear  [out, in]      -> kernel [in, out]
  torch Conv2d  [O, I, kh, kw] -> kernel [kh, kw, I, O]  (NHWC HWIO)
  depthwise     [C, 1, 7, 7]   -> kernel [7, 7, 1, C]

Covered: timm ConvNeXt (T/S/B/L) incl. the ConvStem variants, Meta-layout
isotropic ConvNeXt (the reference's convnext_iso format,
models/convnext_iso.py), timm ViT (vit_s/deit_s/vit_m/vit_b) incl.
ConvStem patch embeds.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def strip_prefixes(sd: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """The reference's prefix cascade: drop 'module.' and 'base_model.',
    skip the normalizer buffers ('normalize.mean/std') and 'model.' wrapper."""
    out = {}
    for k, v in sd.items():
        k = k.replace("module.", "").replace("base_model.", "")
        if k.startswith("model."):
            k = k[len("model."):]
        if k.startswith("normalize."):
            continue
        out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
    return out


def _conv(w):  # [O, I, kh, kw] -> [kh, kw, I, O]
    return np.transpose(w, (2, 3, 1, 0))


def _dwconv(w):  # [C, 1, kh, kw] -> [kh, kw, 1, C]
    return np.transpose(w, (2, 3, 1, 0))


def _lin(w):  # [out, in] -> [in, out]
    return np.transpose(w, (1, 0))


def _convstem_entries(sd, torch_prefix, flax_prefix, out):
    """Reference ConvBlock/1/2/3: Sequential under '<prefix>.stem.<i>' with
    convs at even-ish indices and LNs after (utils_architecture.py:120-217).
    Our ConvStem modules name them conv{i}/norm{i} in order, plus 'proj' for
    the final 1x1 (ConvBlock/ConvBlock2)."""
    seq_prefix = torch_prefix + ".stem."
    idxs = sorted(
        {int(k[len(seq_prefix):].split(".")[0])
         for k in sd if k.startswith(seq_prefix)}
    )
    conv_i = 0
    norm_i = 0
    layers = []
    for i in idxs:
        w = sd[f"{torch_prefix}.stem.{i}.weight"]
        if w.ndim == 4:
            layers.append(("conv", i))
        elif w.ndim == 1:
            layers.append(("norm", i))
    # the trailing 1x1 conv (if any) maps to 'proj'
    n_convs = sum(1 for t, _ in layers if t == "conv")
    n_norms = sum(1 for t, _ in layers if t == "norm")
    has_proj = n_convs > n_norms
    seen_convs = 0
    for t, i in layers:
        if t == "conv":
            seen_convs += 1
            is_proj = has_proj and seen_convs == n_convs
            name = "proj" if is_proj else f"conv{conv_i}"
            if not is_proj:
                conv_i += 1
            dst = f"{flax_prefix}/{name}" + ("" if is_proj else "/Conv_0")
            # ConvStem wraps convs in our Conv module (submodule Conv_0);
            # proj is a bare Conv as well
            if is_proj:
                dst = f"{flax_prefix}/proj/Conv_0"
            out[f"{dst}/kernel"] = _conv(sd[f"{torch_prefix}.stem.{i}.weight"])
            out[f"{dst}/bias"] = sd[f"{torch_prefix}.stem.{i}.bias"]
        else:
            dst = f"{flax_prefix}/norm{norm_i}/LayerNorm_0"
            norm_i += 1
            out[f"{dst}/scale"] = sd[f"{torch_prefix}.stem.{i}.weight"]
            out[f"{dst}/bias"] = sd[f"{torch_prefix}.stem.{i}.bias"]


def convnext_from_torch(sd: Mapping[str, Any], *, not_original: bool = False,
                        stem_module: str = "ConvStem1_0") -> dict[str, np.ndarray]:
    """timm ConvNeXt state_dict -> flat {'a/b/c': array} for our ConvNeXt."""
    sd = strip_prefixes(sd)
    out: dict[str, np.ndarray] = {}

    if not_original:
        _convstem_entries(sd, "stem", stem_module, out)
    else:
        out["stem/proj/Conv_0/kernel"] = _conv(sd["stem.0.weight"])
        out["stem/proj/Conv_0/bias"] = sd["stem.0.bias"]
        out["stem/norm/LayerNorm_0/scale"] = sd["stem.1.weight"]
        out["stem/norm/LayerNorm_0/bias"] = sd["stem.1.bias"]

    # stages/blocks (timm-0.8 naming: conv_dw, norm, mlp.fc1/fc2, gamma)
    block_keys = [k for k in sd if k.startswith("stages.")]
    stages = sorted({int(k.split(".")[1]) for k in block_keys})
    for s in stages:
        # downsample (stages>0): stages.s.downsample.0 = LN, .1 = conv
        if f"stages.{s}.downsample.0.weight" in sd:
            out[f"downsample_norm{s}/LayerNorm_0/scale"] = sd[f"stages.{s}.downsample.0.weight"]
            out[f"downsample_norm{s}/LayerNorm_0/bias"] = sd[f"stages.{s}.downsample.0.bias"]
            out[f"downsample_conv{s}/Conv_0/kernel"] = _conv(sd[f"stages.{s}.downsample.1.weight"])
            out[f"downsample_conv{s}/Conv_0/bias"] = sd[f"stages.{s}.downsample.1.bias"]
        blocks = sorted(
            {int(k.split(".")[3]) for k in block_keys if k.startswith(f"stages.{s}.blocks.")}
        )
        for b in blocks:
            src = f"stages.{s}.blocks.{b}"
            dst = f"stage{s}_block{b}"
            out[f"{dst}/dwconv_kernel"] = _dwconv(sd[f"{src}.conv_dw.weight"])
            out[f"{dst}/dwconv_bias"] = sd[f"{src}.conv_dw.bias"]
            out[f"{dst}/norm_scale"] = sd[f"{src}.norm.weight"]
            out[f"{dst}/norm_bias"] = sd[f"{src}.norm.bias"]
            out[f"{dst}/pwconv1_kernel"] = _lin(sd[f"{src}.mlp.fc1.weight"])
            out[f"{dst}/pwconv1_bias"] = sd[f"{src}.mlp.fc1.bias"]
            out[f"{dst}/pwconv2_kernel"] = _lin(sd[f"{src}.mlp.fc2.weight"])
            out[f"{dst}/pwconv2_bias"] = sd[f"{src}.mlp.fc2.bias"]
            if f"{src}.gamma" in sd:
                out[f"{dst}/gamma"] = sd[f"{src}.gamma"]

    # head: timm convnext head.norm + head.fc (0.8 naming: head.norm, head.fc)
    hn = "head.norm" if "head.norm.weight" in sd else "norm"
    out["head_norm/LayerNorm_0/scale"] = sd[f"{hn}.weight"]
    out["head_norm/LayerNorm_0/bias"] = sd[f"{hn}.bias"]
    hf = "head.fc" if "head.fc.weight" in sd else "head"
    out["head/kernel"] = _lin(sd[f"{hf}.weight"])
    out["head/bias"] = sd[f"{hf}.bias"]
    return out


def convnext_iso_from_torch(sd: Mapping[str, Any], *, not_original: bool = False,
                            embed_module: str = "ConvStem_0") -> dict[str, np.ndarray]:
    """Isotropic ConvNeXt state_dict -> flat params for our ConvNeXtIsotropic.

    The reference's iso model is Meta-layout, NOT timm (models/convnext_iso.py:
    bare 16x16 `stem` conv, flat `blocks.{i}` with dwconv/norm/pwconv1/pwconv2
    [+ optional gamma], final `norm`, `head`); its ConvStem variant mounts
    ConvBlock at `stem` (utils_architecture.py:235-238 — the README.md:32
    iso-CvSt checkpoint's format)."""
    sd = strip_prefixes(sd)
    out: dict[str, np.ndarray] = {}
    if not_original:
        _convstem_entries(sd, "stem", embed_module, out)
    else:
        out["stem/Conv_0/kernel"] = _conv(sd["stem.weight"])
        out["stem/Conv_0/bias"] = sd["stem.bias"]
    depth = max(int(k.split(".")[1]) for k in sd if k.startswith("blocks.")) + 1
    for i in range(depth):
        src, dst = f"blocks.{i}", f"block{i}"
        out[f"{dst}/dwconv_kernel"] = _dwconv(sd[f"{src}.dwconv.weight"])
        out[f"{dst}/dwconv_bias"] = sd[f"{src}.dwconv.bias"]
        out[f"{dst}/norm_scale"] = sd[f"{src}.norm.weight"]
        out[f"{dst}/norm_bias"] = sd[f"{src}.norm.bias"]
        out[f"{dst}/pwconv1_kernel"] = _lin(sd[f"{src}.pwconv1.weight"])
        out[f"{dst}/pwconv1_bias"] = sd[f"{src}.pwconv1.bias"]
        out[f"{dst}/pwconv2_kernel"] = _lin(sd[f"{src}.pwconv2.weight"])
        out[f"{dst}/pwconv2_bias"] = sd[f"{src}.pwconv2.bias"]
        if f"{src}.gamma" in sd:
            out[f"{dst}/gamma"] = sd[f"{src}.gamma"]
    out["head_norm/LayerNorm_0/scale"] = sd["norm.weight"]
    out["head_norm/LayerNorm_0/bias"] = sd["norm.bias"]
    out["head/kernel"] = _lin(sd["head.weight"])
    out["head/bias"] = sd["head.bias"]
    return out


def vit_from_torch(sd: Mapping[str, Any], *, not_original: bool = False,
                   embed_module: str = "ConvStem_0") -> dict[str, np.ndarray]:
    """timm VisionTransformer state_dict -> flat params for our ViT."""
    sd = strip_prefixes(sd)
    out: dict[str, np.ndarray] = {}
    out["cls_token"] = sd["cls_token"]
    out["pos_embed"] = sd["pos_embed"]

    if not_original:
        _convstem_entries(sd, "patch_embed.proj", embed_module, out)
    else:
        out["patch_embed/proj/Conv_0/kernel"] = _conv(sd["patch_embed.proj.weight"])
        out["patch_embed/proj/Conv_0/bias"] = sd["patch_embed.proj.bias"]

    depth = max(int(k.split(".")[1]) for k in sd if k.startswith("blocks.")) + 1
    for i in range(depth):
        src = f"blocks.{i}"
        dst = f"block{i}"
        out[f"{dst}/norm1/LayerNorm_0/scale"] = sd[f"{src}.norm1.weight"]
        out[f"{dst}/norm1/LayerNorm_0/bias"] = sd[f"{src}.norm1.bias"]
        out[f"{dst}/attn/qkv/kernel"] = _lin(sd[f"{src}.attn.qkv.weight"])
        out[f"{dst}/attn/qkv/bias"] = sd[f"{src}.attn.qkv.bias"]
        out[f"{dst}/attn/proj/kernel"] = _lin(sd[f"{src}.attn.proj.weight"])
        out[f"{dst}/attn/proj/bias"] = sd[f"{src}.attn.proj.bias"]
        out[f"{dst}/norm2/LayerNorm_0/scale"] = sd[f"{src}.norm2.weight"]
        out[f"{dst}/norm2/LayerNorm_0/bias"] = sd[f"{src}.norm2.bias"]
        out[f"{dst}/mlp/fc1/kernel"] = _lin(sd[f"{src}.mlp.fc1.weight"])
        out[f"{dst}/mlp/fc1/bias"] = sd[f"{src}.mlp.fc1.bias"]
        out[f"{dst}/mlp/fc2/kernel"] = _lin(sd[f"{src}.mlp.fc2.weight"])
        out[f"{dst}/mlp/fc2/bias"] = sd[f"{src}.mlp.fc2.bias"]
        if f"{src}.ls1.gamma" in sd:  # DeiT3 LayerScale
            out[f"{dst}/ls1"] = sd[f"{src}.ls1.gamma"]
            out[f"{dst}/ls2"] = sd[f"{src}.ls2.gamma"]
    out["norm/LayerNorm_0/scale"] = sd["norm.weight"]
    out["norm/LayerNorm_0/bias"] = sd["norm.bias"]
    out["head/kernel"] = _lin(sd["head.weight"])
    out["head/bias"] = sd["head.bias"]
    return out


def resnet_from_torch(
    sd: Mapping[str, Any],
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """torchvision/timm ResNet-bottleneck state_dict (resnet50/101,
    wide_resnet50_2 — the reference's BN family,
    utils_architecture.py:303-308) -> (flat params, flat batch_stats) for
    our models/resnet.py tree.

    torch `layer{L}.{b}` maps to `stage{L-1}_block{b}`; each BatchNorm
    splits into params {scale, bias} and batch_stats {mean, var};
    `num_batches_tracked` buffers are dropped."""
    sd = strip_prefixes(sd)
    params: dict[str, np.ndarray] = {}
    stats: dict[str, np.ndarray] = {}

    def bn(src: str, dst: str) -> None:
        params[f"{dst}/scale"] = sd[f"{src}.weight"]
        params[f"{dst}/bias"] = sd[f"{src}.bias"]
        stats[f"{dst}/mean"] = sd[f"{src}.running_mean"]
        stats[f"{dst}/var"] = sd[f"{src}.running_var"]

    params["conv1/kernel"] = _conv(sd["conv1.weight"])
    bn("bn1", "bn1")

    layers = sorted(
        {int(k.split(".")[0][len("layer"):]) for k in sd if k.startswith("layer")}
    )
    for L in layers:
        blocks = sorted({int(k.split(".")[1]) for k in sd if k.startswith(f"layer{L}.")})
        for b in blocks:
            src = f"layer{L}.{b}"
            dst = f"stage{L - 1}_block{b}"
            for i in (1, 2, 3):
                params[f"{dst}/conv{i}/kernel"] = _conv(sd[f"{src}.conv{i}.weight"])
                bn(f"{src}.bn{i}", f"{dst}/bn{i}")
            if f"{src}.downsample.0.weight" in sd:
                params[f"{dst}/downsample_conv/kernel"] = _conv(
                    sd[f"{src}.downsample.0.weight"]
                )
                bn(f"{src}.downsample.1", f"{dst}/downsample_bn")

    params["fc/kernel"] = _lin(sd["fc.weight"])
    params["fc/bias"] = sd["fc.bias"]
    return params, stats


def densenet_from_torch(
    sd: Mapping[str, Any],
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """timm/torchvision DenseNet state_dict (the reference's 'densnet201',
    utils_architecture.py:310-311) -> (flat params, flat batch_stats) for
    models/densenet.py.

    `features.denseblock{B}.denselayer{L}` maps to `block{B-1}_layer{L-1}`,
    `features.transition{T}` to `transition{T-1}_*`, `features.norm5` to
    `norm_final`; `num_batches_tracked` buffers are dropped."""
    sd = strip_prefixes(sd)
    params: dict[str, np.ndarray] = {}
    stats: dict[str, np.ndarray] = {}

    def bn(src: str, dst: str) -> None:
        params[f"{dst}/scale"] = sd[f"{src}.weight"]
        params[f"{dst}/bias"] = sd[f"{src}.bias"]
        stats[f"{dst}/mean"] = sd[f"{src}.running_mean"]
        stats[f"{dst}/var"] = sd[f"{src}.running_var"]

    params["conv0/kernel"] = _conv(sd["features.conv0.weight"])
    bn("features.norm0", "norm0")

    blocks = sorted(
        {int(k.split(".")[1][len("denseblock"):])
         for k in sd if k.startswith("features.denseblock")}
    )
    for B in blocks:
        layers = sorted(
            {int(k.split(".")[2][len("denselayer"):])
             for k in sd if k.startswith(f"features.denseblock{B}.")}
        )
        for L in layers:
            src = f"features.denseblock{B}.denselayer{L}"
            dst = f"block{B - 1}_layer{L - 1}"
            bn(f"{src}.norm1", f"{dst}/norm1")
            params[f"{dst}/conv1/kernel"] = _conv(sd[f"{src}.conv1.weight"])
            bn(f"{src}.norm2", f"{dst}/norm2")
            params[f"{dst}/conv2/kernel"] = _conv(sd[f"{src}.conv2.weight"])
        if f"features.transition{B}.conv.weight" in sd:
            bn(f"features.transition{B}.norm", f"transition{B - 1}_norm")
            params[f"transition{B - 1}_conv/kernel"] = _conv(
                sd[f"features.transition{B}.conv.weight"]
            )

    bn("features.norm5", "norm_final")
    params["classifier/kernel"] = _lin(sd["classifier.weight"])
    params["classifier/bias"] = sd["classifier.bias"]
    return params, stats


# torchvision/timm inception_v3 branch names per block type -> our
# models/inception.py branch names (the same BasicConv conv/bn pair inside)
_INC_STEM = {
    "Conv2d_1a_3x3": "Conv2d_1a", "Conv2d_2a_3x3": "Conv2d_2a",
    "Conv2d_2b_3x3": "Conv2d_2b", "Conv2d_3b_1x1": "Conv2d_3b",
    "Conv2d_4a_3x3": "Conv2d_4a",
}
_INC_A = {
    "branch1x1": "b1x1", "branch5x5_1": "b5_1", "branch5x5_2": "b5_2",
    "branch3x3dbl_1": "b3_1", "branch3x3dbl_2": "b3_2",
    "branch3x3dbl_3": "b3_3", "branch_pool": "bpool",
}
_INC_B = {
    "branch3x3": "b3", "branch3x3dbl_1": "bd_1", "branch3x3dbl_2": "bd_2",
    "branch3x3dbl_3": "bd_3",
}
_INC_C = {
    "branch1x1": "b1x1", "branch7x7_1": "b7_1", "branch7x7_2": "b7_2",
    "branch7x7_3": "b7_3", "branch7x7dbl_1": "bd_1", "branch7x7dbl_2": "bd_2",
    "branch7x7dbl_3": "bd_3", "branch7x7dbl_4": "bd_4",
    "branch7x7dbl_5": "bd_5", "branch_pool": "bpool",
}
_INC_D = {
    "branch3x3_1": "b3_1", "branch3x3_2": "b3_2", "branch7x7x3_1": "b7_1",
    "branch7x7x3_2": "b7_2", "branch7x7x3_3": "b7_3", "branch7x7x3_4": "b7_4",
}
_INC_E = {
    "branch1x1": "b1x1", "branch3x3_1": "b3_1", "branch3x3_2a": "b3_2a",
    "branch3x3_2b": "b3_2b", "branch3x3dbl_1": "bd_1",
    "branch3x3dbl_2": "bd_2", "branch3x3dbl_3a": "bd_3a",
    "branch3x3dbl_3b": "bd_3b", "branch_pool": "bpool",
}
_INC_BLOCKS = {
    "Mixed_5b": _INC_A, "Mixed_5c": _INC_A, "Mixed_5d": _INC_A,
    "Mixed_6a": _INC_B, "Mixed_6b": _INC_C, "Mixed_6c": _INC_C,
    "Mixed_6d": _INC_C, "Mixed_6e": _INC_C, "Mixed_7a": _INC_D,
    "Mixed_7b": _INC_E, "Mixed_7c": _INC_E,
}


def inception_from_torch(
    sd: Mapping[str, Any],
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """torchvision/timm inception_v3 state_dict (the reference's 'inception',
    utils_architecture.py:313-314) -> (flat params, flat batch_stats) for
    models/inception.py. The training-time aux classifier (`AuxLogits.*`) is
    dropped — the reference never uses it for AT."""
    sd = strip_prefixes(sd)
    params: dict[str, np.ndarray] = {}
    stats: dict[str, np.ndarray] = {}

    def basic_conv(src: str, dst: str) -> None:
        params[f"{dst}/conv/kernel"] = _conv(sd[f"{src}.conv.weight"])
        params[f"{dst}/bn/scale"] = sd[f"{src}.bn.weight"]
        params[f"{dst}/bn/bias"] = sd[f"{src}.bn.bias"]
        stats[f"{dst}/bn/mean"] = sd[f"{src}.bn.running_mean"]
        stats[f"{dst}/bn/var"] = sd[f"{src}.bn.running_var"]

    for src, dst in _INC_STEM.items():
        basic_conv(src, dst)
    for block, branches in _INC_BLOCKS.items():
        for src, dst in branches.items():
            basic_conv(f"{block}.{src}", f"{block}/{dst}")
    params["fc/kernel"] = _lin(sd["fc.weight"])
    params["fc/bias"] = sd["fc.bias"]
    return params, stats


# BN-family arch -> (params, batch_stats) mapper; single source of truth for
# both loaders below (the reference zoo at utils_architecture.py:303-322 —
# 'densnet201' keeps the reference's spelling)
BN_MAPPERS = {
    "resnet50": resnet_from_torch, "resnet50_gelu": resnet_from_torch,
    "resnet101": resnet_from_torch, "wrn_50_2": resnet_from_torch,
    "densnet201": densenet_from_torch, "inception": inception_from_torch,
}


def to_param_tree(flat: dict[str, np.ndarray], target_params: Any) -> Any:
    """Unflatten {'a/b/c': arr} into the structure of `target_params`,
    verifying every target leaf is covered and shapes match."""
    import flax
    import jax.numpy as jnp

    tgt_flat = flax.traverse_util.flatten_dict(target_params, sep="/")
    missing = sorted(set(tgt_flat) - set(flat))
    extra = sorted(set(flat) - set(tgt_flat))
    if missing or extra:
        raise ValueError(f"param mismatch: missing={missing[:6]} extra={extra[:6]}")
    out = {}
    for k, tgt in tgt_flat.items():
        v = flat[k]
        if tuple(v.shape) != tuple(tgt.shape):
            v = v.reshape(tgt.shape)
        out[k] = jnp.asarray(v, tgt.dtype)
    return flax.traverse_util.unflatten_dict(out, sep="/")


def merge_param_tree(flat: dict[str, np.ndarray], target_params: Any) -> tuple[Any, dict]:
    """Partial merge: overwrite target leaves present in `flat` (with shape
    check), keep the rest at their current (random-init) values. Returns
    (params, report{loaded, kept_random, dropped_source}).

    This is the pretrained-init semantic of the reference: timm weights load
    the backbone, then `not_original` replaces the stem with a FRESH random
    ConvStem (utils_architecture.py:242-251) — so a pretrained init must
    tolerate target keys with no source counterpart and vice versa."""
    import flax
    import jax.numpy as jnp

    tgt_flat = flax.traverse_util.flatten_dict(target_params, sep="/")
    out = {}
    loaded, kept, shape_mismatch = [], [], []
    for k, tgt in tgt_flat.items():
        v = flat.get(k)
        # exact shape equality: the mappers emit target-layout arrays, so a
        # size-equal/shape-unequal leaf means a transposed matrix slipped
        # through a partial mapper — keep the random init instead of loading
        # silently corrupted weights
        if v is not None and tuple(v.shape) == tuple(tgt.shape):
            out[k] = jnp.asarray(v, tgt.dtype)
            loaded.append(k)
        else:
            if v is not None:
                shape_mismatch.append((k, tuple(v.shape), tuple(tgt.shape)))
            out[k] = tgt
            kept.append(k)
    if shape_mismatch:
        import warnings

        warnings.warn(
            f"merge_param_tree: {len(shape_mismatch)} source leaves had "
            f"mismatched shapes and were kept random, e.g. {shape_mismatch[:3]}"
        )
    report = {
        "loaded": loaded,
        "kept_random": kept,
        "shape_mismatch": shape_mismatch,
        "dropped_source": sorted(set(flat) - set(tgt_flat)),
    }
    return flax.traverse_util.unflatten_dict(out, sep="/"), report


def load_timm_pretrained(path: str, model_name: str, target_params: Any,
                         target_batch_stats: Any = None) -> tuple[Any, dict]:
    """Initialize params from a LOCAL timm pretrained checkpoint.

    Reference semantics (`get_new_model(pretrained=True)`,
    utils_architecture.py:225-322): timm downloads ImageNet(-21k-ft-1k)
    weights at model build; with `not_original` the pretrained patchify stem
    is then discarded for a fresh random ConvStem. This environment has no
    network egress, so the weights must be a local file (timm .pt/.pth/.bin
    state_dict, optionally wrapped in {'model': ...} / {'state_dict': ...}).

    Returns (params, report). Raises if the file loads but nothing matches
    (wrong architecture). For the BN family pass `target_batch_stats`: the
    merged running-stats tree is returned as report['batch_stats'] (a
    pretrained BN model without its running stats is broken)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    for wrapper in ("model", "state_dict", "model_state_dict"):
        if isinstance(sd, dict) and wrapper in sd and isinstance(sd[wrapper], dict):
            sd = sd[wrapper]
    # map with the ORIGINAL stem layout: a pretrained timm checkpoint always
    # has the patchify stem; ConvStem targets simply keep their random init
    if model_name in BN_MAPPERS:
        try:
            flat, flat_stats = BN_MAPPERS[model_name](sd)
        except KeyError as e:
            raise ValueError(
                f"pretrained checkpoint {path} is missing key {e} expected "
                f"for {model_name} — wrong file or architecture"
            ) from e
        params, report = merge_param_tree(flat, target_params)
        if target_batch_stats is not None:
            stats, s_report = merge_param_tree(flat_stats, target_batch_stats)
            report["batch_stats"] = stats
            report["stats_kept_random"] = s_report["kept_random"]
        if not report["loaded"]:
            raise ValueError(
                f"pretrained checkpoint {path} matched no parameters of "
                f"{model_name} — wrong file or architecture"
            )
        return params, report
    if model_name == "convnext_iso":
        # iso is Meta-layout, not timm, and has no pretrained path in the
        # reference either (utils_architecture.py:235-239 commented out);
        # full reference-format checkpoints load via load_torch_checkpoint
        raise ValueError(
            "convnext_iso has no timm pretrained mapping (Meta layout) — "
            "use model.ckpt_path / --torch_ckpt for reference-format files"
        )
    if model_name.startswith("convnext"):
        flat = convnext_from_torch_partial(sd)
    elif model_name.startswith(("vit", "deit")):
        flat = vit_from_torch_partial(sd)
    else:
        raise ValueError(f"no timm pretrained mapping for {model_name!r}")
    params, report = merge_param_tree(flat, target_params)
    if not report["loaded"]:
        raise ValueError(
            f"pretrained checkpoint {path} matched no parameters of "
            f"{model_name} — wrong file or architecture"
        )
    return params, report


def convnext_from_torch_partial(sd: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Like convnext_from_torch but tolerant of missing keys (pretrained
    checkpoints may lack e.g. `gamma` or use other head namings)."""
    try:
        return convnext_from_torch(sd, not_original=False)
    except KeyError:
        pass
    # fall back: map key-by-key, skipping anything unknown
    sd = strip_prefixes(sd)
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k == "stem.0.weight":
            out["stem/proj/Conv_0/kernel"] = _conv(v)
        elif k == "stem.0.bias":
            out["stem/proj/Conv_0/bias"] = v
        elif k == "stem.1.weight":
            out["stem/norm/LayerNorm_0/scale"] = v
        elif k == "stem.1.bias":
            out["stem/norm/LayerNorm_0/bias"] = v
        elif k.startswith("stages."):
            parts = k.split(".")
            s = int(parts[1])
            if parts[2] == "downsample" and parts[3] in ("0", "1"):
                if parts[3] == "0":
                    key = "scale" if parts[4] == "weight" else "bias"
                    out[f"downsample_norm{s}/LayerNorm_0/{key}"] = v
                elif parts[4] == "weight":
                    out[f"downsample_conv{s}/Conv_0/kernel"] = _conv(v)
                else:
                    out[f"downsample_conv{s}/Conv_0/bias"] = v
            elif parts[2] == "blocks":
                b = int(parts[3])
                dst = f"stage{s}_block{b}"
                rest = ".".join(parts[4:])
                m = {
                    "conv_dw.weight": ("dwconv_kernel", _dwconv),
                    "conv_dw.bias": ("dwconv_bias", None),
                    "norm.weight": ("norm_scale", None),
                    "norm.bias": ("norm_bias", None),
                    "mlp.fc1.weight": ("pwconv1_kernel", _lin),
                    "mlp.fc1.bias": ("pwconv1_bias", None),
                    "mlp.fc2.weight": ("pwconv2_kernel", _lin),
                    "mlp.fc2.bias": ("pwconv2_bias", None),
                    "gamma": ("gamma", None),
                }.get(rest)
                if m is not None:
                    name, fn = m
                    out[f"{dst}/{name}"] = fn(v) if fn else v
        elif k in ("head.norm.weight", "norm.weight"):
            out["head_norm/LayerNorm_0/scale"] = v
        elif k in ("head.norm.bias", "norm.bias"):
            out["head_norm/LayerNorm_0/bias"] = v
        elif k in ("head.fc.weight", "head.weight"):
            out["head/kernel"] = _lin(v)
        elif k in ("head.fc.bias", "head.bias"):
            out["head/bias"] = v
    return out


def vit_from_torch_partial(sd: Mapping[str, Any]) -> dict[str, np.ndarray]:
    try:
        return vit_from_torch(sd, not_original=False)
    except KeyError:
        pass
    sd = strip_prefixes(sd)
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k in ("cls_token", "pos_embed"):
            out[k] = v
        elif k == "patch_embed.proj.weight":
            out["patch_embed/proj/Conv_0/kernel"] = _conv(v)
        elif k == "patch_embed.proj.bias":
            out["patch_embed/proj/Conv_0/bias"] = v
        elif k.startswith("blocks."):
            parts = k.split(".")
            i = int(parts[1])
            dst = f"block{i}"
            rest = ".".join(parts[2:])
            m = {
                "norm1.weight": (f"{dst}/norm1/LayerNorm_0/scale", None),
                "norm1.bias": (f"{dst}/norm1/LayerNorm_0/bias", None),
                "attn.qkv.weight": (f"{dst}/attn/qkv/kernel", _lin),
                "attn.qkv.bias": (f"{dst}/attn/qkv/bias", None),
                "attn.proj.weight": (f"{dst}/attn/proj/kernel", _lin),
                "attn.proj.bias": (f"{dst}/attn/proj/bias", None),
                "norm2.weight": (f"{dst}/norm2/LayerNorm_0/scale", None),
                "norm2.bias": (f"{dst}/norm2/LayerNorm_0/bias", None),
                "mlp.fc1.weight": (f"{dst}/mlp/fc1/kernel", _lin),
                "mlp.fc1.bias": (f"{dst}/mlp/fc1/bias", None),
                "mlp.fc2.weight": (f"{dst}/mlp/fc2/kernel", _lin),
                "mlp.fc2.bias": (f"{dst}/mlp/fc2/bias", None),
                "ls1.gamma": (f"{dst}/ls1", None),
                "ls2.gamma": (f"{dst}/ls2", None),
            }.get(rest)
            if m is not None:
                name, fn = m
                out[name] = fn(v) if fn else v
        elif k == "norm.weight":
            out["norm/LayerNorm_0/scale"] = v
        elif k == "norm.bias":
            out["norm/LayerNorm_0/bias"] = v
        elif k == "head.weight":
            out["head/kernel"] = _lin(v)
        elif k == "head.bias":
            out["head/bias"] = v
    return out


def load_torch_checkpoint(path: str, model_name: str, target_params: Any,
                          *, not_original: bool = False,
                          target_batch_stats: Any = None) -> Any:
    """Load a reference .pt checkpoint file into our param tree.

    Returns the params tree; for the BN family (resnet50/resnet50_gelu/
    resnet101/wrn_50_2) pass `target_batch_stats` and a
    (params, batch_stats) pair is returned instead — torch running stats
    live in our mutable `batch_stats` collection, not in params. The BN
    family covers the whole reference zoo (utils_architecture.py:303-322):
    resnet50/101, wrn_50_2, densnet201, inception."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "model_state_dict" in sd:  # full_model_*.pth
        sd = sd["model_state_dict"]
    if model_name in BN_MAPPERS:
        assert target_batch_stats is not None, (
            "BN-family import needs target_batch_stats"
        )
        flat_p, flat_s = BN_MAPPERS[model_name](sd)
        return (
            to_param_tree(flat_p, target_params),
            to_param_tree(flat_s, target_batch_stats),
        )
    if model_name == "convnext_iso":
        # Meta layout (flat blocks.{i}), not timm's stages.* — own mapper
        flat = convnext_iso_from_torch(sd, not_original=not_original)
    elif model_name.startswith("convnext"):
        # base/large use ConvStem3 (reference :262,269); tiny/small/micro ConvStem1
        stem_mod = (
            "ConvStem3_0" if ("base" in model_name or "large" in model_name)
            else "ConvStem1_0"
        )
        flat = convnext_from_torch(sd, not_original=not_original, stem_module=stem_mod)
    elif model_name.startswith(("vit", "deit")):
        emb = "ConvStem2_0" if model_name == "vit_m" else "ConvStem_0"
        flat = vit_from_torch(sd, not_original=not_original, embed_module=emb)
    else:
        raise ValueError(f"no torch import mapping for {model_name!r}")
    return to_param_tree(flat, target_params)
