"""Export our Flax param trees to the reference's PyTorch checkpoint format.

Inverse of `ckpt/torch_import.py` for the families whose checkpoints the
paper releases (README.md:27-48): ConvNeXt (T/S/B/L/iso, both stems) and
ViT/DeiT (S/M/B, both stems). A model trained here can be published as a
plain timm-0.8 state_dict that the reference's loader cascade
(main.py:856-872, AA_eval.py:185-189) and RobustBench-style submissions
(rb_architecture_util.py) consume directly — raw keys, no 'module.'/
'base_model.' prefixes.

Layout inversions (torch_import.py docstring):

  kernel [in, out]          -> torch Linear  [out, in]
  kernel [kh, kw, I, O]     -> torch Conv2d  [O, I, kh, kw]
  kernel [kh, kw, 1, C]     -> depthwise     [C, 1, kh, kw]

ConvStem Sequential indices follow the reference ConvBlock/1/2/3 layout
(utils_architecture.py:120-217): conv k at 3k, LayerNorm k at 3k+1 (GELU
at 3k+2 holds no params), optional trailing 1x1 proj at 3*n_convs.

BN-family export (resnet/wrn/densenet/inception) is intentionally out of
scope: those archs are import-only here (timm-pretrained init); the paper
publishes no adversarially-trained BN checkpoints.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}" if prefix else str(k)))
    else:
        out[prefix] = np.asarray(tree)
    return out


class _TrackedFlat(dict):
    """Flat param dict recording which keys a mapper consumed, so
    export_torch_state_dict can prove FULL coverage — a silently-dropped
    leaf would otherwise publish a corrupt checkpoint."""

    def __init__(self, d):
        super().__init__(d)
        self.read: set[str] = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def _conv_inv(w):  # [kh, kw, I, O] -> [O, I, kh, kw]
    return np.transpose(w, (3, 2, 0, 1))


def _lin_inv(w):  # [in, out] -> [out, in]
    return np.transpose(w, (1, 0))


def _convstem_to_torch(flat: dict[str, np.ndarray], flax_prefix: str,
                       torch_prefix: str, out: dict[str, np.ndarray]) -> None:
    """Our ConvStem module (conv{i}/Conv_0, norm{i}/LayerNorm_0, optional
    proj/Conv_0) -> reference Sequential '<torch_prefix>.stem.<3i>'."""
    convs = sorted(
        int(m.group(1))
        for k in flat
        if (m := re.match(rf"{re.escape(flax_prefix)}/conv(\d+)/Conv_0/kernel$", k))
    )
    for i in convs:
        src = f"{flax_prefix}/conv{i}/Conv_0"
        out[f"{torch_prefix}.stem.{3 * i}.weight"] = _conv_inv(flat[f"{src}/kernel"])
        out[f"{torch_prefix}.stem.{3 * i}.bias"] = flat[f"{src}/bias"]
        nsrc = f"{flax_prefix}/norm{i}/LayerNorm_0"
        out[f"{torch_prefix}.stem.{3 * i + 1}.weight"] = flat[f"{nsrc}/scale"]
        out[f"{torch_prefix}.stem.{3 * i + 1}.bias"] = flat[f"{nsrc}/bias"]
    proj = f"{flax_prefix}/proj/Conv_0"
    if f"{proj}/kernel" in flat:
        j = 3 * len(convs)
        out[f"{torch_prefix}.stem.{j}.weight"] = _conv_inv(flat[f"{proj}/kernel"])
        out[f"{torch_prefix}.stem.{j}.bias"] = flat[f"{proj}/bias"]


def _find_convstem_prefix(flat: dict[str, np.ndarray]) -> str | None:
    for k in flat:
        m = re.match(r"(ConvStem\d*_\d+)/", k)
        if m:
            return m.group(1)
    return None


def convnext_to_torch(params: Any) -> dict[str, np.ndarray]:
    """Our ConvNeXt params tree -> timm-0.8 ConvNeXt state_dict arrays
    (inverse of torch_import.convnext_from_torch)."""
    return _convnext_flat_to_torch(_flatten(params))


def _convnext_flat_to_torch(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}

    cvst = _find_convstem_prefix(flat)
    if cvst is not None:
        _convstem_to_torch(flat, cvst, "stem", out)
    else:
        out["stem.0.weight"] = _conv_inv(flat["stem/proj/Conv_0/kernel"])
        out["stem.0.bias"] = flat["stem/proj/Conv_0/bias"]
        out["stem.1.weight"] = flat["stem/norm/LayerNorm_0/scale"]
        out["stem.1.bias"] = flat["stem/norm/LayerNorm_0/bias"]

    for k in flat:
        m = re.match(r"downsample_norm(\d+)/LayerNorm_0/(scale|bias)$", k)
        if m:
            s, what = m.group(1), {"scale": "weight", "bias": "bias"}[m.group(2)]
            out[f"stages.{s}.downsample.0.{what}"] = flat[k]
        m = re.match(r"downsample_conv(\d+)/Conv_0/(kernel|bias)$", k)
        if m:
            s = m.group(1)
            if m.group(2) == "kernel":
                out[f"stages.{s}.downsample.1.weight"] = _conv_inv(flat[k])
            else:
                out[f"stages.{s}.downsample.1.bias"] = flat[k]
        m = re.match(r"stage(\d+)_block(\d+)/(.+)$", k)
        if m:
            dst = f"stages.{m.group(1)}.blocks.{m.group(2)}"
            leaf = m.group(3)
            if leaf == "dwconv_kernel":
                out[f"{dst}.conv_dw.weight"] = _conv_inv(flat[k])
            elif leaf == "dwconv_bias":
                out[f"{dst}.conv_dw.bias"] = flat[k]
            elif leaf == "norm_scale":
                out[f"{dst}.norm.weight"] = flat[k]
            elif leaf == "norm_bias":
                out[f"{dst}.norm.bias"] = flat[k]
            elif leaf == "pwconv1_kernel":
                out[f"{dst}.mlp.fc1.weight"] = _lin_inv(flat[k])
            elif leaf == "pwconv1_bias":
                out[f"{dst}.mlp.fc1.bias"] = flat[k]
            elif leaf == "pwconv2_kernel":
                out[f"{dst}.mlp.fc2.weight"] = _lin_inv(flat[k])
            elif leaf == "pwconv2_bias":
                out[f"{dst}.mlp.fc2.bias"] = flat[k]
            elif leaf == "gamma":
                out[f"{dst}.gamma"] = flat[k]
            else:
                raise ValueError(f"unmapped ConvNeXt block leaf {k!r}")

    out["head.norm.weight"] = flat["head_norm/LayerNorm_0/scale"]
    out["head.norm.bias"] = flat["head_norm/LayerNorm_0/bias"]
    out["head.fc.weight"] = _lin_inv(flat["head/kernel"])
    out["head.fc.bias"] = flat["head/bias"]
    return out


def vit_to_torch(params: Any) -> dict[str, np.ndarray]:
    """Our ViT params tree -> timm-0.8 VisionTransformer state_dict arrays
    (inverse of torch_import.vit_from_torch)."""
    return _vit_flat_to_torch(_flatten(params))


def _vit_flat_to_torch(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {
        "cls_token": flat["cls_token"],
        "pos_embed": flat["pos_embed"],
    }

    cvst = _find_convstem_prefix(flat)
    if cvst is not None:
        _convstem_to_torch(flat, cvst, "patch_embed.proj", out)
    else:
        out["patch_embed.proj.weight"] = _conv_inv(flat["patch_embed/proj/Conv_0/kernel"])
        out["patch_embed.proj.bias"] = flat["patch_embed/proj/Conv_0/bias"]

    _LIN = {"attn/qkv": "attn.qkv", "attn/proj": "attn.proj",
            "mlp/fc1": "mlp.fc1", "mlp/fc2": "mlp.fc2"}
    for k in flat:
        m = re.match(r"block(\d+)/(.+)$", k)
        if not m:
            continue
        dst = f"blocks.{m.group(1)}"
        leaf = m.group(2)
        ln = re.match(r"(norm[12])/LayerNorm_0/(scale|bias)$", leaf)
        if ln:
            what = {"scale": "weight", "bias": "bias"}[ln.group(2)]
            out[f"{dst}.{ln.group(1)}.{what}"] = flat[k]
            continue
        lin = re.match(r"(attn/qkv|attn/proj|mlp/fc1|mlp/fc2)/(kernel|bias)$", leaf)
        if lin:
            tname = _LIN[lin.group(1)]
            if lin.group(2) == "kernel":
                out[f"{dst}.{tname}.weight"] = _lin_inv(flat[k])
            else:
                out[f"{dst}.{tname}.bias"] = flat[k]
            continue
        if leaf in ("ls1", "ls2"):  # DeiT3 LayerScale
            out[f"{dst}.{leaf}.gamma"] = flat[k]
            continue
        raise ValueError(f"unmapped ViT block leaf {k!r}")

    out["norm.weight"] = flat["norm/LayerNorm_0/scale"]
    out["norm.bias"] = flat["norm/LayerNorm_0/bias"]
    out["head.weight"] = _lin_inv(flat["head/kernel"])
    out["head.bias"] = flat["head/bias"]
    return out


def convnext_iso_to_torch(params: Any) -> dict[str, np.ndarray]:
    """Our ConvNeXtIsotropic params -> Meta-layout state_dict (the
    reference's iso format, models/convnext_iso.py: bare 16x16 stem conv,
    flat blocks.{i}.dwconv/norm/pwconv1/pwconv2[+gamma], final norm, head;
    ConvStem variant mounts ConvBlock at `stem` — README.md:32's iso-CvSt)."""
    return _convnext_iso_flat_to_torch(_flatten(params))


def _convnext_iso_flat_to_torch(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    cvst = _find_convstem_prefix(flat)
    if cvst is not None:
        _convstem_to_torch(flat, cvst, "stem", out)
    else:
        out["stem.weight"] = _conv_inv(flat["stem/Conv_0/kernel"])
        out["stem.bias"] = flat["stem/Conv_0/bias"]
    _LEAF = {
        "dwconv_kernel": ("dwconv.weight", _conv_inv),
        "dwconv_bias": ("dwconv.bias", None),
        "norm_scale": ("norm.weight", None),
        "norm_bias": ("norm.bias", None),
        "pwconv1_kernel": ("pwconv1.weight", _lin_inv),
        "pwconv1_bias": ("pwconv1.bias", None),
        "pwconv2_kernel": ("pwconv2.weight", _lin_inv),
        "pwconv2_bias": ("pwconv2.bias", None),
        "gamma": ("gamma", None),
    }
    for k in flat:
        m = re.match(r"block(\d+)/(.+)$", k)
        if not m:
            continue
        if m.group(2) not in _LEAF:
            raise ValueError(f"unmapped iso block leaf {k!r}")
        name, tf = _LEAF[m.group(2)]
        out[f"blocks.{m.group(1)}.{name}"] = tf(flat[k]) if tf else flat[k]
    out["norm.weight"] = flat["head_norm/LayerNorm_0/scale"]
    out["norm.bias"] = flat["head_norm/LayerNorm_0/bias"]
    out["head.weight"] = _lin_inv(flat["head/kernel"])
    out["head.bias"] = flat["head/bias"]
    return out


def export_torch_state_dict(params: Any, model_name: str) -> dict[str, np.ndarray]:
    """Dispatch by family. `params` is the tree under variables['params'];
    models built with add_normalization nest everything under a 'model' key
    (NormalizedModel — the ImageNormalizer itself holds no params), which is
    stripped here: the reference stores normalizer buffers in the state_dict
    but its loader cascade skips them (torch_import.strip_prefixes).
    Every flax leaf must be consumed by the mapper — a partial export would
    publish a corrupt checkpoint."""
    if isinstance(params, dict) and set(params.keys()) == {"model"}:
        params = params["model"]
    flat = _TrackedFlat(_flatten(params))
    if model_name == "convnext_iso":
        out = _convnext_iso_flat_to_torch(flat)
    elif model_name.startswith("convnext"):
        out = _convnext_flat_to_torch(flat)
    elif model_name.startswith(("vit", "deit")):
        out = _vit_flat_to_torch(flat)
    else:
        raise ValueError(
            f"torch export covers the ConvNeXt/ViT families only, not "
            f"{model_name!r} (the BN family is import-only — module docstring)"
        )
    unread = set(flat) - flat.read
    if unread:
        raise ValueError(
            f"export did not consume {len(unread)} param leaves "
            f"(e.g. {sorted(unread)[:4]}) — mapper/arch mismatch"
        )
    return out


def save_torch_checkpoint(params: Any, model_name: str, path: str) -> None:
    """torch.save the exported state_dict (f32 tensors, raw keys) — the
    file format of the reference's weights_{e}.pt (main.py:737-741)."""
    import torch

    sd = export_torch_state_dict(params, model_name)
    torch.save({k: torch.from_numpy(np.asarray(v, np.float32).copy())
                for k, v in sd.items()}, path)
