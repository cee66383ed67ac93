"""Optional tensor-parallel ("model" axis) sharding rules.

The reference implements exactly one parallelism strategy — DP over NCCL
(SURVEY.md §2.3, main.py:348-356,890). This framework keeps DP as the
required strategy and adds the option, absent in the reference and natural
under pjit, of extending the same NamedSharding scheme to MODEL-axis
sharding for the large models at high resolution (latency lever for
ConvNeXt-L @320 eval/serving, HBM lever beyond FSDP for training).

Mechanism — annotate-and-let-XLA-partition, no collectives in user code and
no model changes: a rule table maps param PATHS to PartitionSpecs carrying
the "model" axis; everything unmatched falls back to the FSDP rule (or
replicates). Megatron-style column/row split of each block MLP:

  * pwconv1 / fc1 kernels shard their OUTPUT dim ("column"): each shard
    computes a 4C/tp slice of the GELU-wide intermediate;
  * pwconv2 / fc2 kernels shard their INPUT dim ("row"): shards contract
    their slice and XLA inserts ONE all-reduce of the C-wide block output
    where the partial sums meet the replicated residual add.

ViT attention stays replicated in v1: the fused qkv Dense emits [B, N, 3C]
reshaped to [B, N, 3, H, hd], and a "model"-sharded 3C axis cannot
propagate through that split (the major factor 3 is not divisible by tp),
so XLA would all-gather every layer; the MLP is ~2/3 of the ViT FLOPs.

Pallas note: the fused block-tail/attention custom calls are opaque to the
SPMD partitioner (it would all-gather around them) — TP therefore uses the
plain XLA path (`use_pallas=0`); both paths share one param tree.

FSDP composition: unmatched leaves keep the FSDP rule, so dist.tp + fsdp
runs correctly, but the partitioner may warn about involuntary reshards
where fsdp-sharded dwconv channels meet model-sharded MLP activations —
prefer tp alone (or fsdp alone) unless params don't fit.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import _fsdp_spec

# (path regex, PartitionSpec) — first match wins; the spec's length must
# equal the leaf's ndim and every "model"-sharded dim must divide, else the
# leaf falls back to the FSDP/replicate rule.
TP_RULES: tuple[tuple[str, P], ...] = (
    # ConvNeXt block MLP (models/convnext.py ConvNeXtBlock)
    (r"pwconv1_kernel$", P(None, "model")),
    (r"pwconv1_bias$", P("model")),
    (r"pwconv2_kernel$", P("model", None)),
    # ViT block MLP (models/vit.py Mlp / _MlpParams — same param paths)
    (r"mlp/fc1/kernel$", P(None, "model")),
    (r"mlp/fc1/bias$", P("model")),
    (r"mlp/fc2/kernel$", P("model", None)),
)


def _path_str(path) -> str:
    parts = []
    for e in path:
        if hasattr(e, "key"):
            parts.append(str(e.key))
        elif hasattr(e, "name"):
            parts.append(str(e.name))
        elif hasattr(e, "idx"):
            parts.append(str(e.idx))
        else:
            parts.append(str(e))
    return "/".join(parts)


def _tp_spec(spec: P, shape: tuple[int, ...], tp: int) -> P | None:
    """Validate a TP rule against a leaf: ndim must match and every
    "model"-sharded dim must divide by tp; None -> caller falls back."""
    if len(spec) != len(shape):
        return None
    for dim, ax in zip(shape, spec):
        if ax is not None and (dim % tp != 0 or dim < tp):
            return None
    return spec


def tp_tree_shardings(mesh: Mesh, tree: Any, min_size: int = 2**14) -> Any:
    """NamedSharding pytree for params/EMA/optimizer-moment trees: TP rules
    by param path (moments mirror their params — the rule matches the same
    trailing path inside optax state trees), FSDP rule for unmatched leaves
    (replicate when the mesh has no fsdp axis or the leaf is small)."""
    tp = mesh.shape.get("model", 1)
    fsdp_size = mesh.shape.get("fsdp", 1)

    def spec_for(path, leaf):
        shape = tuple(getattr(leaf, "shape", ()))
        if tp > 1:
            key = _path_str(path)
            for pat, spec in TP_RULES:
                if re.search(pat, key):
                    ok = _tp_spec(spec, shape, tp)
                    if ok is not None:
                        return NamedSharding(mesh, ok)
                    break  # matched but not divisible: fall back
        return NamedSharding(mesh, _fsdp_spec(shape, fsdp_size, min_size))

    return jax.tree_util.tree_map_with_path(spec_for, tree)


def _spec_axes(spec: P) -> set:
    axes = set()
    for entry in spec:
        if entry is None:
            continue
        if isinstance(entry, (tuple, list)):
            axes.update(entry)
        else:
            axes.add(entry)
    return axes


def tp_sharded_leaf_count(shardings: Any) -> int:
    """Number of leaves actually sharded over "model" — callers assert > 0
    so a rule/path drift can't silently degrade TP to pure replication."""
    return sum(
        1
        for ns in jax.tree.leaves(shardings)
        if isinstance(ns, NamedSharding) and "model" in _spec_axes(ns.spec)
    )
