"""ConvNeXt (T/S/B/L + isotropic) in Flax, NHWC, timm-compatible semantics.

Capability parity with the reference model zoo (utils_architecture.py:225-322,
which builds timm ConvNeXts and optionally swaps the stem for a ConvStem).
Re-designed TPU-first: NHWC layout so the 7x7 depthwise conv and the two
pointwise Dense layers map straight onto VPU/MXU tiles, bf16 compute with
f32 params, LayerScale as a simple broadcast multiply that XLA fuses.

Structure (timm convnext.py semantics):
  stem: conv k4 s4 + LN  (or a ConvStem variant)
  4 stages: [LN + conv k2 s2 downsample] + N blocks
  block: dwconv7x7 -> LN -> Dense(4C) -> GELU -> Dense(C) -> gamma * . -> droppath + residual
  head: global avg pool -> LN -> Dense(num_classes)

Isotropic variant (models/convnext_iso.py in the reference): patchify /16 to
a single width, N blocks, no downsampling, LN + head.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv, DropPath, LayerNorm, trunc_normal_init
from .stems import PatchifyStem


class ConvNeXtBlock(nn.Module):
    """dwconv7x7 -> LN -> Dense(4C) -> GELU -> Dense(C) -> LayerScale
    -> DropPath -> residual.

    The block tail (everything after the dwconv) has two equivalent compute
    paths sharing one param tree: plain jnp ops, or the fused Pallas kernel
    (ops/block_mlp.py) that keeps the 4C-wide intermediates in VMEM —
    enabled via `use_pallas` where the resident weights/accumulators fit
    (ops/block_mlp.py::tail_fusable: any C <= 384; C <= 512 full backward,
    or C <= 1024 with `wide_tail` against the 64 MB scoped cap;
    C <= 1024 for the input-only attack-closure backward).
    """

    dim: int
    drop_path: float = 0.0
    layer_scale_init: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    pallas_interpret: bool = False  # CPU-test mode for the kernel
    # 'input': the fused kernel's backward computes only the input cotangent
    # (attack closures never differentiate w.r.t. weights; the monolithic
    # pallas_call otherwise computes-and-discards all weight grads)
    pallas_grad_mode: str = "full"
    # separate gate: the Pallas dwconv measured SLOWER than XLA's lowering on
    # v5e (242 vs 143 ms/step — 49 sublane-unaligned shifted reads); kept as
    # groundwork, off by default
    use_pallas_dwconv: bool = False
    # admit the fused tail's FULL backward past C=512 (B stage 3 C=1024,
    # L stage 2 C=768) against the 64 MB scoped cap (ops/block_mlp.py)
    wide_tail: bool = False
    # two-kernel full backward (ds+dA pass, then a matmul-shaped dw1 pass) —
    # ops/block_mlp.py _bwd_split; A/B knob for VERDICT r4 item#5
    split_bwd: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        C = self.dim
        shortcut = x
        dw_k = self.param("dwconv_kernel", trunc_normal_init, (7, 7, 1, C), jnp.float32)
        dw_b = self.param("dwconv_bias", nn.initializers.zeros, (C,), jnp.float32)

        if self.use_pallas_dwconv and C <= 384:
            from ..ops.dwconv import dwconv7x7

            s = dwconv7x7(x.astype(self.dtype), dw_k, dw_b, self.pallas_interpret)
        else:
            s = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                dw_k.astype(self.dtype),
                window_strides=(1, 1),
                padding=[(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C,
            ) + dw_b.astype(self.dtype)

        ln_g = self.param("norm_scale", nn.initializers.ones, (C,), jnp.float32)
        ln_b = self.param("norm_bias", nn.initializers.zeros, (C,), jnp.float32)
        w1 = self.param("pwconv1_kernel", trunc_normal_init, (C, 4 * C), jnp.float32)
        b1 = self.param("pwconv1_bias", nn.initializers.zeros, (4 * C,), jnp.float32)
        w2 = self.param("pwconv2_kernel", trunc_normal_init, (4 * C, C), jnp.float32)
        b2 = self.param("pwconv2_bias", nn.initializers.zeros, (C,), jnp.float32)
        if self.layer_scale_init > 0:
            gamma = self.param(
                "gamma", nn.initializers.constant(self.layer_scale_init), (C,), jnp.float32
            )
        else:
            gamma = jnp.ones((C,), jnp.float32)

        # per-sample DropPath keep-scale (1/keep_p or 0); None when inactive
        droppath_active = self.drop_path > 0.0 and train
        if droppath_active:
            keep_p = 1.0 - self.drop_path
            mask = jax.random.bernoulli(
                self.make_rng("dropout"), p=keep_p, shape=(x.shape[0],)
            )
            keep = mask.astype(jnp.float32) / keep_p
        else:
            keep = None

        from ..ops.block_mlp import tail_fusable

        if self.use_pallas and tail_fusable(C, self.pallas_grad_mode,
                                            wide=self.wide_tail):
            from ..ops.block_mlp import convnext_block_tail

            grad_mode = self.pallas_grad_mode
            if grad_mode == "full" and self.split_bwd:
                grad_mode = "split"
            return convnext_block_tail(
                s, shortcut, keep, ln_g, ln_b, w1, b1, w2, b2, gamma,
                interpret=self.pallas_interpret,
                grad_mode=grad_mode,
            ).astype(self.dtype)
        if keep is None:
            keep = jnp.ones((x.shape[0],), jnp.float32)

        # reference jnp path (identical math)
        u = _layer_norm_f32(s, ln_g, ln_b).astype(self.dtype)
        h = u @ w1.astype(self.dtype) + b1.astype(self.dtype)
        g = nn.gelu(h, approximate=False)
        o = g @ w2.astype(self.dtype) + b2.astype(self.dtype)
        o = o * gamma.astype(o.dtype)
        o = o * keep.astype(o.dtype).reshape(-1, 1, 1, 1)
        return shortcut + o


def _layer_norm_f32(s: jax.Array, g: jax.Array, b: jax.Array, eps: float = 1e-6):
    sf = s.astype(jnp.float32)
    mu = jnp.mean(sf, axis=-1, keepdims=True)
    var = jnp.mean((sf - mu) ** 2, axis=-1, keepdims=True)
    return (sf - mu) * jax.lax.rsqrt(var + eps) * g + b


class ConvNeXt(nn.Module):
    """ConvNeXt with a pluggable stem.

    stem_factory: callable returning a Flax module mapping NHWC [0,1] images
    to the stage-0 feature map (must downsample by 4 and output dims[0]
    channels). Defaults to the timm patchify stem.
    """

    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    layer_scale_init: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    stem_factory: Callable[..., nn.Module] | None = None
    use_blurpool: bool = False
    remat: bool = False  # checkpoint each block: trades HBM activation traffic
    # for recompute — the right trade on TPU where the AT step is HBM-bound
    use_pallas: bool = False  # fused Pallas block-tail kernel (C <= 384)
    pallas_interpret: bool = False
    pallas_grad_mode: str = "full"
    use_pallas_dwconv: bool = False
    wide_tail: bool = False  # see ConvNeXtBlock.wide_tail
    split_bwd: bool = False  # see ConvNeXtBlock.split_bwd

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        # static_argnums=(2,): (self, x, train) — train must stay a python bool
        block_cls = nn.remat(ConvNeXtBlock, static_argnums=(2,)) if self.remat else ConvNeXtBlock
        if self.stem_factory is not None:
            x = self.stem_factory(dtype=self.dtype, use_blurpool=self.use_blurpool)(x)
        else:
            x = PatchifyStem(
                self.dims[0], dtype=self.dtype, use_blurpool=self.use_blurpool, name="stem"
            )(x)

        total_blocks = sum(self.depths)
        dp_rates = [
            self.drop_path_rate * i / max(total_blocks - 1, 1) for i in range(total_blocks)
        ]
        cur = 0
        for si, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if si > 0:
                x = LayerNorm(dtype=self.dtype, name=f"downsample_norm{si}")(x)
                x = Conv(
                    dim,
                    (2, 2),
                    strides=(2, 2),
                    padding="VALID",
                    dtype=self.dtype,
                    use_blurpool=self.use_blurpool,
                    name=f"downsample_conv{si}",
                )(x)
            for bi in range(depth):
                x = block_cls(
                    dim,
                    drop_path=dp_rates[cur],
                    layer_scale_init=self.layer_scale_init,
                    dtype=self.dtype,
                    use_pallas=self.use_pallas,
                    pallas_interpret=self.pallas_interpret,
                    pallas_grad_mode=self.pallas_grad_mode,
                    use_pallas_dwconv=self.use_pallas_dwconv,
                    # round-5 fix: this forwarding was MISSING, making the
                    # knob a no-op on hierarchical ConvNeXt (the r4 queue13
                    # "wide_tail A/B" measured stale controls, not the knob)
                    wide_tail=self.wide_tail,
                    split_bwd=self.split_bwd,
                    name=f"stage{si}_block{bi}",
                )(x, train)
                cur += 1

        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        x = LayerNorm(dtype=self.dtype, name="head_norm")(x.astype(self.dtype))
        x = nn.Dense(
            self.num_classes,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init,
            name="head",
        )(x)
        return x


class ConvNeXtIsotropic(nn.Module):
    """Isotropic ConvNeXt (reference models/convnext_iso.py:19-93): constant
    width/resolution, patchify /16, `depth` blocks, LN + linear head."""

    dim: int = 384
    depth: int = 18
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    layer_scale_init: float = 0.0  # convnext_iso uses no layerscale by default
    dtype: jnp.dtype = jnp.float32
    stem_factory: Callable[..., nn.Module] | None = None
    use_blurpool: bool = False
    remat: bool = False
    use_pallas: bool = False
    pallas_interpret: bool = False
    pallas_grad_mode: str = "full"
    wide_tail: bool = False  # no effect at iso widths (<= 432); kept for API uniformity
    split_bwd: bool = False  # see ConvNeXtBlock.split_bwd

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        if self.stem_factory is not None:
            x = self.stem_factory(dtype=self.dtype, use_blurpool=self.use_blurpool)(x)
        else:
            x = Conv(
                self.dim,
                (16, 16),
                strides=(16, 16),
                padding="VALID",
                dtype=self.dtype,
                name="stem",
            )(x)
        dp_rates = [
            self.drop_path_rate * i / max(self.depth - 1, 1) for i in range(self.depth)
        ]
        block_cls = nn.remat(ConvNeXtBlock, static_argnums=(2,)) if self.remat else ConvNeXtBlock
        for bi in range(self.depth):
            x = block_cls(
                self.dim,
                drop_path=dp_rates[bi],
                layer_scale_init=self.layer_scale_init,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                pallas_interpret=self.pallas_interpret,
                pallas_grad_mode=self.pallas_grad_mode,
                wide_tail=self.wide_tail,
                split_bwd=self.split_bwd,
                name=f"block{bi}",
            )(x, train)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        x = LayerNorm(dtype=self.dtype, name="head_norm")(x.astype(self.dtype))
        return nn.Dense(
            self.num_classes,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init,
            name="head",
        )(x)


CONVNEXT_CFGS = {
    "tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    "small": dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768)),
    "base": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
    "large": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
}
