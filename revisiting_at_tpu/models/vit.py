"""Vision Transformer (ViT-S / DeiT-S / DeiT3-Medium / ViT-B) in Flax.

Capability parity with the reference's timm-built ViTs
(utils_architecture.py:271-301): class token, learned pos-embed, pre-LN
blocks, optional LayerScale (DeiT3), optional `no_embed_class` (DeiT3 adds
pos-embed to patch tokens only), pluggable patch embedding so the ConvStem
variants can replace `patch_embed.proj`.

TPU-first: tokens stay [B, N, D] with N=197 @224 — attention is tiny here,
the MXU time is in the MLPs; softmax accumulates in f32, everything else
bf16-computable.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import DropPath, LayerNorm, trunc_normal_init
from .stems import PatchEmbed


class Attention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    # fused Pallas attention kernel (ops/attention.py): QK^T -> softmax -> PV
    # in one VMEM-resident grid step per (batch, head)
    use_pallas: bool = False
    pallas_interpret: bool = False
    # 'qkv' (default): v2 kernel consuming the qkv Dense output [B,N,3D]
    # directly — no head transposes/pads at the boundary, single fused dqkv
    # cotangent. 'bhnd': v1 kernel on [B*H, N, hd] blocks (kept for A/B).
    attn_impl: str = "qkv"
    # tensor parallelism (parallel/tp.py): shard the HEADS dim of the qkv
    # activations over the "model" mesh axis. Params stay replicated — XLA
    # slices the qkv kernel columns per shard and all-reduces after `proj`
    # (one collective per block). The param-level column split used for the
    # MLPs can't serve attention: the fused qkv [B,N,3,H,hd] reshape has 3
    # as its major factor, indivisible by tp. Value = the "model" axis size
    # (0/1 off); needs a mesh in context at trace time (jax.set_mesh).
    tp_attn: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, N, D = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(
            3 * self.dim,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init,
            name="qkv",
        )(x)
        if self.use_pallas and self.attn_impl == "qkv" and self.tp_attn <= 1:
            # v2 path: the kernel slices heads at static lane offsets from
            # the raw [B, N, 3D] Dense output; its backward writes one
            # [B, N, 3D] dqkv that flows straight into the Dense VJP —
            # no [B,H,N,hd] transposes or 197->npad pads on either side.
            from ..ops.attention import fused_attention_qkv

            out = fused_attention_qkv(
                qkv, self.num_heads, interpret=self.pallas_interpret
            )
            return nn.Dense(
                self.dim,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=trunc_normal_init,
                name="proj",
            )(out)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        if self.tp_attn > 1 and self.num_heads % self.tp_attn == 0:
            # batch stays on its data axes (naming them keeps the constraint
            # compatible with the incoming batch sharding — an unconstrained
            # batch dim makes the SPMD transpose re-lay the cotangents out)
            qkv = jax.lax.with_sharding_constraint(
                qkv,
                jax.sharding.PartitionSpec(
                    ("data", "fsdp"), None, None, "model", None
                ),
            )
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, hd]
        if self.use_pallas:
            from ..ops.attention import fused_attention

            out = fused_attention(q, k, v, interpret=self.pallas_interpret)
            out = out.reshape(B, N, D)
        else:
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
            attn = attn * (head_dim**-0.5)
            attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, D)
        return nn.Dense(
            self.dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init,
            name="proj",
        )(out)


class _DenseParams(nn.Module):
    """Declares nn.Dense-compatible params (kernel/bias) WITHOUT computing.

    The fused block-tail path (ops/block_mlp.py::vit_mlp_tail) consumes the
    weights directly inside one Pallas kernel; these shims re-declare the
    exact param paths/shapes/inits of the jnp path's nn.Dense children so
    the checkpoint tree is identical in both modes (CLAUDE.md: param trees
    are the checkpoint format)."""

    fin: int
    fout: int

    @nn.compact
    def __call__(self) -> tuple[jax.Array, jax.Array]:
        k = self.param("kernel", trunc_normal_init, (self.fin, self.fout), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.fout,), jnp.float32)
        return k, b


class _ScaleBias(nn.Module):
    """Params of flax's nn.LayerNorm (child auto-named LayerNorm_0)."""

    dim: int

    @nn.compact
    def __call__(self) -> tuple[jax.Array, jax.Array]:
        s = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return s, b


class _LNParams(nn.Module):
    """Param-path twin of models.layers.LayerNorm (norm2/LayerNorm_0/...)."""

    dim: int

    @nn.compact
    def __call__(self) -> tuple[jax.Array, jax.Array]:
        return _ScaleBias(self.dim, name="LayerNorm_0")()


class _MlpParams(nn.Module):
    """Param-path twin of Mlp (mlp/fc1/..., mlp/fc2/...)."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.dim, self.hidden, name="fc1")()
        w2, b2 = _DenseParams(self.hidden, self.dim, name="fc2")()
        return w1, b1, w2, b2


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(
            self.hidden,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init,
            name="fc1",
        )(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(
            self.dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init,
            name="fc2",
        )(x)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    init_values: float | None = None  # LayerScale (DeiT3 uses 1e-6)
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    pallas_interpret: bool = False
    # 'input': the fused MLP-tail backward computes only the input cotangent
    # (attack closures never differentiate w.r.t. weights — ops/block_mlp.py)
    pallas_grad_mode: str = "full"
    tp_attn: int = 0  # attention-head activation sharding (see Attention)
    attn_impl: str = "qkv"  # see Attention.attn_impl
    # admit the fused MLP tail's FULL backward past C=512 (ViT-B C=768)
    # against the 64 MB scoped-VMEM cap (ops/block_mlp.py::tail_fusable)
    wide_tail: bool = False
    # two-kernel full backward A/B knob (ops/block_mlp.py _bwd_split)
    split_bwd: bool = False

    def _ls(self, name: str, x: jax.Array) -> jax.Array:
        if self.init_values is None:
            return x
        gamma = self.param(
            name, nn.initializers.constant(self.init_values), (self.dim,), jnp.float32
        )
        return x * gamma.astype(x.dtype)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = Attention(
            self.dim, self.num_heads, dtype=self.dtype,
            use_pallas=self.use_pallas, pallas_interpret=self.pallas_interpret,
            tp_attn=self.tp_attn, attn_impl=self.attn_impl,
            name="attn",
        )(y)
        y = self._ls("ls1", y)
        x = x + DropPath(self.drop_path, name="drop_path1")(y, deterministic=not train)

        hidden = int(self.dim * self.mlp_ratio)
        from ..ops.block_mlp import tail_fusable

        if self.use_pallas and tail_fusable(self.dim, self.pallas_grad_mode,
                                            wide=self.wide_tail):
            # fused norm2 -> fc1 -> GELU -> fc2 -> ls2 -> droppath -> residual
            # in one VMEM-resident Pallas kernel (same kernel as the ConvNeXt
            # block tail; s == r == x here). Param tree identical to the jnp
            # path below via the _*Params shims.
            from ..ops.block_mlp import vit_mlp_tail

            ln_g, ln_b = _LNParams(self.dim, name="norm2")()
            w1, b1, w2, b2 = _MlpParams(self.dim, hidden, name="mlp")()
            if self.init_values is not None:
                gamma = self.param(
                    "ls2", nn.initializers.constant(self.init_values),
                    (self.dim,), jnp.float32,
                )
            else:
                gamma = jnp.ones((self.dim,), jnp.float32)
            if self.drop_path > 0.0 and train:
                keep_p = 1.0 - self.drop_path
                mask = jax.random.bernoulli(
                    self.make_rng("dropout"), p=keep_p, shape=(x.shape[0],)
                )
                keep = mask.astype(jnp.float32) / keep_p
            else:
                keep = None
            grad_mode = self.pallas_grad_mode
            if grad_mode == "full" and self.split_bwd:
                grad_mode = "split"
            return vit_mlp_tail(
                x, keep, ln_g, ln_b, w1, b1, w2, b2, gamma,
                interpret=self.pallas_interpret,
                grad_mode=grad_mode,
            ).astype(self.dtype)

        y = LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = Mlp(self.dim, hidden, dtype=self.dtype, name="mlp")(y)
        y = self._ls("ls2", y)
        x = x + DropPath(self.drop_path, name="drop_path2")(y, deterministic=not train)
        return x


class VisionTransformer(nn.Module):
    """Generic ViT with pluggable patch embedding.

    embed_factory: module factory producing the patch feature map
    [B, H/P, W/P, D] from NHWC images — the timm `patch_embed.proj` slot the
    reference swaps for a ConvStem (utils_architecture.py:275,284,291,301).
    """

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    patch_size: int = 16
    drop_path_rate: float = 0.0
    init_values: float | None = None
    no_embed_class: bool = False
    num_prefix_tokens: int = 1  # class token
    dtype: jnp.dtype = jnp.float32
    embed_factory: Callable[..., nn.Module] | None = None
    use_blurpool: bool = False
    remat: bool = False  # checkpoint each transformer block
    # fused attention kernel (ops/attention.py) + fused MLP tail where the
    # kernel-resident state fits (ops/block_mlp.py::tail_fusable)
    use_pallas: bool = False
    pallas_interpret: bool = False
    pallas_grad_mode: str = "full"  # 'input' for attack closures (input_grad_view)
    tp_attn: int = 0  # attention-head activation sharding (see Attention)
    attn_impl: str = "qkv"  # see Attention.attn_impl
    wide_tail: bool = False  # see ViTBlock.wide_tail
    split_bwd: bool = False  # see ViTBlock.split_bwd

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        if self.embed_factory is not None:
            feat = self.embed_factory(dtype=self.dtype, use_blurpool=self.use_blurpool)(x)
        else:
            feat = PatchEmbed(
                self.embed_dim,
                self.patch_size,
                dtype=self.dtype,
                use_blurpool=self.use_blurpool,
                name="patch_embed",
            )(x)
        B, H, W, D = feat.shape
        tokens = feat.reshape(B, H * W, D)

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim), jnp.float32
        )
        cls = jnp.broadcast_to(cls.astype(tokens.dtype), (B, 1, self.embed_dim))

        if self.no_embed_class:
            pos = self.param(
                "pos_embed", trunc_normal_init, (1, H * W, self.embed_dim), jnp.float32
            )
            tokens = tokens + pos.astype(tokens.dtype)
            tokens = jnp.concatenate([cls, tokens], axis=1)
        else:
            pos = self.param(
                "pos_embed",
                trunc_normal_init,
                (1, H * W + self.num_prefix_tokens, self.embed_dim),
                jnp.float32,
            )
            tokens = jnp.concatenate([cls, tokens], axis=1)
            tokens = tokens + pos.astype(tokens.dtype)

        dp = [self.drop_path_rate * i / max(self.depth - 1, 1) for i in range(self.depth)]
        block_cls = nn.remat(ViTBlock, static_argnums=(2,)) if self.remat else ViTBlock
        for i in range(self.depth):
            tokens = block_cls(
                self.embed_dim,
                self.num_heads,
                self.mlp_ratio,
                drop_path=dp[i],
                init_values=self.init_values,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                pallas_interpret=self.pallas_interpret,
                pallas_grad_mode=self.pallas_grad_mode,
                tp_attn=self.tp_attn,
                attn_impl=self.attn_impl,
                wide_tail=self.wide_tail,
                split_bwd=self.split_bwd,
                name=f"block{i}",
            )(tokens, train)

        tokens = LayerNorm(dtype=self.dtype, name="norm")(tokens)
        cls_out = tokens[:, 0]
        return nn.Dense(
            self.num_classes,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init,
            name="head",
        )(cls_out)


VIT_CFGS = {
    # timm vit_small_patch16_224 (reference utils_architecture.py:272)
    "s": dict(embed_dim=384, depth=12, num_heads=6),
    # timm deit_small_patch16_224 (reference utils_architecture.py:282)
    "deit_s": dict(embed_dim=384, depth=12, num_heads=6),
    # timm deit3_medium_patch16_224 (reference utils_architecture.py:288)
    "m": dict(embed_dim=512, depth=12, num_heads=8, init_values=1e-6, no_embed_class=True),
    # timm vit_base_patch16_224 (reference utils_architecture.py:298)
    "b": dict(embed_dim=768, depth=12, num_heads=12),
}
