"""Pallas TPU kernel: fused multi-head self-attention (forward + VJP).

Why: the XLA path materializes the f32 [B, H, N, N] attention scores and
probabilities in HBM around the softmax (~10-15 ms of the 123 ms ViT-S@224
AT step, PROFILE.md). At this workload's sequence lengths (197 tokens @224,
401 @320) the whole per-(batch, head) problem fits VMEM, so no online
(flash) softmax is needed: one grid step computes QKᵀ -> masked softmax ->
PV entirely on-chip, reading Q/K/V once and writing O once.

Backward (standard attention VJP, also all-in-VMEM per grid step):
  dV = Pᵀ dO;  dP = dO Vᵀ;  dS = P ⊙ (dP - rowsum(dP ⊙ P));
  dQ = dS K · scale;  dK = dSᵀ Q · scale
This kernel has no weight cotangents, so it serves the attack closures
(input-grad-only) and the training backward equally.

Sequence padding: N is padded to a multiple of 8 (Mosaic sublane tiling);
padded KEY columns are masked to -inf before the softmax, padded QUERY rows
produce garbage that is sliced away. head_dim must be lane-tileable (64 ok).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# the unrolled-head backward's live temporaries exceed Mosaic's default
# 16 MB scoped-VMEM stack at long sequences (npad=408: 16.3 MB even after
# the cast-on-append restructure below) — raise the cap as block_mlp.py
# does for ConvNeXt-L; v5e has 128 MB physical VMEM
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)


def _softmax_f32(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid):
    # statically unrolled loop over the heads in this block; input dtype is
    # kept (bf16 for bf16 models), accumulation f32 via preferred_element_type
    for g in range(q_ref.shape[0]):
        q = q_ref[g]
        k = k_ref[g]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        npad = s.shape[-1]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, npad), 1)
        s = jnp.where(col < n_valid, s, NEG_INF)
        p = _softmax_f32(s)
        o = jnp.dot(p.astype(q.dtype), v_ref[g],
                    preferred_element_type=jnp.float32)
        o_ref[g] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale, n_valid):
    for g in range(q_ref.shape[0]):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        do = do_ref[g].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        npad = s.shape[-1]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, npad), 1)
        s = jnp.where(col < n_valid, s, NEG_INF)
        p = _softmax_f32(s)
        p16 = p.astype(q.dtype)
        do16 = do.astype(q.dtype)

        dv = jax.lax.dot_general(
            p16, do16, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do16, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds16 = (ds * scale).astype(q.dtype)
        dq = jnp.dot(ds16, k, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            ds16, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq_ref[g] = dq.astype(dq_ref.dtype)
        dk_ref[g] = dk.astype(dk_ref.dtype)
        dv_ref[g] = dv.astype(dv_ref.dtype)


def _pad_n(x, npad):
    n = x.shape[1]
    if n == npad:
        return x
    return jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)))


def _pick_gtile(G, npad, hd, *, bwd=False):
    """Heads per grid step: amortize per-step overhead while staying under
    ~8 MB of the 16 MB scoped VMEM. The backward holds far more live state
    than the forward (s, p, dp, ds f32 [npad, npad] temporaries plus seven
    q/k/v/do/dq/dk/dv blocks vs one matrix + four blocks), so it gets its
    own, smaller budget — mirroring block_mlp's m_tile vs m_tile_bwd split."""
    if bwd:
        per_g = 5 * 4 * npad * npad + 7 * 4 * npad * hd
    else:
        per_g = 4 * npad * npad + 8 * npad * hd
    cap = max(1, 8_000_000 // per_g)
    t = 1
    for cand in range(1, min(G, cap) + 1):
        if G % cand == 0:
            t = cand
    return t


def _specs(gt, npad, hd):
    return pl.BlockSpec((gt, npad, hd), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention_bhnd(q, k, v, scale, interpret):
    return _fwd_impl(q, k, v, scale, interpret)


def _fwd_impl(q, k, v, scale, interpret):
    G, N, hd = q.shape
    npad = -(-N // 8) * 8
    gt = _pick_gtile(G, npad, hd)
    qp, kp, vp = (_pad_n(t, npad) for t in (q, k, v))
    sp = _specs(gt, npad, hd)
    o = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_valid=N),
        grid=(G // gt,),
        in_specs=[sp, sp, sp],
        out_specs=sp,
        out_shape=jax.ShapeDtypeStruct((G, npad, hd), q.dtype),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(qp, kp, vp)
    return o[:, :N, :]


def _vjp_fwd(q, k, v, scale, interpret):
    return _fwd_impl(q, k, v, scale, interpret), (q, k, v)


def _vjp_bwd(scale, interpret, res, do):
    q, k, v = res
    G, N, hd = q.shape
    npad = -(-N // 8) * 8
    gt = _pick_gtile(G, npad, hd, bwd=True)
    qp, kp, vp, dop = (_pad_n(t, npad) for t in (q, k, v, do))
    sp = _specs(gt, npad, hd)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_valid=N),
        grid=(G // gt,),
        in_specs=[sp, sp, sp, sp],
        out_specs=(sp, sp, sp),
        out_shape=tuple(jax.ShapeDtypeStruct((G, npad, hd), q.dtype) for _ in range(3)),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(qp, kp, vp, dop)
    return dq[:, :N, :], dk[:, :N, :], dv[:, :N, :]


_attention_bhnd.defvjp(_vjp_fwd, _vjp_bwd)


def fused_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """q/k/v: [B, N, H, head_dim] -> [B, N, H, head_dim] (softmax(QKᵀ/√d)V)."""
    B, N, H, hd = q.shape
    scale = hd ** -0.5

    def to_g(t):
        return t.transpose(0, 2, 1, 3).reshape(B * H, N, hd)

    o = _attention_bhnd(to_g(q), to_g(k), to_g(v), scale, interpret)
    return o.reshape(B, H, N, hd).transpose(0, 2, 1, 3)


# --------------------------------------------------------------------------
# v2: qkv-layout kernel — no transposes, no explicit pads, fused dqkv.
#
# The v1 wrapper costs real HBM traffic at every kernel boundary: 3 (4 in
# the backward) [B,H,N,hd] transposes + 197->200 pads on the way in, a
# transpose + slice on the way out, and XLA re-concatenates dq/dk/dv into
# the [B,N,3,H,hd] cotangent of the qkv reshape (round-3 per-op table:
# 17.7 ms/step of pure reshape/pad/transpose on ViT-S, PROFILE.md). This
# version consumes the qkv Dense OUTPUT [B, N, 3D] directly: heads are
# static 64-lane slices inside the kernel, the token axis is a ragged
# Mosaic block (npad block over an N-row array: out-of-bounds reads are
# masked before use, out-of-bounds writes are discarded by Mosaic), and
# the backward writes ONE [B, N, 3D] dqkv buffer that flows straight into
# the Dense VJP.
# --------------------------------------------------------------------------


def _row_col_masks(npad, n_valid):
    row = jax.lax.broadcasted_iota(jnp.int32, (npad, 1), 0) < n_valid
    col = jax.lax.broadcasted_iota(jnp.int32, (1, npad), 1) < n_valid
    return row, col


def _fwd_qkv_kernel(qkv_ref, o_ref, *, scale, n_valid, num_heads):
    gb, npad, threeD = qkv_ref.shape
    D = threeD // 3
    hd = D // num_heads
    row, col = _row_col_masks(npad, n_valid)
    for i in range(gb):
        # zero out-of-bounds rows: ragged-edge reads are unspecified bits
        # (possibly NaN) and 0*NaN would poison the head reductions
        blk = jnp.where(row, qkv_ref[i], 0)
        outs = []
        for g in range(num_heads):
            q = blk[:, g * hd:(g + 1) * hd]
            k = blk[:, D + g * hd:D + (g + 1) * hd]
            v = blk[:, 2 * D + g * hd:2 * D + (g + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            s = jnp.where(col, s, NEG_INF)
            p = _softmax_f32(s)
            outs.append(jnp.dot(p.astype(q.dtype), v,
                                preferred_element_type=jnp.float32
                                ).astype(o_ref.dtype))
        o_ref[i] = jnp.concatenate(outs, axis=1)


def _bwd_qkv_kernel(qkv_ref, do_ref, dqkv_ref, *, scale, n_valid, num_heads):
    gb, npad, threeD = qkv_ref.shape
    D = threeD // 3
    hd = D // num_heads
    row, col = _row_col_masks(npad, n_valid)
    for i in range(gb):
        blk = jnp.where(row, qkv_ref[i], 0)
        do_blk = jnp.where(row, do_ref[i], 0)
        dqs, dks, dvs = [], [], []
        for g in range(num_heads):
            q = blk[:, g * hd:(g + 1) * hd]
            k = blk[:, D + g * hd:D + (g + 1) * hd]
            v = blk[:, 2 * D + g * hd:2 * D + (g + 1) * hd]
            do = do_blk[:, g * hd:(g + 1) * hd]

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            s = jnp.where(col, s, NEG_INF)
            p = _softmax_f32(s)
            p16 = p.astype(q.dtype)

            dv = jax.lax.dot_general(
                p16, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ds16 = (ds * scale).astype(q.dtype)
            dq = jnp.dot(ds16, k, preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                ds16, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            # cast on append: keeping 3*num_heads f32 [npad, hd] cotangents
            # live through one [npad, 3D] f32 concat blew the 16 MB scoped-
            # VMEM stack at npad=408 (ViT-B @320, queue10); bf16 lists +
            # three lane-aligned per-third stores peak ~8 MB instead
            dqs.append(dq.astype(dqkv_ref.dtype))
            dks.append(dk.astype(dqkv_ref.dtype))
            dvs.append(dv.astype(dqkv_ref.dtype))
        dqkv_ref[i, :, 0:D] = jnp.concatenate(dqs, axis=1)
        dqkv_ref[i, :, D:2 * D] = jnp.concatenate(dks, axis=1)
        dqkv_ref[i, :, 2 * D:3 * D] = jnp.concatenate(dvs, axis=1)


def _pick_gb(B, npad, D, *, bwd=False):
    """Images per grid step: amortize per-step overhead under ~8 MB VMEM.
    Double-buffered blocks: fwd holds qkv+o rows, bwd qkv+do+dqkv rows;
    the [npad, npad] f32 softmax temporaries don't scale with gb."""
    if bwd:
        per_img = 2 * (npad * 3 * D + npad * D + npad * 3 * D) * 2
    else:
        per_img = 2 * (npad * 3 * D + npad * D) * 2
    cap = max(1, 8_000_000 // per_img)
    t = 1
    for cand in range(1, min(B, cap) + 1):
        if B % cand == 0:
            t = cand
    return t


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _attention_qkv(qkv, num_heads, scale, interpret):
    return _fwd_qkv_impl(qkv, num_heads, scale, interpret)


def _fwd_qkv_impl(qkv, num_heads, scale, interpret):
    B, N, threeD = qkv.shape
    D = threeD // 3
    npad = -(-N // 8) * 8
    gb = _pick_gb(B, npad, D)
    o = pl.pallas_call(
        functools.partial(_fwd_qkv_kernel, scale=scale, n_valid=N,
                          num_heads=num_heads),
        grid=(B // gb,),
        in_specs=[pl.BlockSpec((gb, npad, threeD), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((gb, npad, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), qkv.dtype),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(qkv)
    return o


def _vjp_qkv_fwd(qkv, num_heads, scale, interpret):
    return _fwd_qkv_impl(qkv, num_heads, scale, interpret), (qkv,)


def _vjp_qkv_bwd(num_heads, scale, interpret, res, do):
    (qkv,) = res
    B, N, threeD = qkv.shape
    D = threeD // 3
    npad = -(-N // 8) * 8
    gb = _pick_gb(B, npad, D, bwd=True)
    dqkv = pl.pallas_call(
        functools.partial(_bwd_qkv_kernel, scale=scale, n_valid=N,
                          num_heads=num_heads),
        grid=(B // gb,),
        in_specs=[
            pl.BlockSpec((gb, npad, threeD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, npad, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, npad, threeD), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, threeD), qkv.dtype),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(qkv, do)
    return (dqkv,)


_attention_qkv.defvjp(_vjp_qkv_fwd, _vjp_qkv_bwd)


def fused_attention_qkv(
    qkv: jax.Array, num_heads: int, *, interpret: bool = False
) -> jax.Array:
    """qkv: [B, N, 3·D] (the qkv Dense output, head-major per group) ->
    [B, N, D] = softmax(QKᵀ/√head_dim)V concatenated over heads."""
    D = qkv.shape[-1] // 3
    scale = (D // num_heads) ** -0.5
    return _attention_qkv(qkv, num_heads, scale, interpret)
