"""Pallas TPU kernel: 7x7 depthwise convolution (NHWC), forward + custom VJP.

Why: XLA's depthwise conv lowering takes ~25% of the AT train step at well
below VPU roofline (profiled on v5e). A depthwise conv never touches the
MXU — it is 49 shifted multiply-accumulates per output element on the VPU —
so the win is tight VMEM scheduling: one grid step per image, the whole
(padded) feature map resident in a VMEM scratch, 49 statically-unrolled
shifted MACs.

Backward: dx is the correlation with the flipped kernel over the padded
cotangent (same shifted-MAC structure); dw/db accumulate in f32 output refs
across the sequential grid.

Layouts: x [B, H, W, C]; kernel [7, 7, 1, C] (flax depthwise HWIO); bias [C].
Used for feature maps that fit VMEM padded in f32 (<= ~3 MB — every ConvNeXt
stage at <=320px input).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 7
P = K // 2  # pad 3

# the v2 hoisted-shift kernels' unrolled tap reads make Mosaic's stack
# accounting balloon past the default 16 MB scoped-vmem cap (41.8 MB at
# stage-0 shape); v5e has 128 MB physical VMEM
_V2_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _fwd_kernel(x_ref, w_ref, b_ref, y_ref, xpad):
    H = x_ref.shape[1]
    W = x_ref.shape[2]
    xpad[:] = jnp.zeros_like(xpad)
    xpad[P : P + H, P : P + W, :] = x_ref[0].astype(jnp.float32)
    acc = jnp.broadcast_to(b_ref[0], (H, W, b_ref.shape[1])).astype(jnp.float32)
    for i in range(K):
        for j in range(K):
            acc += w_ref[i * K + j] * xpad[i : i + H, j : j + W, :]
    y_ref[0] = acc.astype(y_ref.dtype)


def _bwd_kernel(x_ref, w_ref, dy_ref, dx_ref, dw_ref, db_ref, xpad, dypad):
    H = x_ref.shape[1]
    W = x_ref.shape[2]
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    x = x_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)

    xpad[:] = jnp.zeros_like(xpad)
    xpad[P : P + H, P : P + W, :] = x
    dypad[:] = jnp.zeros_like(dypad)
    dypad[P : P + H, P : P + W, :] = dy

    db_ref[0] += jnp.sum(dy, axis=(0, 1))

    dx = jnp.zeros_like(x)
    for i in range(K):
        for j in range(K):
            # dw[i,j,c] = sum_pq x_pad[p+i, q+j, c] * dy[p, q, c]
            dw_ref[i * K + j] += jnp.sum(xpad[i : i + H, j : j + W, :] * dy, axis=(0, 1))
            # dx = correlation of dy_pad with the flipped kernel
            dx += w_ref[(K - 1 - i) * K + (K - 1 - j)] * dypad[i : i + H, j : j + W, :]
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _img_spec(H, W, C):
    return pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)


def _w_spec(C):
    return pl.BlockSpec((K * K, C), lambda b: (0, 0), memory_space=pltpu.VMEM)


def _vec_spec(C):
    return pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def dwconv7x7(x, w, b, interpret=False):
    """Depthwise 7x7 conv, SAME padding. w: [7,7,1,C] (or [7,7,C]), b: [C]."""
    return _fwd_impl(x, w, b, interpret)


def _fwd_impl(x, w, b, interpret):
    B, H, W, C = x.shape
    w2 = w.reshape(K * K, C).astype(jnp.float32)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(B,),
        in_specs=[_img_spec(H, W, C), _w_spec(C), _vec_spec(C)],
        out_specs=_img_spec(H, W, C),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((H + 2 * P, W + 2 * P, C), jnp.float32)],
        interpret=interpret,
    )(x, w2, b.reshape(1, C).astype(jnp.float32))


def _vjp_fwd(x, w, b, interpret):
    return _fwd_impl(x, w, b, interpret), (x, w)


def _vjp_bwd(interpret, res, dy):
    x, w = res
    B, H, W, C = x.shape
    w2 = w.reshape(K * K, C).astype(jnp.float32)
    dx, dw, db = pl.pallas_call(
        _bwd_kernel,
        grid=(B,),
        in_specs=[_img_spec(H, W, C), _w_spec(C), _img_spec(H, W, C)],
        out_specs=(_img_spec(H, W, C), _w_spec(C), _vec_spec(C)),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((K * K, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((H + 2 * P, W + 2 * P, C), jnp.float32),
            pltpu.VMEM((H + 2 * P, W + 2 * P, C), jnp.float32),
        ],
        interpret=interpret,
    )(x, w2, dy)
    return dx, dw.reshape(w.shape), db.reshape(-1)


dwconv7x7.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# v2: hoisted W-shifts ("ring buffer" scheduling, VERDICT r2 item 2 /
# NEXT.md item 3). The v1 kernel measured SLOWER than XLA because its 49
# taps each read `xpad[i:i+H, j:j+W, :]` — the W-offset j misaligns the
# sublane dimension, so 42 of 49 reads pay a cross-sublane rotate. v2 does
# ONE misaligned copy per column offset j into a sublane-aligned scratch
# (7 total), then the 7 row taps for that j are plain row-offset reads:
# 7 misaligned + 49 aligned accesses instead of 49 misaligned.
# ---------------------------------------------------------------------------


def _fwd_kernel_v2(x_ref, w_ref, b_ref, y_ref, xpad, sh):
    H = x_ref.shape[1]
    W = x_ref.shape[2]
    xpad[:] = jnp.zeros_like(xpad)
    xpad[P : P + H, P : P + W, :] = x_ref[0].astype(jnp.float32)
    acc = jnp.broadcast_to(b_ref[0], (H, W, b_ref.shape[1])).astype(jnp.float32)
    for j in range(K):
        sh[:] = xpad[:, j : j + W, :]  # the one misaligned read for this j
        for i in range(K):
            acc += w_ref[i * K + j] * sh[i : i + H, :, :]
    y_ref[0] = acc.astype(y_ref.dtype)


def _bwd_kernel_v2(x_ref, w_ref, dy_ref, dx_ref, dw_ref, db_ref, xpad, dypad, sh):
    H = x_ref.shape[1]
    W = x_ref.shape[2]
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    x = x_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)

    xpad[:] = jnp.zeros_like(xpad)
    xpad[P : P + H, P : P + W, :] = x
    dypad[:] = jnp.zeros_like(dypad)
    dypad[P : P + H, P : P + W, :] = dy

    db_ref[0] += jnp.sum(dy, axis=(0, 1))

    # dw[i,j,c] = sum_pq xpad[p+i, q+j, c] * dy[p, q, c]: hoist the j-shift
    for j in range(K):
        sh[:] = xpad[:, j : j + W, :]
        for i in range(K):
            dw_ref[i * K + j] += jnp.sum(sh[i : i + H, :, :] * dy, axis=(0, 1))

    # dx = correlation of dy_pad with the flipped kernel: hoist likewise
    dx = jnp.zeros_like(x)
    for j in range(K):
        sh[:] = dypad[:, j : j + W, :]
        for i in range(K):
            dx += w_ref[(K - 1 - i) * K + (K - 1 - j)] * sh[i : i + H, :, :]
    dx_ref[0] = dx.astype(dx_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def dwconv7x7_v2(x, w, b, interpret=False):
    """Depthwise 7x7 conv, SAME padding, hoisted-shift scheduling."""
    return _fwd_impl_v2(x, w, b, interpret)


def _fwd_impl_v2(x, w, b, interpret):
    B, H, W, C = x.shape
    w2 = w.reshape(K * K, C).astype(jnp.float32)
    return pl.pallas_call(
        _fwd_kernel_v2,
        grid=(B,),
        in_specs=[_img_spec(H, W, C), _w_spec(C), _vec_spec(C)],
        out_specs=_img_spec(H, W, C),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((H + 2 * P, W + 2 * P, C), jnp.float32),
            pltpu.VMEM((H + 2 * P, W, C), jnp.float32),
        ],
        compiler_params=_V2_PARAMS,
        interpret=interpret,
    )(x, w2, b.reshape(1, C).astype(jnp.float32))


def _vjp_fwd_v2(x, w, b, interpret):
    return _fwd_impl_v2(x, w, b, interpret), (x, w)


def _vjp_bwd_v2(interpret, res, dy):
    x, w = res
    B, H, W, C = x.shape
    w2 = w.reshape(K * K, C).astype(jnp.float32)
    dx, dw, db = pl.pallas_call(
        _bwd_kernel_v2,
        grid=(B,),
        in_specs=[_img_spec(H, W, C), _w_spec(C), _img_spec(H, W, C)],
        out_specs=(_img_spec(H, W, C), _w_spec(C), _vec_spec(C)),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((K * K, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((H + 2 * P, W + 2 * P, C), jnp.float32),
            pltpu.VMEM((H + 2 * P, W + 2 * P, C), jnp.float32),
            pltpu.VMEM((H + 2 * P, W, C), jnp.float32),
        ],
        compiler_params=_V2_PARAMS,
        interpret=interpret,
    )(x, w2, dy)
    return dx, dw.reshape(w.shape), db.reshape(-1)


dwconv7x7_v2.defvjp(_vjp_fwd_v2, _vjp_bwd_v2)
