"""Pallas TPU kernel: fused LayerNorm -> Dense(4C) -> GELU -> Dense(C)
-> LayerScale -> (DropPath) -> residual — the ConvNeXt block tail.

Why: profiling the fused AT train step on v5e shows the XLA fusions around
the two pointwise matmuls at ~13 TF/s (HBM-bound, 56% of step time): each
block tail materializes the LN output, the 4C-wide GELU activation and the
LayerScale product in HBM. This kernel keeps all of it in VMEM: per tile it
reads the dwconv output `s` and the residual `r` once and writes `y` once.

Backward is a second Pallas kernel via custom_vjp: it saves only `s` and the
small parameters, recomputes LN/h/gelu per tile (flash-style), emits `ds` in
one pass, and accumulates dW1/db1/dW2/db2/dgamma/dLN in f32 output refs
across the (sequential) TPU grid.

Used for channel widths C <= 384 (stages 0-2 of ConvNeXt-T/S); at C = 768
the resident f32 weight-grad accumulators outgrow VMEM — XLA keeps stage 3.

Semantics: y = r + keep * gamma * (gelu(LN(s) @ W1 + b1) @ W2 + b2)
  keep:  per-sample DropPath scale (1/keep_prob or 0), [B] f32 (ones if off)
  LN:    eps 1e-6, f32 statistics. GELU: exact (erf), matching timm.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# pick_m_tile budgets ~14 MB of kernel-resident state against Mosaic's
# default 16 MB scoped-vmem cap, but the compiler's own stack/spill
# accounting can push a few % past it at big widths (ConvNeXt-L stage 0:
# 16.5 MB). v5e has 128 MB of physical VMEM — raise the scoped cap instead
# of shrinking the perf-tuned tiles.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)

# wide heavy tails (wide_tail models, C > 512 full backward): the fixed
# kernel-resident state alone is 12*C*H bytes (28.3 MB @ C=768/H=3072,
# 50.3 MB @ C=1024/H=4096), past the 32 MB cap — raise to 64 MB for those
# calls only (v5e: 128 MB physical VMEM; the cap trades against Mosaic's
# DMA double-buffering headroom, so keep 32 MB everywhere else).
_COMPILER_PARAMS_WIDE = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
_WIDE_FIXED_THRESHOLD = 26_000_000  # heavy fixed state above this -> wide


def _heavy_compiler_params(C: int, H: int) -> pltpu.CompilerParams:
    return (_COMPILER_PARAMS_WIDE if 12 * C * H > _WIDE_FIXED_THRESHOLD
            else _COMPILER_PARAMS)

SQRT_2 = math.sqrt(2.0)
INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


# GELU inside the kernel uses the tanh form (|gelu_tanh - gelu_erf| <= ~3e-3,
# below the bf16 resolution of the matmul that consumes it). The erf-exact
# chain costs ~2.5x more VPU ops (div + exp + 10-term poly) and profiling
# shows the kernel is VPU-bound on exactly this elementwise chain.
_K0 = 0.7978845608028654  # sqrt(2/pi)
_K1 = 0.044715


def _gelu_f32(h):
    t = jnp.tanh(_K0 * (h + _K1 * h * h * h))
    return 0.5 * h * (1.0 + t)


def _gelu_and_dgelu_f32(h):
    """(gelu(h), gelu'(h)) sharing one tanh evaluation."""
    inner = _K0 * (h + _K1 * h * h * h)
    t = jnp.tanh(inner)
    g = 0.5 * h * (1.0 + t)
    dinner = _K0 * (1.0 + 3.0 * _K1 * h * h)
    dg = 0.5 * (1.0 + t) + 0.5 * h * (1.0 - t * t) * dinner
    return g, dg


def _dgelu_f32(h):
    return _gelu_and_dgelu_f32(h)[1]


def _ln_f32(s, g, b, eps=1e-6):
    mu = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean((s - mu) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (s - mu) * inv
    return xhat * g + b, xhat, inv


def _dotT_acc(a16, b16):
    """a16 [m, P], b16 [m, Q] -> a16^T @ b16 [P, Q] in f32 (weight grads)."""
    return jax.lax.dot_general(
        a16, b16, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_rhsT(a16, w16):
    """a16 [m, Q] @ w16[P, Q]^T -> [m, P] in f32."""
    return jax.lax.dot_general(
        a16, w16, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


# ------------------------------------------------------------------ forward

def _fwd_kernel(s_ref, r_ref, keep_ref, lng_ref, lnb_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, gamma_ref, y_ref):
    s = s_ref[0].astype(jnp.float32)
    u, _, _ = _ln_f32(s, lng_ref[0], lnb_ref[0])
    h = jnp.dot(u.astype(jnp.bfloat16), w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[0]
    g = _gelu_f32(h)
    o = jnp.dot(g.astype(jnp.bfloat16), w2_ref[:], preferred_element_type=jnp.float32)
    o = o + b2_ref[0]
    keep = keep_ref[pl.program_id(0), 0]
    y = r_ref[0].astype(jnp.float32) + keep * gamma_ref[0] * o
    y_ref[0] = y.astype(y_ref.dtype)


# ----------------------------------------------------------------- backward

def _bwd_kernel(s_ref, keep_ref, lng_ref, lnb_ref, w1_ref, b1_ref, w2g_ref,
                dy_ref,
                ds_ref, dw1_ref, db1_ref, dA_ref, dlng_ref, dlnb_ref):
    """Full backward, gamma folded into w2g = w2 * gamma (host side).

    Lets the kernel skip recomputing o = g @ W2 (it was needed ONLY for the
    o-part of dgamma): with A := g16^T @ kdy16 accumulated instead of dw2,
    the caller recovers  dw2 = A * gamma,  dgamma_o = sum_h W2 * A,  and
    db2 = gamma * sum(kdy)  outside the kernel — 5 matmul units instead of
    6 and two fewer f32 accumulators."""
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dA_ref[:] = jnp.zeros_like(dA_ref)
        dlng_ref[:] = jnp.zeros_like(dlng_ref)
        dlnb_ref[:] = jnp.zeros_like(dlnb_ref)

    s = s_ref[0].astype(jnp.float32)
    g_ln = lng_ref[0]
    u, xhat, inv = _ln_f32(s, g_ln, lnb_ref[0])
    u16 = u.astype(jnp.bfloat16)
    h = jnp.dot(u16, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[0]
    g, dgelu = _gelu_and_dgelu_f32(h)
    g16 = g.astype(jnp.bfloat16)

    dy = dy_ref[0].astype(jnp.float32)
    keep = keep_ref[pl.program_id(0), 0]
    kdy16 = (keep * dy).astype(jnp.bfloat16)

    dA_ref[:] += _dotT_acc(g16, kdy16)      # dw2 = A*gamma, dgamma_o = W2.A
    dg = _dot_rhsT(kdy16, w2g_ref[:])       # = (kdy*gamma) @ W2^T
    dh = dg * dgelu
    dh16 = dh.astype(jnp.bfloat16)
    db1_ref[0] += jnp.sum(dh, axis=0)
    dw1_ref[:] += _dotT_acc(u16, dh16)
    du = _dot_rhsT(dh16, w1_ref[:])

    dlng_ref[0] += jnp.sum(du * xhat, axis=0)
    dlnb_ref[0] += jnp.sum(du, axis=0)

    dxh = du * g_ln
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    ds = inv * (dxh - m1 - xhat * m2)
    ds_ref[0] = ds.astype(ds_ref.dtype)


def _bwd_ds_kernel(s_ref, keep_ref, lng_ref, lnb_ref, w1_ref, b1_ref, w2g_ref,
                   dy_ref,
                   ds_ref, dh_ref, db1_ref, dA_ref, dlng_ref, dlnb_ref):
    """Split-backward pass 1 (VERDICT r4 item#5): the full backward WITHOUT
    the dw1 accumulation — one f32 [H,C] accumulator (dA) instead of two,
    so tiles grow toward the input-only kernel's budget — plus a bf16 dh
    side-output that pass 2 (_bwd_dw1_kernel) turns into dw1 with a pure
    matmul-shaped accumulation. Per-tile math identical to _bwd_kernel."""
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dA_ref[:] = jnp.zeros_like(dA_ref)
        dlng_ref[:] = jnp.zeros_like(dlng_ref)
        dlnb_ref[:] = jnp.zeros_like(dlnb_ref)

    s = s_ref[0].astype(jnp.float32)
    g_ln = lng_ref[0]
    u, xhat, inv = _ln_f32(s, g_ln, lnb_ref[0])
    u16 = u.astype(jnp.bfloat16)
    h = jnp.dot(u16, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[0]
    g, dgelu = _gelu_and_dgelu_f32(h)
    g16 = g.astype(jnp.bfloat16)

    dy = dy_ref[0].astype(jnp.float32)
    keep = keep_ref[pl.program_id(0), 0]
    kdy16 = (keep * dy).astype(jnp.bfloat16)

    dA_ref[:] += _dotT_acc(g16, kdy16)
    dg = _dot_rhsT(kdy16, w2g_ref[:])
    dh = dg * dgelu
    dh16 = dh.astype(jnp.bfloat16)
    dh_ref[0] = dh16                       # pass-2 input (bf16 HBM round-trip)
    db1_ref[0] += jnp.sum(dh, axis=0)
    du = _dot_rhsT(dh16, w1_ref[:])

    dlng_ref[0] += jnp.sum(du * xhat, axis=0)
    dlnb_ref[0] += jnp.sum(du, axis=0)

    dxh = du * g_ln
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    ds = inv * (dxh - m1 - xhat * m2)
    ds_ref[0] = ds.astype(ds_ref.dtype)


def _bwd_dw1_kernel(s_ref, lng_ref, lnb_ref, dh_ref, dw1_ref):
    """Split-backward pass 2: dw1 = LN(s)16^T @ dh16, accumulated over the
    grid. Recomputes ONLY the LayerNorm (VPU reductions, no matmul, no
    tanh); the lone f32 [C,H] accumulator + one matmul per tile makes this
    the bwd-input-kernel-shaped pattern the monolithic kernel can't reach."""
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)

    s = s_ref[0].astype(jnp.float32)
    u, _, _ = _ln_f32(s, lng_ref[0], lnb_ref[0])
    dw1_ref[:] += _dotT_acc(u.astype(jnp.bfloat16), dh_ref[0])


def _bwd_input_kernel(s_ref, keep_ref, lng_ref, lnb_ref, w1_ref, b1_ref,
                      w2g_ref, dy_ref, ds_ref):
    """Input-cotangent-only backward: ds from dy, NO weight gradients.

    The attack loop differentiates w.r.t. the INPUT only; a monolithic
    pallas_call can't be dead-code-eliminated by XLA, so the full backward
    would compute and throw away dW1/dW2/dLN/dgamma on every attack
    backward (6 matmul-units vs the 3 actually needed, plus the f32
    accumulator traffic). gamma is folded into w2g = w2 * gamma host-side
    (same formulation as the full backward — bit-identical ds)."""
    s = s_ref[0].astype(jnp.float32)
    g_ln = lng_ref[0]
    u, xhat, inv = _ln_f32(s, g_ln, lnb_ref[0])
    u16 = u.astype(jnp.bfloat16)
    h = jnp.dot(u16, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[0]
    dgelu = _dgelu_f32(h)

    dy = dy_ref[0].astype(jnp.float32)
    keep = keep_ref[pl.program_id(0), 0]
    kdy16 = (keep * dy).astype(jnp.bfloat16)
    dg = _dot_rhsT(kdy16, w2g_ref[:])
    dh16 = (dg * dgelu).astype(jnp.bfloat16)
    du = _dot_rhsT(dh16, w1_ref[:])

    dxh = du * g_ln
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    ds = inv * (dxh - m1 - xhat * m2)
    ds_ref[0] = ds.astype(ds_ref.dtype)


# ------------------------------------------------------------- custom vjp

def _specs(B, m_tile, C, H):
    return dict(
        s=pl.BlockSpec((1, m_tile, C), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        vecC=pl.BlockSpec((1, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        vecH=pl.BlockSpec((1, H), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        w1=pl.BlockSpec((C, H), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        w2=pl.BlockSpec((H, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        # whole [B,1] vector resident in VMEM; kernels index it by program_id
        keep=pl.BlockSpec((B, 1), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def block_mlp(s, r, keep, ln_g, ln_b, w1, b1, w2, b2, gamma, m_tile, interpret,
              grad_mode="full", m_tile_bwd=None):
    """grad_mode: 'full' computes all cotangents; 'input' computes only
    ds/dr (param cotangents returned as zeros) — for attack closures that
    differentiate w.r.t. the input only. NEVER use 'input' in a step that
    updates weights. m_tile_bwd: backward-kernel tile (defaults to m_tile);
    the full backward's f32 accumulators need a smaller tile than fwd."""
    return _fwd_impl(s, r, keep, ln_g, ln_b, w1, b1, w2, b2, gamma, m_tile, interpret)


def _fwd_impl(s, r, keep, ln_g, ln_b, w1, b1, w2, b2, gamma, m_tile, interpret):
    B, M, C = s.shape
    H = w1.shape[1]
    T = M // m_tile
    sp = _specs(B, m_tile, C, H)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(B, T),
        in_specs=[sp["s"], sp["s"], sp["keep"], sp["vecC"], sp["vecC"],
                  sp["w1"], sp["vecH"], sp["w2"], sp["vecC"], sp["vecC"]],
        out_specs=sp["s"],
        out_shape=jax.ShapeDtypeStruct((B, M, C), s.dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(s, r, keep.reshape(B, 1), ln_g.reshape(1, C), ln_b.reshape(1, C),
      w1, b1.reshape(1, H), w2, b2.reshape(1, C), gamma.reshape(1, C))


def _vjp_fwd(s, r, keep, ln_g, ln_b, w1, b1, w2, b2, gamma, m_tile, interpret,
             grad_mode="full", m_tile_bwd=None):
    y = _fwd_impl(s, r, keep, ln_g, ln_b, w1, b1, w2, b2, gamma, m_tile, interpret)
    return y, (s, keep, ln_g, ln_b, w1, b1, w2, b2, gamma)


def _vjp_bwd(m_tile, interpret, grad_mode, m_tile_bwd, res, dy):
    s, keep, ln_g, ln_b, w1, b1, w2, b2, gamma = res
    B, M, C = s.shape
    H = w1.shape[1]
    m_tile = m_tile_bwd if m_tile_bwd is not None else m_tile
    sp = _specs(B, m_tile, C, H)

    if grad_mode == "input":
        w2g16 = (w2.astype(jnp.float32) * gamma.astype(jnp.float32)).astype(jnp.bfloat16)
        ds = pl.pallas_call(
            _bwd_input_kernel,
            grid=(B, M // m_tile),
            in_specs=[sp["s"], sp["keep"], sp["vecC"], sp["vecC"], sp["w1"],
                      sp["vecH"], sp["w2"], sp["s"]],
            out_specs=sp["s"],
            out_shape=jax.ShapeDtypeStruct((B, M, C), s.dtype),
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(s, keep.reshape(B, 1), ln_g.reshape(1, C), ln_b.reshape(1, C), w1,
          b1.reshape(1, H), w2g16, dy)
        z = jnp.zeros
        return (ds, dy, jnp.zeros_like(keep),
                z((C,), ln_g.dtype), z((C,), ln_b.dtype),
                z((C, H), w1.dtype), z((H,), b1.dtype),
                z((H, C), w2.dtype), z((C,), b2.dtype), z((C,), gamma.dtype))

    if grad_mode == "split":
        return _bwd_split(s, keep, ln_g, ln_b, w1, b1, w2, b2, gamma,
                          m_tile, interpret, dy)

    out_shapes = (
        jax.ShapeDtypeStruct((B, M, C), s.dtype),   # ds
        jax.ShapeDtypeStruct((C, H), jnp.float32),  # dw1
        jax.ShapeDtypeStruct((1, H), jnp.float32),  # db1
        jax.ShapeDtypeStruct((H, C), jnp.float32),  # A = g^T @ kdy
        jax.ShapeDtypeStruct((1, C), jnp.float32),  # dln_g
        jax.ShapeDtypeStruct((1, C), jnp.float32),  # dln_b
    )
    out_specs = (sp["s"], sp["w1"], sp["vecH"], sp["w2"],
                 sp["vecC"], sp["vecC"])

    gamma_f = gamma.astype(jnp.float32)
    w2_f = w2.astype(jnp.float32)
    w2g16 = (w2_f * gamma_f).astype(jnp.bfloat16)

    ds, dw1, db1, dA, dlng, dlnb = pl.pallas_call(
        _bwd_kernel,
        grid=(B, M // m_tile),
        in_specs=[sp["s"], sp["keep"], sp["vecC"], sp["vecC"], sp["w1"],
                  sp["vecH"], sp["w2"], sp["s"]],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=_heavy_compiler_params(C, H),
        interpret=interpret,
    )(s, keep.reshape(B, 1), ln_g.reshape(1, C), ln_b.reshape(1, C), w1,
      b1.reshape(1, H), w2g16, dy)

    # recover the gamma-entangled cotangents from A = g16^T @ kdy16:
    #   dw2 = A * gamma;  dgamma = sum_h W2*A (o-part) + b2*sum(kdy);
    #   db2 = gamma * sum(kdy)
    kdy_sum = jnp.sum(dy.astype(jnp.float32) * keep.reshape(B, 1, 1), axis=(0, 1))
    dw2 = dA * gamma_f[None, :]
    db2 = gamma_f * kdy_sum
    dgamma = jnp.sum(w2_f * dA, axis=0) + b2.astype(jnp.float32) * kdy_sum
    dkeep = jnp.zeros_like(keep)  # droppath mask: no gradient needed
    dr = dy

    return (ds, dr, dkeep, dlng.reshape(C), dlnb.reshape(C), dw1,
            db1.reshape(H), dw2, db2, dgamma)


def _bwd_split(s, keep, ln_g, ln_b, w1, b1, w2, b2, gamma, m_tile, interpret, dy):
    """Two-kernel full backward (VERDICT r4 item#5): pass 1 emits ds + a
    bf16 dh side-array with dA/db1/dLN accumulated (ONE resident f32 [H,C]
    accumulator — tiles sized between the input-only and monolithic
    budgets); pass 2 accumulates dw1 = LN(s)16^T @ dh16 with only an LN
    recompute. Trades one [B,M,H] bf16 HBM round-trip (~3.2 ms/step at
    ConvNeXt-T@224 bs80 across stages 0-2) for the monolithic kernel's
    accumulator-starved tiles. Cotangent math identical to the monolithic
    kernel; accumulation tile-order differs (f32 sums re-associate)."""
    B, M, C = s.shape
    H = w1.shape[1]
    # pass 1: fixed = w1+w2g bf16 (4CH B) + dA f32 (4CH B); same per-row
    # temporaries as the monolithic heavy kernel
    m1_tile = pick_m_tile(M, C, H, heavy=True, fixed=8 * C * H)
    # pass 2: fixed = dw1 f32 only; per-row = s/u f32 + u16 (10C B) + dh16 (2H B)
    m2_tile = pick_m_tile(M, C, H, heavy=False, fixed=4 * C * H,
                          per_row=2 * H + 10 * C)
    sp1 = _specs(B, m1_tile, C, H)
    dh_spec1 = pl.BlockSpec((1, m1_tile, H), lambda b, t: (b, t, 0),
                            memory_space=pltpu.VMEM)

    gamma_f = gamma.astype(jnp.float32)
    w2_f = w2.astype(jnp.float32)
    w2g16 = (w2_f * gamma_f).astype(jnp.bfloat16)

    out_shapes = (
        jax.ShapeDtypeStruct((B, M, C), s.dtype),     # ds
        jax.ShapeDtypeStruct((B, M, H), jnp.bfloat16),  # dh16 (pass-2 input)
        jax.ShapeDtypeStruct((1, H), jnp.float32),    # db1
        jax.ShapeDtypeStruct((H, C), jnp.float32),    # A = g^T @ kdy
        jax.ShapeDtypeStruct((1, C), jnp.float32),    # dln_g
        jax.ShapeDtypeStruct((1, C), jnp.float32),    # dln_b
    )
    ds, dh16, db1, dA, dlng, dlnb = pl.pallas_call(
        _bwd_ds_kernel,
        grid=(B, M // m1_tile),
        in_specs=[sp1["s"], sp1["keep"], sp1["vecC"], sp1["vecC"], sp1["w1"],
                  sp1["vecH"], sp1["w2"], sp1["s"]],
        out_specs=(sp1["s"], dh_spec1, sp1["vecH"], sp1["w2"],
                   sp1["vecC"], sp1["vecC"]),
        out_shape=out_shapes,
        compiler_params=(_COMPILER_PARAMS_WIDE
                         if 8 * C * H > _WIDE_FIXED_THRESHOLD
                         else _COMPILER_PARAMS),
        interpret=interpret,
    )(s, keep.reshape(B, 1), ln_g.reshape(1, C), ln_b.reshape(1, C), w1,
      b1.reshape(1, H), w2g16, dy)

    sp2 = _specs(B, m2_tile, C, H)
    dh_spec2 = pl.BlockSpec((1, m2_tile, H), lambda b, t: (b, t, 0),
                            memory_space=pltpu.VMEM)
    dw1 = pl.pallas_call(
        _bwd_dw1_kernel,
        grid=(B, M // m2_tile),
        in_specs=[sp2["s"], sp2["vecC"], sp2["vecC"], dh_spec2],
        out_specs=sp2["w1"],
        out_shape=jax.ShapeDtypeStruct((C, H), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(s, ln_g.reshape(1, C), ln_b.reshape(1, C), dh16)

    kdy_sum = jnp.sum(dy.astype(jnp.float32) * keep.reshape(B, 1, 1), axis=(0, 1))
    dw2 = dA * gamma_f[None, :]
    db2 = gamma_f * kdy_sum
    dgamma = jnp.sum(w2_f * dA, axis=0) + b2.astype(jnp.float32) * kdy_sum
    dkeep = jnp.zeros_like(keep)
    dr = dy

    return (ds, dr, dkeep, dlng.reshape(C), dlnb.reshape(C), dw1,
            db1.reshape(H), dw2, db2, dgamma)


block_mlp.defvjp(_vjp_fwd, _vjp_bwd)


def tile_budget(C: int) -> int:
    """VMEM budget handed to pick_m_tile.

    C <= 384 keeps the measured 14 MB working set (PROFILE.md rooflines).
    Wider channels need more resident state (bf16 weights alone are
    4*C*4C bytes; the heavy backward adds f32 dW accumulators), so they
    get 26 MB against the raised 32 MB scoped cap (_COMPILER_PARAMS)."""
    return 14_000_000 if C <= 384 else 26_000_000


def tail_fusable(C: int, grad_mode: str, wide: bool = False) -> bool:
    """Channel-width gate for the fused block tail.

    The kernel is monolithic per grid step: the bf16 W1/W2 (4*C*4C bytes)
    must be VMEM-resident, plus f32 dW1/dW2 accumulators (8*C*4C) for the
    full backward. Under the 32 MB scoped cap that admits:
      - any C <= 384 (both modes, 14 MB working set — the measured config)
      - heavy/full backward through C=512 (fixed 12*C*4C = 12.6 MB @512;
        28.3 MB @768 busts the budget) — ViT-M
      - input-only backward (attack closures) through C=1024 (fixed
        4*C*4C = 16.8 MB @1024; 37.7 MB @1536 busts even the cap) —
        ViT-B blocks and ConvNeXt-B/L upper stages inside APGD closures.

    wide=True (the `wide_tail` model knob) additionally admits the heavy
    backward through C=1024 against a 64 MB scoped cap
    (_COMPILER_PARAMS_WIDE): fixed state 28.3 MB @768 (ViT-B,
    ConvNeXt-L stage 2) / 50.3 MB @1024 (ConvNeXt-B stage 3). C=1536
    (ConvNeXt-L stage 3) is impossible at any cap: 113 MB fixed.
    """
    if C <= 384:
        return True
    if grad_mode == "input":
        return C <= 1024
    return C <= (1024 if wide else 512)


def pick_m_tile(M: int, C: int, H: int, heavy: bool = True, *,
                fixed: int | None = None, per_row: int | None = None) -> int:
    """Largest tile dividing M whose kernel VMEM footprint fits the budget.

    heavy=True (full backward): resident bf16 weights + f32 dW1/dW2
    accumulators + ~4 f32 H-wide and ~4 f32 C-wide per-row temporaries.
    heavy=False (forward / input-only backward): no accumulators — much
    larger tiles, fewer grid steps. fixed/per_row override the byte model
    (the split-backward kernels have their own resident sets)."""
    if fixed is None:
        fixed = 2 * C * H * 2 + (2 * C * H * 4 if heavy else 0)
    if per_row is None:
        per_row = 16 * H + 16 * C
    budget = tile_budget(C)
    if heavy and fixed > _WIDE_FIXED_THRESHOLD:
        # wide heavy tail (only reachable via tail_fusable(wide=True)):
        # budget against the 64 MB scoped cap instead of the 32 MB one
        budget = 56_000_000
    cap = max(16, (budget - fixed) // per_row)
    # Mosaic requires the sublane (2nd-minor) block dim to be a multiple of 8
    # or equal to the array dim; search multiples of 8 dividing M, largest
    # within the cap, else fall back to the whole axis.
    best = None
    for cand in range(8, min(M, int(cap)) + 1, 8):
        if M % cand == 0:
            best = cand
    if best is not None:
        return best
    return M if M <= cap or M % 8 != 0 else 8


def vit_mlp_tail(
    x: jax.Array,  # block input after attention residual [B, N, C]
    keep: jax.Array | None,  # per-sample droppath scale [B] f32; None = inactive
    ln_g: jax.Array, ln_b: jax.Array,
    w1: jax.Array, b1: jax.Array,
    w2: jax.Array, b2: jax.Array,
    gamma: jax.Array,
    *,
    interpret: bool = False,
    grad_mode: str = "full",
) -> jax.Array:
    """Token-sequence wrapper for the ViT MLP tail: norm2 -> fc1 -> GELU ->
    fc2 -> LayerScale -> (DropPath) -> residual (models/vit.py ViTBlock,
    rebuilding the timm Mlp the reference's ViTs use,
    utils_architecture.py:271-301).

    Identical computation to the ConvNeXt block tail with s == r == x: the
    LN input IS the residual. keep=None flattens [B,N] into one grid row
    (the common case: DropPath off, or the eval-mode attack closure).
    """
    B, N, C = x.shape
    H = w1.shape[1]
    heavy_bwd = grad_mode != "input"
    if keep is None:
        BM = B * N
        xr = x.reshape(1, BM, C)
        y = block_mlp(
            xr, xr, jnp.ones((1,), jnp.float32),
            ln_g, ln_b, w1.astype(jnp.bfloat16), b1,
            w2.astype(jnp.bfloat16), b2, gamma,
            pick_m_tile(BM, C, H, heavy=False), interpret, grad_mode,
            pick_m_tile(BM, C, H, heavy=heavy_bwd),
        )
        return y.reshape(B, N, C)
    # per-sample keep: batch dim stays a grid axis; N (197/401) is not a
    # multiple of 8, so the tile is the whole token axis (allowed by Mosaic:
    # block dim == array dim)
    return block_mlp(
        x, x, keep.astype(jnp.float32),
        ln_g, ln_b, w1.astype(jnp.bfloat16), b1,
        w2.astype(jnp.bfloat16), b2, gamma,
        pick_m_tile(N, C, H, heavy=False), interpret, grad_mode,
        pick_m_tile(N, C, H, heavy=heavy_bwd),
    )


def convnext_block_tail(
    s: jax.Array,  # dwconv output [B, Hs, Ws, C]
    r: jax.Array,  # block input (residual) [B, Hs, Ws, C]
    keep: jax.Array | None,  # per-sample droppath scale [B] f32; None = inactive
    ln_g: jax.Array, ln_b: jax.Array,
    w1: jax.Array, b1: jax.Array,
    w2: jax.Array, b2: jax.Array,
    gamma: jax.Array,
    *,
    interpret: bool = False,
    grad_mode: str = "full",
) -> jax.Array:
    """NHWC wrapper around the fused block-tail kernel.

    keep=None (no DropPath — the paper's ConvNeXt-T recipe) flattens the
    batch into one grid row so tiles are maximal: ~2.6x fewer grid steps.

    grad_mode='input': backward computes only the input cotangent (for the
    attack closure, which never differentiates w.r.t. weights)."""
    B, Hs, Ws, C = s.shape
    H4 = w1.shape[1]
    M = Hs * Ws
    heavy_bwd = grad_mode != "input"
    if keep is None:
        BM = B * M
        y = block_mlp(
            s.reshape(1, BM, C), r.reshape(1, BM, C), jnp.ones((1,), jnp.float32),
            ln_g, ln_b, w1.astype(jnp.bfloat16), b1,
            w2.astype(jnp.bfloat16), b2, gamma,
            pick_m_tile(BM, C, H4, heavy=False), interpret, grad_mode,
            pick_m_tile(BM, C, H4, heavy=heavy_bwd),
        )
        return y.reshape(B, Hs, Ws, C)
    y = block_mlp(
        s.reshape(B, M, C), r.reshape(B, M, C), keep.astype(jnp.float32),
        ln_g, ln_b, w1.astype(jnp.bfloat16), b1,
        w2.astype(jnp.bfloat16), b2, gamma,
        pick_m_tile(M, C, H4, heavy=False), interpret, grad_mode,
        pick_m_tile(M, C, H4, heavy=heavy_bwd),
    )
    return y.reshape(B, Hs, Ws, C)
