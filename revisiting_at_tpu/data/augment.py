"""On-device RandAugment + RandomErasing (jitted, vmapped over the batch).

TPU-native re-design of the reference's CPU-side timm augmentation stack
(dataset_convnext_like.py:57-83 with parserr.Arguments_augment: RandAugment
'rand-m9-mstd0.5-inc1', RandomErasing p=0.25 'pixel' mode). With TPU hosts
(and this image's single CPU core) PIL-on-host can't feed a 2-step-APGD
train loop; these transforms run on device as part of the input program.

Semantics follow timm's increasing-severity RandAugment: 2 ops per image
drawn uniformly from 15 transforms, each applied with prob 0.5, magnitude
~ N(9, 0.5) clipped to [0, 10]. Geometric ops (rotate/shear/translate) are
a single bilinear affine warp with fill 0.5 (timm fill 128). Equalize uses
exact-histogram CDF mapping (PIL's LUT rounding differs at the last bit —
augmentation-grade approximation, documented deviation).

RandomErasing 'pixel' mode fills the box with N(0,1) noise — deliberately
NOT clamped to [0,1], matching timm-on-ToTensor'd-images in the reference
pipeline.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------- pixel ops

def _blend(a: Array, b: Array, factor: Array) -> Array:
    return b + factor * (a - b)


def _gray(x: Array) -> Array:
    w = jnp.array([0.299, 0.587, 0.114], x.dtype)
    return jnp.sum(x * w, axis=-1, keepdims=True)


def invert(x: Array, _lvl) -> Array:
    return 1.0 - x


def autocontrast(x: Array, _lvl) -> Array:
    lo = jnp.min(x, axis=(0, 1), keepdims=True)
    hi = jnp.max(x, axis=(0, 1), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / (hi - lo + 1e-12), 1.0)
    return jnp.clip((x - lo) * scale, 0.0, 1.0)


def equalize(x: Array, _lvl) -> Array:
    """PIL ImageOps.equalize, bit-exact (the op timm's RandAugment calls):
    integer LUT  lut[i] = (step//2 + sum(h[:i])) // step  with
    step = (N - count_of_last_nonzero_bin) // 255; identity when step == 0.

    TPU note: the histogram is a one-hot matmul (compare + MXU dot), not a
    scatter-add — TPU scatters serialize (~235 ms/batch measured on v5e vs
    ~10 ms for this form)."""

    def eq_channel(c: Array) -> Array:
        v = jnp.clip(jnp.floor(c * 255.0), 0, 255).astype(jnp.int32)
        vf = v.reshape(1, -1).astype(jnp.bfloat16)
        bins = jnp.arange(256, dtype=jnp.bfloat16)[:, None]
        # [256, N] one-hot (0/1 exact in bf16 for values <= 255) @ ones -> hist
        onehot = (vf == bins).astype(jnp.bfloat16)
        hist = jax.lax.dot_general(
            onehot, jnp.ones((v.size, 1), jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )[:, 0].astype(jnp.int32)
        nonzero = hist > 0
        # count of the LAST nonzero bin
        last_idx = 255 - jnp.argmax(nonzero[::-1])
        last_count = hist[last_idx]
        step = (v.size - last_count) // 255
        excl_cumsum = jnp.cumsum(hist) - hist
        lut = jnp.clip((step // 2 + excl_cumsum) // jnp.maximum(step, 1), 0, 255)
        # LUT application is the transposed one-hot matmul (no gather):
        # out_p = sum_c onehot[c, p] * lut[c]
        mapped = jax.lax.dot_general(
            onehot, lut.astype(jnp.bfloat16)[:, None],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )[:, 0].reshape(v.shape)
        out = jnp.where(step > 0, jnp.round(mapped), v.astype(jnp.float32))
        return out / 255.0

    return jnp.stack([eq_channel(x[..., i]) for i in range(3)], axis=-1)


def posterize(x: Array, lvl: Array) -> Array:
    bits = 4 - jnp.floor(lvl / 10.0 * 4.0).astype(jnp.int32)  # increasing severity
    bits = jnp.maximum(bits, 1)
    keep = jnp.left_shift(jnp.asarray(255, jnp.int32), 8 - bits) & 255
    v = jnp.clip(jnp.floor(x * 255.0), 0, 255).astype(jnp.int32)
    return (v & keep).astype(jnp.float32) / 255.0


def solarize(x: Array, lvl: Array) -> Array:
    thresh = (256.0 - lvl / 10.0 * 256.0) / 255.0  # increasing severity
    return jnp.where(x >= thresh, 1.0 - x, x)


def solarize_add(x: Array, lvl: Array) -> Array:
    add = lvl / 10.0 * 110.0 / 255.0
    return jnp.where(x < 128.0 / 255.0, jnp.clip(x + add, 0.0, 1.0), x)


def _enh_factor(lvl: Array, sign: Array) -> Array:
    return 1.0 + sign * lvl / 10.0 * 0.9


def color(x: Array, lvl: Array, sign: Array = 1.0) -> Array:
    return jnp.clip(_blend(x, jnp.broadcast_to(_gray(x), x.shape), _enh_factor(lvl, sign)), 0, 1)


def contrast(x: Array, lvl: Array, sign: Array = 1.0) -> Array:
    mean = jnp.mean(_gray(x))
    return jnp.clip(_blend(x, jnp.full_like(x, mean), _enh_factor(lvl, sign)), 0, 1)


def brightness(x: Array, lvl: Array, sign: Array = 1.0) -> Array:
    return jnp.clip(_blend(x, jnp.zeros_like(x), _enh_factor(lvl, sign)), 0, 1)


def sharpness(x: Array, lvl: Array, sign: Array = 1.0) -> Array:
    # PIL SMOOTH kernel, applied per channel with edge replication
    k = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], x.dtype) / 13.0
    xpad = jnp.pad(x, ((1, 1), (1, 1), (0, 0)), mode="edge")
    sm = jax.lax.conv_general_dilated(
        xpad[None].transpose(0, 3, 1, 2).reshape(3, 1, *xpad.shape[:2]),
        k[None, None],
        (1, 1),
        "VALID",
    ).reshape(3, *x.shape[:2]).transpose(1, 2, 0)
    return jnp.clip(_blend(x, sm, _enh_factor(lvl, sign)), 0, 1)


# ------------------------------------------------------------ geometric ops

def _affine_sample(x: Array, mat: Array, fill: float = 0.5) -> Array:
    """Bilinear sample x at A @ [xo, yo, 1] (PIL inverse-affine convention)."""
    h, w, _ = x.shape
    yo = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xo = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    xi = mat[0, 0] * xo + mat[0, 1] * yo + mat[0, 2]
    yi = mat[1, 0] * xo + mat[1, 1] * yo + mat[1, 2]

    x0 = jnp.floor(xi)
    y0 = jnp.floor(yi)
    wx = xi - x0
    wy = yi - y0

    def gather(yy, xx):
        inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        vals = x[yc, xc]
        return jnp.where(inb[..., None], vals, fill)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def _rotate_mat(deg: Array, h: int, w: int) -> Array:
    # PIL rotates counter-clockwise; this is the inverse (output->input) map,
    # verified against Image.rotate(90) in tests/test_augment_pil.py
    th = deg * jnp.pi / 180.0
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    c, s = jnp.cos(th), jnp.sin(th)
    # inverse affine about center
    return jnp.array(
        [
            [c, -s, cx - c * cx + s * cy],
            [s, c, cy - s * cx - c * cy],
        ]
    )


def _shear_x_mat(level: Array) -> Array:
    return jnp.array([[1.0, level, 0.0], [0.0, 1.0, 0.0]])


def _shear_y_mat(level: Array) -> Array:
    return jnp.array([[1.0, 0.0, 0.0], [level, 1.0, 0.0]])


def _translate_x_mat(pixels: Array) -> Array:
    return jnp.array([[1.0, 0.0, pixels], [0.0, 1.0, 0.0]])


def _translate_y_mat(pixels: Array) -> Array:
    return jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, pixels]])


# ----------------------------------------------- batched MXU affine warping
#
# Per-sample gathers are ~170 ms/batch on v5e (serialized); a banded one-hot
# matmul runs the same bilinear resample on the MXU in ~13 ms. Any affine
# warp factors into two 1-D resample passes (Catmull & Smith 1980):
#   out[h,w] = in[yi, xi],  xi = a w + b h + c,  yi = d w + e h + f
#   pass 1 (along W): tmp[h,w] = in[h, g(h,w)],
#       g(h,w) = (a - b d/e) w + (b/e) h + (c - b f/e)
#   pass 2 (along H): out[h,w] = tmp[d w + e h + f, w]
# (requires e != 0 — true for all RandAugment ops: |rotate| <= 30 deg).
#
# Interpolation note: the mapping is exact; the reconstruction kernel is
# separable-bilinear along the transformed axes, which for ROTATIONS differs
# from PIL's true 2D bilinear (identical for shears/translations). On
# natural images the difference is interpolation-noise-level; tests pin
# shear/translate exactly and rotation on smooth images.


def _resample_w(x: Array, tgt: Array, fill: float = 0.5) -> Array:
    """Bilinear 1-D resample along W: out[b,h,w] = x[b,h,tgt[b,h,w]] with
    boundary blending into `fill`. One-hot banded matmul on the MXU.

    HBM note: the one-hot operand is O(B*H*W^2) — 1.8 GB bf16 at the
    128x224x224 per-device full-recipe batch. It is built bf16 in ONE
    fused elementwise pass (the f32 build + cast + O(B*H*W^2) coverage
    reduction cost ~4x the traffic) and the batch is chunked when the
    transient would exceed ~2 GB, so growing batch or resolution degrades
    smoothly instead of blowing up HBM."""
    B, H, W, C = x.shape
    n_bytes = B * H * W * W * 2
    chunk = max(1, int(B * min(1.0, 2_000_000_000 / max(n_bytes, 1))))
    if chunk < B:
        outs = [
            _resample_w_impl(x[i : i + chunk], tgt[i : i + chunk], fill)
            for i in range(0, B, chunk)
        ]
        return jnp.concatenate(outs, axis=0)
    return _resample_w_impl(x, tgt, fill)


def _resample_w_impl(x: Array, tgt: Array, fill: float) -> Array:
    B, H, W, C = x.shape
    # index comparisons stay f32 (bf16 is exact only to 256; W can be 320);
    # only the interpolation WEIGHTS are bf16 — the same rounding as the
    # previous build-f32-then-cast, in one fused pass
    src = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 1, W), 3)
    t0f = jnp.floor(tgt)
    fr = (tgt - t0f).astype(jnp.bfloat16)[..., None]
    t0 = t0f[..., None]
    one = jnp.ones((), jnp.bfloat16)
    m16 = jnp.where(src == t0, one - fr, jnp.zeros((), jnp.bfloat16))
    m16 = m16 + jnp.where(src == t0 + 1.0, fr, jnp.zeros((), jnp.bfloat16))
    out = jax.lax.dot_general(
        m16, x.astype(jnp.bfloat16),
        (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )  # [B,H,Wout,C]
    # coverage analytically: the row sums to (1-fr)*[t0 in range] +
    # fr*[t0+1 in range] — no O(B*H*W^2) reduction needed
    frf = tgt - t0f
    in_lo = (t0f >= 0.0) & (t0f <= W - 1)
    in_hi = (t0f + 1.0 >= 0.0) & (t0f + 1.0 <= W - 1)
    cov = (1.0 - frf) * in_lo + frf * in_hi
    return out + (1.0 - cov)[..., None] * fill


def _resample_h(x: Array, tgt: Array, fill: float = 0.5) -> Array:
    xt = x.transpose(0, 2, 1, 3)
    out = _resample_w(xt, tgt.transpose(0, 2, 1), fill)
    return out.transpose(0, 2, 1, 3)


def warp_affine_batch(x: Array, mats: Array, fill: float = 0.5) -> Array:
    """Batched inverse-map affine warp. mats: [B, 2, 3] rows (a b c; d e f)."""
    B, H, W, _ = x.shape
    a, b, c = mats[:, 0, 0], mats[:, 0, 1], mats[:, 0, 2]
    d, e, f = mats[:, 1, 0], mats[:, 1, 1], mats[:, 1, 2]
    wo = jax.lax.broadcasted_iota(jnp.float32, (1, 1, W), 2)
    ho = jax.lax.broadcasted_iota(jnp.float32, (1, H, 1), 1)
    e_safe = jnp.where(jnp.abs(e) < 1e-6, 1e-6, e)
    g = (
        (a - b * d / e_safe)[:, None, None] * wo
        + (b / e_safe)[:, None, None] * ho
        + (c - b * f / e_safe)[:, None, None]
    )
    tmp = _resample_w(x, jnp.broadcast_to(g, (B, H, W)), fill)
    k = d[:, None, None] * wo + e[:, None, None] * ho + f[:, None, None]
    return _resample_h(tmp, jnp.broadcast_to(k, (B, H, W)), fill)


_IDENTITY_MAT = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])


def _geo_mat(op_idx: Array, lvl: Array, sign: Array, h: int, w: int) -> Array:
    """[2,3] inverse map for geometric ops; identity for photometric ones."""
    branches = [
        lambda: _IDENTITY_MAT,  # 0 autocontrast
        lambda: _IDENTITY_MAT,  # 1 equalize
        lambda: _IDENTITY_MAT,  # 2 invert
        lambda: _rotate_mat(sign * lvl / 10.0 * 30.0, h, w),  # 3
        lambda: _IDENTITY_MAT,  # 4 posterize
        lambda: _IDENTITY_MAT,  # 5 solarize
        lambda: _IDENTITY_MAT,  # 6 solarize_add
        lambda: _IDENTITY_MAT,  # 7 color
        lambda: _IDENTITY_MAT,  # 8 contrast
        lambda: _IDENTITY_MAT,  # 9 brightness
        lambda: _IDENTITY_MAT,  # 10 sharpness
        lambda: _shear_x_mat(sign * lvl / 10.0 * 0.3),  # 11
        lambda: _shear_y_mat(sign * lvl / 10.0 * 0.3),  # 12
        lambda: _translate_x_mat(sign * lvl / 10.0 * 0.45 * w),  # 13
        lambda: _translate_y_mat(sign * lvl / 10.0 * 0.45 * h),  # 14
    ]
    return jax.lax.switch(op_idx, branches)


_GEO_OPS = (3, 11, 12, 13, 14)


# ------------------------------------------------------------- rand augment

@dataclasses.dataclass(frozen=True)
class RandAugmentConfig:
    magnitude: float = 9.0
    mstd: float = 0.5
    num_layers: int = 2
    prob: float = 0.5


N_OPS = 15  # timm _RAND_INCREASING_TRANSFORMS


def _apply_op(x: Array, op_idx: Array, lvl: Array, sign: Array) -> Array:
    h, w, _ = x.shape

    def geo(mat_fn):
        return lambda xx: _affine_sample(xx, mat_fn())

    branches = [
        lambda xx: autocontrast(xx, lvl),  # 0
        lambda xx: equalize(xx, lvl),  # 1
        lambda xx: invert(xx, lvl),  # 2
        geo(lambda: _rotate_mat(sign * lvl / 10.0 * 30.0, h, w)),  # 3 Rotate
        lambda xx: posterize(xx, lvl),  # 4
        lambda xx: solarize(xx, lvl),  # 5
        lambda xx: solarize_add(xx, lvl),  # 6
        lambda xx: color(xx, lvl, sign),  # 7
        lambda xx: contrast(xx, lvl, sign),  # 8
        lambda xx: brightness(xx, lvl, sign),  # 9
        lambda xx: sharpness(xx, lvl, sign),  # 10
        geo(lambda: _shear_x_mat(sign * lvl / 10.0 * 0.3)),  # 11
        geo(lambda: _shear_y_mat(sign * lvl / 10.0 * 0.3)),  # 12
        geo(lambda: _translate_x_mat(sign * lvl / 10.0 * 0.45 * w)),  # 13
        geo(lambda: _translate_y_mat(sign * lvl / 10.0 * 0.45 * h)),  # 14
    ]
    return jax.lax.switch(op_idx, branches, x)


def rand_augment_single(rng: Array, img: Array, cfg: RandAugmentConfig) -> Array:
    """Per-image reference path (exact per-layer op order). The production
    path is rand_augment_batch — same distributions, MXU-friendly."""
    x = img
    for layer in range(cfg.num_layers):
        k = jax.random.fold_in(rng, layer)
        k_op, k_apply, k_lvl, k_sign = jax.random.split(k, 4)
        op_idx = jax.random.randint(k_op, (), 0, N_OPS)
        lvl = jnp.clip(
            cfg.magnitude + cfg.mstd * jax.random.normal(k_lvl), 0.0, 10.0
        )
        sign = jnp.where(jax.random.bernoulli(k_sign), 1.0, -1.0)
        apply = jax.random.bernoulli(k_apply, cfg.prob)
        x = jnp.where(apply, _apply_op(x, op_idx, lvl, sign), x)
    return x


def _apply_photometric(x: Array, op_idx: Array, lvl: Array, sign: Array) -> Array:
    """Photometric switch: geometric ops are identity here (their matrices
    compose into one batched warp, _geo_mat/warp_affine_batch)."""
    ident = lambda xx: xx
    branches = [
        lambda xx: autocontrast(xx, lvl),  # 0
        lambda xx: equalize(xx, lvl),  # 1
        lambda xx: invert(xx, lvl),  # 2
        ident,  # 3 rotate
        lambda xx: posterize(xx, lvl),  # 4
        lambda xx: solarize(xx, lvl),  # 5
        lambda xx: solarize_add(xx, lvl),  # 6
        lambda xx: color(xx, lvl, sign),  # 7
        lambda xx: contrast(xx, lvl, sign),  # 8
        lambda xx: brightness(xx, lvl, sign),  # 9
        lambda xx: sharpness(xx, lvl, sign),  # 10
        ident, ident, ident, ident,  # 11-14 shear/translate
    ]
    return jax.lax.switch(op_idx, branches, x)


def rand_augment_batch(rng: Array, images: Array, cfg: RandAugmentConfig) -> Array:
    """Batched RandAugment, TPU-first: photometric ops run in a (cheap,
    fused) per-image switch; geometric ops accumulate into ONE composed
    affine matrix per image, applied as a single two-pass MXU warp at the
    end (per-sample gathers measured ~170 ms/batch vs ~13 ms/pass matmuls).

    Documented deviation vs timm: when an image draws two geometric ops
    (P ~= 2.8% at prob 0.5), they are resampled ONCE through the composed
    matrix instead of twice sequentially (less interpolation blur); and a
    photometric op drawn after a geometric one is applied before the warp.
    Distributions of each op's parameters are unchanged."""
    b = images.shape[0]
    h, w = images.shape[1], images.shape[2]
    x = images
    eye = jnp.broadcast_to(jnp.eye(3), (b, 3, 3))
    total = eye
    bottom = jnp.broadcast_to(jnp.array([[[0.0, 0.0, 1.0]]]), (b, 1, 3))
    for layer in range(cfg.num_layers):
        k = jax.random.fold_in(rng, layer)
        k_op, k_apply, k_lvl, k_sign = jax.random.split(k, 4)
        op_idx = jax.random.randint(k_op, (b,), 0, N_OPS)
        lvl = jnp.clip(
            cfg.magnitude + cfg.mstd * jax.random.normal(k_lvl, (b,)), 0.0, 10.0
        )
        sign = jnp.where(jax.random.bernoulli(k_sign, shape=(b,)), 1.0, -1.0)
        apply = jax.random.bernoulli(k_apply, cfg.prob, (b,))
        y = jax.vmap(_apply_photometric)(x, op_idx, lvl, sign)
        x = jnp.where(apply.reshape(-1, 1, 1, 1), y, x)
        mats = jax.vmap(lambda o, l, s: _geo_mat(o, l, s, h, w))(op_idx, lvl, sign)
        hom = jnp.concatenate([mats, bottom], axis=1)
        hom = jnp.where(apply.reshape(-1, 1, 1), hom, eye)
        # inverse maps compose left-to-right in application order
        total = jnp.einsum("bij,bjk->bik", total, hom)
    return warp_affine_batch(x, total[:, :2, :])


def random_erasing_single(
    rng: Array,
    img: Array,
    prob: float = 0.25,
    min_area: float = 0.02,
    max_area: float = 1.0 / 3.0,
    min_aspect: float = 0.3,
) -> Array:
    """timm RandomErasing, mode='pixel', count=1: N(0,1) fill, unclamped."""
    h, w, c = img.shape
    keys = jax.random.split(rng, 6)
    apply = jax.random.bernoulli(keys[0], prob)
    area = h * w
    target = area * jax.random.uniform(keys[1], minval=min_area, maxval=max_area)
    log_r = jax.random.uniform(
        keys[2], minval=jnp.log(min_aspect), maxval=jnp.log(1.0 / min_aspect)
    )
    aspect = jnp.exp(log_r)
    eh = jnp.clip(jnp.round(jnp.sqrt(target * aspect)), 1, h).astype(jnp.int32)
    ew = jnp.clip(jnp.round(jnp.sqrt(target / aspect)), 1, w).astype(jnp.int32)
    top = jax.random.randint(keys[3], (), 0, jnp.maximum(h - eh, 1))
    left = jax.random.randint(keys[4], (), 0, jnp.maximum(w - ew, 1))
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w, 1), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w, 1), 1)
    box = (ys >= top) & (ys < top + eh) & (xs >= left) & (xs < left + ew)
    noise = jax.random.normal(keys[5], img.shape, img.dtype)
    return jnp.where(jnp.logical_and(apply, box), noise, img)


def hflip_single(rng: Array, img: Array, prob: float = 0.5) -> Array:
    return jnp.where(jax.random.bernoulli(rng, prob), img[:, ::-1, :], img)


@partial(jax.jit, static_argnames=("cfg", "use_randaug", "re_prob", "hflip"))
def augment_batch(
    rng: Array,
    images: Array,
    cfg: RandAugmentConfig = RandAugmentConfig(),
    use_randaug: bool = True,
    re_prob: float = 0.25,
    hflip: float = 0.5,
) -> Array:
    """Full on-device train-time augmentation for a uint8/float NHWC batch."""
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    b = images.shape[0]
    keys = jax.random.split(rng, 3 * b).reshape(3, b, -1)

    if hflip > 0:
        images = jax.vmap(partial(hflip_single, prob=hflip))(keys[0], images)
    if use_randaug:
        images = rand_augment_batch(keys[1, 0], images, cfg)
    if re_prob > 0:
        images = jax.vmap(partial(random_erasing_single, prob=re_prob))(keys[2], images)
    return images
