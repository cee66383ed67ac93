"""MXU-friendly reformulations of the small-channel convolutions.

Profiling on v5e shows XLA's convolution lowering runs the ConvStem 3x3/s2
convs and the 2x2/s2 downsample convs at ~10x below roofline (small channel
counts defeat its tiling). Both have exact matmul forms:

  * k == stride (patchify 4x4/s4, 16x16/s16, downsample 2x2/s2):
    non-overlapping windows — a pure reshape (space-to-depth) followed by
    one dense matmul on the MXU.
  * 3x3 stride 2, pad 1 (ConvStem convs): im2col via 9 strided slices of the
    padded input, concatenated on the channel axis, then one matmul with the
    kernel reshaped to (9*Cin, Cout).

Numerically identical to lax.conv_general_dilated (same contractions, same
order up to reassociation); gradients flow through slices/reshape/dot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def patchify_conv(x: Array, w: Array, b: Array | None, patch: int) -> Array:
    """k = stride = patch conv as space-to-depth + matmul.

    x [B,H,W,Cin], w [patch,patch,Cin,Cout] -> [B,H/p,W/p,Cout].
    """
    B, H, W, Cin = x.shape
    p = patch
    Cout = w.shape[-1]
    assert H % p == 0 and W % p == 0, (H, W, p)
    xt = x.reshape(B, H // p, p, W // p, p, Cin)
    xt = xt.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // p, W // p, p * p * Cin)
    wt = w.reshape(p * p * Cin, Cout)
    y = jnp.einsum("bhwk,kc->bhwc", xt, wt.astype(xt.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv3x3_s2_im2col(x: Array, w: Array, b: Array | None) -> Array:
    """3x3, stride 2, pad 1 conv as 9 strided slices + one matmul.

    x [B,H,W,Cin] (H,W even), w [3,3,Cin,Cout] -> [B,H/2,W/2,Cout].
    """
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    Ho, Wo = H // 2, W // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = []
    for di in range(3):
        for dj in range(3):
            sl = jax.lax.slice(
                xp,
                (0, di, dj, 0),
                (B, di + 2 * Ho - 1, dj + 2 * Wo - 1, Cin),
                (1, 2, 2, 1),
            )
            cols.append(sl)
    xt = jnp.concatenate(cols, axis=-1)  # [B, Ho, Wo, 9*Cin]
    # kernel layout must match the slice order: (di, dj, cin)
    wt = w.transpose(0, 1, 2, 3).reshape(9 * Cin, Cout)
    y = jnp.einsum("bhwk,kc->bhwc", xt, wt.astype(xt.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y
