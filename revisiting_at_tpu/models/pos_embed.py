"""ViT positional-embedding interpolation for high-resolution evaluation.

Rebuild of the reference `interpolate_pos_encoding`
(utils_architecture.py:22-53, used at eval AA_eval.py:196-211): bicubic
resize of the patch position grid, class-token position kept.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def interpolate_pos_encoding(
    pos_embed: jax.Array,
    new_img_size: int,
    old_img_size: int = 224,
    patch_size: int = 16,
    num_prefix_tokens: int = 1,
) -> jax.Array:
    """Resize a [1, prefix+N, D] (or [1, N, D] if num_prefix_tokens=0)
    positional embedding to the grid implied by `new_img_size`."""
    n = pos_embed.shape[1] - num_prefix_tokens
    npatch = (new_img_size // patch_size) ** 2
    if npatch == n:
        return pos_embed
    dim = pos_embed.shape[-1]
    gs_old = int(math.sqrt(n))
    assert gs_old * gs_old == n, f"non-square patch grid: {n}"
    gs_new = new_img_size // patch_size

    prefix = pos_embed[:, :num_prefix_tokens]
    patch = pos_embed[:, num_prefix_tokens:].reshape(1, gs_old, gs_old, dim)
    patch = jax.image.resize(
        patch.astype(jnp.float32), (1, gs_new, gs_new, dim), method="bicubic"
    )
    patch = patch.reshape(1, gs_new * gs_new, dim).astype(pos_embed.dtype)
    if num_prefix_tokens == 0:
        return patch
    return jnp.concatenate([prefix, patch], axis=1)


def resize_vit_pos_embed(params: dict, new_img_size: int, patch_size: int = 16) -> dict:
    """Return a params pytree with `pos_embed` resized for `new_img_size`.

    Handles both embed-class (197-token) and no_embed_class (196-token)
    layouts by inspecting whether the token count is a perfect square.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for k, v in flat.items():
        if k[-1] == "pos_embed":
            ntok = v.shape[1]
            prefix = 0 if int(math.isqrt(ntok)) ** 2 == ntok else 1
            v = interpolate_pos_encoding(
                v, new_img_size, patch_size=patch_size, num_prefix_tokens=prefix
            )
        out[k] = v
    return flax.traverse_util.unflatten_dict(out)
