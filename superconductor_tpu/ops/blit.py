"""Blit / resize / mip-generation ops.

Parity with the reference's blit pipelines (blit, srgb_blit — pipelines.rs
:28-40; fullscreen_tri + blit shaders, shaders/src/lib.rs:589-610) and its
GPU mipmap-by-blit chain (textures.rs:357-522). Here these are small jnp
functions: a blit is a bilinear resample, sRGB conversion is explicit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .tonemap import linear_to_srgb_exact


def blit(image: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resample (H, W, C) -> (out_h, out_w, C)."""
    return jax.image.resize(
        image, (out_h, out_w, image.shape[-1]), method="bilinear"
    )


def srgb_blit(image: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Blit with linear -> sRGB encode on the color channels."""
    out = blit(image, out_h, out_w)
    rgb = linear_to_srgb_exact(out[..., :3])
    return jnp.concatenate([rgb, out[..., 3:]], axis=-1)


def generate_mips(image: jax.Array, max_levels: int = 16):
    """Device-side mip chain by successive 2x box downsample (the GPU blit
    chain equivalent; the host loader uses the numpy version in
    scene/scene.py)."""
    levels = [image]
    cur = image
    while (cur.shape[0] > 1 or cur.shape[1] > 1) and len(levels) < max_levels:
        nh = max(1, cur.shape[0] // 2)
        nw = max(1, cur.shape[1] // 2)
        cur = jax.image.resize(cur, (nh, nw, cur.shape[-1]), method="linear")
        levels.append(cur)
    return levels
