"""Tonemapping and color-space ops (ACES filmic + gamma-2.2 sRGB approx).

Parity with the reference tonemap/srgb path (shaders/src/lib.rs:616-669):
aces_filmic is Narkowicz's curve; linear_to_srgb is the gamma-2.2
approximation the reference uses for its INLINE_SRGB path. The exact sRGB
EOTF is also provided for texture decode (hardware sRGB sampling in wgpu is
exact).
"""

from __future__ import annotations

import jax.numpy as jnp


def aces_filmic(x):
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def linear_to_srgb_approx(x):
    return jnp.clip(x, 0.0, 1.0) ** (1.0 / 2.2)


def srgb_to_linear_exact(c):
    """Exact sRGB EOTF for decoding sRGB8 texels (c in [0,1])."""
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb_exact(c):
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)


def tonemap_and_encode(rgb, inline_tonemapping=True, inline_srgb=True):
    """HDR linear -> display; mirrors potentially_tonemap (lib.rs:636-641)."""
    if inline_tonemapping:
        rgb = aces_filmic(rgb)
    if inline_srgb:
        rgb = linear_to_srgb_approx(rgb)
    return rgb


def to_u8(rgb):
    return jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(jnp.uint8)
