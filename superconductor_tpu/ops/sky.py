"""Skybox: per-pixel ray from the inverse projection, cubemap sample.

Parity with vertex_skybox / fragment_skybox (shaders/src/lib.rs:671-710):
ray = camera_rotation * (projection_inverse @ ndc); the fullscreen pass
samples the IBL cubemap and tonemaps. Drawn only where no geometry won the
depth test (the reference gets this from depth GreaterEqual/LessEqual at the
far plane, pipelines.rs:550-554; deferred, it's just the miss mask).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..math3d import quat_rotate
from .texture import hdr_pool, sample_cubemap
from .tonemap import aces_filmic, linear_to_srgb_approx


def _rays_from_ndc(ndc_x, ndc_y, projection_inverse, view_quat):
    # z value is irrelevant to the direction for a perspective projection
    # inverse followed by truncation; the reference uses z=0 (reverse-z).
    pos = jnp.stack(
        [ndc_x, ndc_y, jnp.zeros_like(ndc_x), jnp.ones_like(ndc_x)], axis=-1
    )
    unproj = pos @ projection_inverse.T
    ray = unproj[..., :3]
    return quat_rotate(view_quat[None, :], ray)


def skybox_rays(width, height, projection_inverse, view_quat, y_offset=0,
                full_height=None):
    """(H*W, 3) world-space rays through every pixel center of the band
    [y_offset, y_offset + height) of a full_height-tall image."""
    full_height = full_height or height
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    ys = 1.0 - (
        jnp.arange(height, dtype=jnp.float32) + 0.5 + y_offset
    ) / full_height * 2.0
    ndc_x = jnp.tile(xs[None, :], (height, 1)).reshape(-1)
    ndc_y = jnp.repeat(ys[:, None], width, axis=1).reshape(-1)
    return _rays_from_ndc(ndc_x, ndc_y, projection_inverse, view_quat)


def skybox_rays_at(idx, width, projection_inverse, view_quat, y_offset=0,
                   full_height=None):
    """Rays through the centers of flat band pixel indices `idx` (P,) —
    arithmetic div/mod addressing, no gathers (the sky-worklist path,
    RenderConfig.sky_px_cap)."""
    x = (idx % width).astype(jnp.float32) + 0.5
    y = (idx // width).astype(jnp.float32) + 0.5 + y_offset
    ndc_x = x / width * 2.0 - 1.0
    ndc_y = 1.0 - y / full_height * 2.0
    return _rays_from_ndc(ndc_x, ndc_y, projection_inverse, view_quat)


def shade_sky_rays(scene, env, rays, inline_tonemapping=True,
                   inline_srgb=True):
    """Cubemap sample + display transform for precomputed rays (P, 3)."""
    base = env.ibl_cubemap_base
    if base < 0:
        rgb = jnp.broadcast_to(
            jnp.asarray(env.clear_color, jnp.float32), (rays.shape[0], 3)
        )
    else:
        rgb = sample_cubemap(
            hdr_pool(scene), scene["tex_hdr"], base, rays,
            static=getattr(env, "ibl_cubemap_static", None),
        )[..., :3]
    if inline_tonemapping:
        rgb = aces_filmic(rgb)
    if inline_srgb:
        rgb = linear_to_srgb_approx(rgb)
    return rgb


def sample_skybox(
    scene: dict,
    env,
    width: int,
    height: int,
    projection_inverse,
    view_quat,
    inline_tonemapping=True,
    inline_srgb=True,
    y_offset=0,
    full_height=None,
):
    rays = skybox_rays(
        width, height, projection_inverse, view_quat, y_offset, full_height
    )
    return shade_sky_rays(scene, env, rays, inline_tonemapping, inline_srgb)


def sample_skybox_at(
    scene: dict,
    env,
    idx,
    width: int,
    projection_inverse,
    view_quat,
    inline_tonemapping=True,
    inline_srgb=True,
    y_offset=0,
    full_height=None,
):
    """Skybox color at flat band pixel indices only (the sky-worklist
    path): pixels covered by geometry never pay the cubemap gather."""
    rays = skybox_rays_at(
        idx, width, projection_inverse, view_quat, y_offset, full_height
    )
    return shade_sky_rays(scene, env, rays, inline_tonemapping, inline_srgb)
