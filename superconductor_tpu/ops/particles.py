"""Particle pipeline: camera-facing quads + 6-way smoke lighting.

Port of particle_vertex / particle_fragment (shaders/src/lib.rs:817-972):
each particle is a view-space quad scaled by (scale.x, scale.y); the
fragment model samples two smoke textures (left/bottom/front/emissive and
right/top/back/alpha channels), picks the hemisphere maps along the SH
dominant light direction in tangent space, and mixes directional, ambient
and (optionally LUT-driven) emissive terms.

The reference CPU-sorts particles back-to-front per frame
(upload_particles, src/systems.rs:384-407); here the k-buffer raster sorts
per pixel instead, which is order-independent and exact up to K layers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .geometry import TriangleSetup, _setup_from_clip
from .shade import _normalize, sh_channel_vectors
from .texture import ldr_pool, sample_bilinear_level
from .tonemap import aces_filmic, linear_to_srgb_approx


class ParticleAttrs(NamedTuple):
    uv: jax.Array  # (T, 3, 2) corner uvs
    world_pos: jax.Array  # (T, 3, 3) corner world positions
    particle: jax.Array  # (T,) particle id (pair -> particle via this)


def particle_geometry(
    particles: dict,  # SoA: center (P,3), scale (P,2), valid (P,) + shading keys
    view: jax.Array,  # (4, 4)
    view_inverse: jax.Array,  # (4, 4)
    projection: jax.Array,  # (4, 4)
    width: int,
    height: int,
    flip_viewport: bool = False,
):
    """Expand particles to camera-facing quads -> (TriangleSetup, ParticleAttrs).

    Corner layout matches particle_vertex's two-triangle quad
    (lib.rs:838-852): x in {-.5, .5}, y in {-.5, .5}.
    """
    center = particles["center"]
    scale = particles["scale"]
    valid = particles["valid"]
    p = center.shape[0]

    c1 = jnp.concatenate([center, jnp.ones((p, 1), center.dtype)], axis=-1)
    view_center = (c1 @ view.T)[:, :3]  # (P, 3)

    corner_x = jnp.array([-0.5, 0.5, 0.5, -0.5], jnp.float32)
    corner_y = jnp.array([-0.5, -0.5, 0.5, 0.5], jnp.float32)
    # view-space corner positions (P, 4, 3)
    vpos = view_center[:, None, :] + jnp.stack(
        [
            scale[:, 0:1] * corner_x[None, :],
            scale[:, 1:2] * corner_y[None, :],
            jnp.zeros((p, 4), jnp.float32),
        ],
        axis=-1,
    )
    v1 = jnp.concatenate([vpos, jnp.ones((p, 4, 1), jnp.float32)], axis=-1)
    clip = jnp.einsum("pkc,rc->pkr", v1, projection)
    world = jnp.einsum("pkc,rc->pkr", v1, view_inverse)[..., :3]

    # uv: (x + 0.5, 0.5 - y) scaled/offset (lib.rs:855)
    u = particles["uv_offset"][:, None, 0] + (corner_x + 0.5)[None, :] * particles[
        "uv_scale"
    ][:, None, 0]
    v = particles["uv_offset"][:, None, 1] + (0.5 - corner_y)[None, :] * particles[
        "uv_scale"
    ][:, None, 1]
    uv = jnp.stack([u, v], axis=-1)  # (P, 4, 2)

    # two triangles per quad: (0, 1, 2) and (0, 2, 3)
    def tri(idx):
        return (
            clip[:, idx, :],  # (P, 3, 4)
            world[:, idx, :],
            uv[:, idx, :],
        )

    clip_a, world_a, uv_a = tri([0, 1, 2])
    clip_b, world_b, uv_b = tri([0, 2, 3])
    clip_t = jnp.concatenate([clip_a, clip_b])
    world_t = jnp.concatenate([world_a, world_b])
    uv_t = jnp.concatenate([uv_a, uv_b])
    valid_t = jnp.concatenate([valid, valid])
    pid = jnp.concatenate([jnp.arange(p), jnp.arange(p)]).astype(jnp.int32)

    # corner identities make the quad diagonal watertight (see
    # _setup_from_clip's canonical edge ordering)
    corner_ids = jnp.concatenate(
        [
            jnp.arange(p, dtype=jnp.int32)[:, None] * 4
            + jnp.array([0, 1, 2], jnp.int32)[None, :],
            jnp.arange(p, dtype=jnp.int32)[:, None] * 4
            + jnp.array([0, 2, 3], jnp.int32)[None, :],
        ]
    )

    setup, tvalid, bbox = _setup_from_clip(
        clip_t,
        valid_t,
        jnp.ones_like(valid_t),  # double-sided quads
        width,
        height,
        flip_viewport,
        vertex_ids=corner_ids,
    )
    t = clip_t.shape[0]
    tri_setup = TriangleSetup(
        setup=setup,
        tri_id=jnp.arange(t, dtype=jnp.int32),
        inst_id=pid,
        bbox=bbox,
        valid=tvalid,
        num_valid=jnp.sum(tvalid).astype(jnp.int32),
    )
    return tri_setup, ParticleAttrs(uv=uv_t, world_pos=world_t, particle=pid)


def shade_particles(
    pair: jax.Array,  # (P,) pair id into the particle TriangleSetup, -1 miss
    px: jax.Array,  # (P,) pixel centers (x + 0.5)
    py: jax.Array,
    tri: TriangleSetup,
    attrs: ParticleAttrs,
    particles: dict,
    scene: dict,
    uniforms: dict,
    env,
    view_index: int,
    sh_sampler,
    inline_tonemapping: bool = True,
    inline_srgb: bool = True,
):
    """Per-pixel particle shading -> (rgb display-encoded, alpha).

    Barycentrics are recomputed from the quad-triangle setup rows (the
    k-buffer stores only depth+pair, see raster_kbuffer.KBuffer)."""
    valid = pair >= 0
    idx = jnp.maximum(pair, 0)
    adj = tri.setup[idx, 0:9].reshape(-1, 3, 3)  # (P, 3, [a,b,c])
    e = (
        adj[:, :, 0] * px[:, None] + adj[:, :, 1] * py[:, None] + adj[:, :, 2]
    )  # (P, 3)
    d_val = jnp.sum(e, axis=-1)
    bary = e / jnp.where(d_val == 0, 1.0, d_val)[:, None]
    uv = jnp.sum(attrs.uv[idx] * bary[..., None], axis=-2)
    world_pos = jnp.sum(attrs.world_pos[idx] * bary[..., None], axis=-2)
    pid = attrs.particle[idx]

    eye = uniforms["eye"][view_index]
    normal = _normalize(eye[None, :] - particles["center"][pid])

    sh = sh_sampler(world_pos)

    n = pair.shape[0]
    if env.smoke_tex_ids is not None:
        # smoke maps live in the LDR u8 pool (environment.py); the sampler
        # normalizes to [0,1]
        texels = ldr_pool(scene)
        tex = scene["tex"]
        lvl = jnp.zeros(n, jnp.int32)
        smoke_a = sample_bilinear_level(
            texels, tex, jnp.full((n,), env.smoke_tex_ids[0], jnp.int32), uv, lvl, False
        )
        smoke_b = sample_bilinear_level(
            texels, tex, jnp.full((n,), env.smoke_tex_ids[1], jnp.int32), uv, lvl, False
        )
    else:
        # No smoke textures bound: solid round-ish puff (alpha from radial
        # falloff) so the pipeline still renders something sensible.
        d = jnp.linalg.norm(uv - 0.5, axis=-1)
        fall = jnp.clip(1.0 - 2.0 * d, 0.0, 1.0)
        smoke_a = jnp.stack([fall * 0.5] * 3 + [fall], axis=-1)
        smoke_b = jnp.stack([fall * 0.5] * 3 + [fall], axis=-1)

    left, bottom, front, emissive_s = (
        smoke_a[..., 0], smoke_a[..., 1], smoke_a[..., 2], smoke_a[..., 3],
    )
    right, top, back, alpha = (
        smoke_b[..., 0], smoke_b[..., 1], smoke_b[..., 2], smoke_b[..., 3],
    )

    red, green, blue = sh_channel_vectors(sh)
    avg_vec = (red + green + blue) / 3.0
    rgb_len = jnp.stack(
        [
            jnp.linalg.norm(red, axis=-1),
            jnp.linalg.norm(green, axis=-1),
            jnp.linalg.norm(blue, axis=-1),
        ],
        axis=-1,
    )
    avg_len = jnp.mean(rgb_len, axis=-1, keepdims=True)
    avg_dir = avg_vec / jnp.maximum(avg_len, 1e-8)

    # Cotangent frame (compute_cotangent_frame, lib.rs:571-587) for a
    # screen-aligned quad: position derivatives are the camera right/down
    # axes, uv derivatives are (+du, 0) and (0, +dv) (v grows downward).
    # t = (ddy(P) x N) * du/dx, b = (N x ddx(P)) * dv/dy.
    vi = uniforms["view_inverse"][view_index]
    cam_right = vi[:3, 0][None, :]
    cam_down = -vi[:3, 1][None, :]
    t = _normalize(jnp.cross(cam_down, normal))
    b = _normalize(jnp.cross(normal, cam_right))
    light_ts = jnp.stack(
        [
            jnp.sum(t * avg_dir, axis=-1),
            jnp.sum(b * avg_dir, axis=-1),
            jnp.sum(normal * avg_dir, axis=-1),
        ],
        axis=-1,
    )

    h_map = jnp.where(light_ts[..., 0] > 0, left, right)
    v_map = jnp.where(light_ts[..., 1] > 0, top, bottom)
    z_map = jnp.where(light_ts[..., 2] > 0, front, back)
    light_map = (
        h_map * light_ts[..., 0] * light_ts[..., 0]
        + v_map * light_ts[..., 1] * light_ts[..., 1]
        + z_map * light_ts[..., 2] * light_ts[..., 2]
    )

    ambient_factor = 0.2
    directional = sh[:, 0, :] * rgb_len
    ambient = sh[:, 0, :] * ambient_factor * (1.0 - rgb_len)

    if env.smoke_tex_ids is not None:
        lut_uv = jnp.stack([emissive_s, particles["lut_y"][pid]], axis=-1)
        lut = sample_bilinear_level(
            ldr_pool(scene),
            scene["tex"],
            jnp.full((n,), env.smoke_tex_ids[2], jnp.int32),
            lut_uv,
            jnp.zeros(n, jnp.int32),
            True,  # the LUT is sRGB-encoded (TEXFLAG_SRGB decodes it)
        )[..., :3]
    else:
        lut = jnp.zeros((n, 3), jnp.float32)
    use_lut = particles["use_emissive_lut"][pid][..., None]
    emission = jnp.where(use_lut != 0, lut, emissive_s[..., None]) * particles[
        "emissive_colour"
    ][pid]

    out = (
        directional * light_map[..., None] + ambient
    ) * particles["colour"][pid] + emission

    if inline_tonemapping:
        out = aces_filmic(out)
    if inline_srgb:
        out = linear_to_srgb_approx(out)
    alpha = jnp.where(valid, alpha, 0.0)
    return out, alpha
