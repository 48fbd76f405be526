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
    # One (T, 32) f32 row carrying everything shade_particles needs — the
    # per-pixel fetch is ONE gather instead of ~9 (setup adj + uv corners
    # + world corners + 5 per-particle fields; gather lanes dominate the
    # shade stages, docs/KERNELS.md). Layout: adj(9), uv(6), world_pos(9),
    # colour(3), emissive_colour(3), lut_y-or-neg (use_emissive_lut folded
    # into the sign), center-partner-corner selector (0 -> corner 2 of
    # this triangle is diagonal to corner 0, 1 -> corner 1 is).
    packed: jax.Array = None


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
    # Packed per-pair shading row (see ParticleAttrs.packed). The quad
    # center is recovered from the diagonal corner pair: triangle A's rows
    # are quad corners (0,1,2) -> diagonal is rows (0,2), B's are (0,2,3)
    # -> diagonal is rows (0,1); csel records which.
    lut_packed = jnp.where(
        particles["use_emissive_lut"] != 0, particles["lut_y"], -1.0
    )
    per_particle = jnp.concatenate(
        [
            particles["colour"],
            particles["emissive_colour"],
            lut_packed[:, None],
        ],
        axis=1,
    )  # (P, 7)
    csel = jnp.concatenate(
        [jnp.zeros((p, 1), jnp.float32), jnp.ones((p, 1), jnp.float32)]
    )
    packed = jnp.concatenate(
        [
            setup[:, 0:9],
            uv_t.reshape(t, 6),
            world_t.reshape(t, 9),
            per_particle[pid],
            csel,
        ],
        axis=1,
    )  # (T, 32)
    return tri_setup, ParticleAttrs(
        uv=uv_t, world_pos=world_t, particle=pid, packed=packed
    )


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
    if attrs.packed is not None:
        # ONE gather row carries the setup edges, corner attributes and
        # per-particle shading fields (ParticleAttrs.packed layout).
        row = attrs.packed[idx]  # (P, 32)
        adj = row[:, 0:9].reshape(-1, 3, 3)
        uv_v = row[:, 9:15].reshape(-1, 3, 2)
        wp_v = row[:, 15:24].reshape(-1, 3, 3)
        p_colour = row[:, 24:27]
        p_emissive = row[:, 27:30]
        lut_packed = row[:, 30]
        p_use_lut = lut_packed >= 0.0
        p_lut_y = jnp.maximum(lut_packed, 0.0)
        partner = jnp.where(row[:, 31:32] > 0.5, wp_v[:, 1], wp_v[:, 2])
        p_center = 0.5 * (wp_v[:, 0] + partner)
    else:
        adj = tri.setup[idx, 0:9].reshape(-1, 3, 3)  # (P, 3, [a,b,c])
        uv_v = attrs.uv[idx]
        wp_v = attrs.world_pos[idx]
        pid = attrs.particle[idx]
        p_colour = particles["colour"][pid]
        p_emissive = particles["emissive_colour"][pid]
        p_use_lut = particles["use_emissive_lut"][pid] != 0
        p_lut_y = particles["lut_y"][pid]
        p_center = particles["center"][pid]
    e = (
        adj[:, :, 0] * px[:, None] + adj[:, :, 1] * py[:, None] + adj[:, :, 2]
    )  # (P, 3)
    d_val = jnp.sum(e, axis=-1)
    bary = e / jnp.where(d_val == 0, 1.0, d_val)[:, None]
    uv = jnp.sum(uv_v * bary[..., None], axis=-2)
    world_pos = jnp.sum(wp_v * bary[..., None], axis=-2)

    eye = uniforms["eye"][view_index]
    normal = _normalize(eye[None, :] - p_center)

    sh = sh_sampler(world_pos)

    n = pair.shape[0]
    smoke_static = getattr(env, "smoke_static", None)
    use_smoke_pool = (
        env.smoke_tex_ids is not None
        and smoke_static is not None
        and "smoke_ab" in scene
    )
    if use_smoke_pool:
        # Dedicated interleaved pool: both smoke maps' level-0 taps in ONE
        # 32 B row gather with static placement — no descriptor gathers,
        # and the table is the smoke maps alone rather than the whole LDR
        # quad pool (gather rate is set by table size, docs/TIMING.md).
        from .texture import sample_smoke_interleaved

        sw, sh_, swr = smoke_static[0], smoke_static[1], smoke_static[2]
        s8 = sample_smoke_interleaved(scene["smoke_ab"], sw, sh_, swr, uv)
        smoke_a, smoke_b = s8[..., 0:4], s8[..., 4:8]
    elif env.smoke_tex_ids is not None:
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

    if use_smoke_pool:
        from .texture import TEXFLAG_SRGB, _bilinear_core, srgb_to_linear_exact

        lut_uv = jnp.stack([emissive_s, p_lut_y], axis=-1)
        lw, lh, lwr, lflags = (
            smoke_static[3], smoke_static[4], smoke_static[5],
            smoke_static[6],
        )
        lut = _bilinear_core(
            scene["smoke_lut"], 0, lw, lh, lwr, lut_uv
        )[..., :3] * (1.0 / 255.0)
        if lflags & TEXFLAG_SRGB:  # static — same decode the classic path
            lut = srgb_to_linear_exact(lut)  # applies via tex_flags
    elif env.smoke_tex_ids is not None:
        lut_uv = jnp.stack([emissive_s, p_lut_y], axis=-1)
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
    emission = jnp.where(
        p_use_lut[..., None], lut, emissive_s[..., None]
    ) * p_emissive

    out = (
        directional * light_map[..., None] + ambient
    ) * p_colour + emission

    if inline_tonemapping:
        out = aces_filmic(out)
    if inline_srgb:
        out = linear_to_srgb_approx(out)
    alpha = jnp.where(valid, alpha, 0.0)
    return out, alpha
