"""Deferred shading: visibility buffer -> lit pixels.

Replaces the reference's fragment shaders (fragment /
fragment_alpha_clipped / fragment_alpha_blended, shaders/src/lib.rs:252-512,
and the glam-pbr BRDF crate). The TPU formulation is deferred: the raster
pass leaves (pair id, barycentrics) per pixel; this pass gathers per-pair
attributes and per-material state, then runs the entire lighting model as
flat vectorized VPU math over all pixels at once. No occluded fragment is
ever shaded, which also supersedes the reference's depth prepass.

Lighting model (identical math to the reference):
  * diffuse = albedo*(1-metallic) * nonlinear L1-SH irradiance
    (eval_spherical_harmonics_nonlinear, shared-structs/src/lib.rs:357-388);
  * SH[0] boosted by pi^2 before specular (lib.rs:514-531 comment: baking
    scales direct light down; specular needs it back);
  * specular = GGX BRDF at the SH dominant light direction
    (spherical_harmonics_specular_approximation, shaders/src/lib.rs:777-815);
  * emissive added; ACES tonemap + gamma-2.2 encode at the end;
  * normal mapping via cotangent frame from ANALYTIC position/uv screen
    derivatives (the reference uses hardware ddx/ddy, lib.rs:566-587 — we
    differentiate the homogeneous interpolation equations instead, which is
    exact per-pixel rather than a 2x2-quad finite difference);
  * unlit materials bypass lighting and tonemapping (lib.rs:310-318).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .geometry import TriangleAttrs, TriangleSetup
from .texture import (
    hdr_pool,
    ldr_pool,
    mip_level_from_derivatives,
    sample_3d_from_layers,
    sample_anisotropic,
    sample_bilinear_level,
    sample_lightmap_sh,
    sample_lightvol_sh,
    sample_material_interleaved,
)
from .tonemap import aces_filmic, linear_to_srgb_approx

MAT_UNLIT = 1


class GBuffer(NamedTuple):
    """Flat per-pixel (P,) SoA after attribute interpolation."""

    valid: jax.Array
    world_pos: jax.Array  # (P, 3)
    normal: jax.Array  # (P, 3) geometric/interp normal (unnormalized)
    uv: jax.Array  # (P, 2)
    lm_uv: jax.Array  # (P, 2)
    material: jax.Array  # (P,) i32
    front_facing: jax.Array  # (P,) bool
    lightmapped: jax.Array  # (P,) bool
    dpdx: jax.Array  # (P, 3) world-position screen derivatives
    dpdy: jax.Array  # (P, 3)
    duvdx: jax.Array  # (P, 2)
    duvdy: jax.Array  # (P, 2)
    # Optional pre-fetched material row (P, 24+3L): when the scene uses
    # the interleaved material pool, render_view folds mat_row_mq into
    # the per-triangle shade_row, so the pixel's material state arrives
    # with the SAME gather that fetched setup+attrs — shade() then pays
    # zero extra rows for materials (_material_rows_mq layout).
    mat_tail: Optional[jax.Array] = None


def interpolate_gbuffer(
    pair: jax.Array,  # (P,) i32 pair id, -1 = miss
    px: jax.Array,  # (P,) pixel centers (x + 0.5)
    py: jax.Array,
    tri: TriangleSetup,
    attrs: TriangleAttrs,
    shade_row: Optional[jax.Array] = None,  # (T, 48) concat(setup, packed)
    row_cols: Optional[int] = None,  # real columns when shade_row is padded
) -> GBuffer:
    """Gather the winner's setup row and interpolate attributes.

    Barycentrics are recomputed here from the edge functions — the raster
    kernels store only (depth, pair) (see raster_ref.VisibilityBuffer);
    the setup gather and e/d evaluation were already needed for the
    analytic derivatives, so reconstruction is free of extra HBM traffic.

    shade_row, when given, is the per-pair concat of tri.setup (16) and
    attrs.packed (32): the per-pixel fetch collapses from two gathers to
    ONE 48-float row gather (gather lanes dominate the deferred stage,
    docs/KERNELS.md). Built once per view in render_view.
    """
    valid = pair >= 0
    p = jnp.maximum(pair, 0)
    av32 = None
    mat_tail = None
    if shade_row is not None:
        row = shade_row[p]  # (P, 48[+mat]) — ONE gather for setup, attrs,
        if row_cols is not None:  # lane-alignment pad: discard after gather
            row = row[:, :row_cols]
        setup = row[:, 0:16]  # and (matq scenes) the material row tail
        av32 = row[:, 16:48]
        if row.shape[-1] > 48:
            mat_tail = row[:, 48:]
    else:
        setup = tri.setup[p]  # (P, 16)
        if attrs.packed is not None:
            av32 = attrs.packed[p]  # (P, 32)
    front_facing = setup[:, 15] == 0.0

    # Edge functions at the pixel center; also the denominators/derivative
    # terms for perspective-correct attribute interpolation below.
    # attr(p) = N(p)/D(p), N affine with coeffs sum_i a_i*adj_i, D affine
    # with coeffs sum_i adj_i. d(attr)/dx = (Nx*D - N*Dx) / D^2.
    adj = setup[:, 0:9].reshape(-1, 3, 3)  # (P, 3, [a,b,c])
    dx = adj[:, :, 0]  # (P, 3) d e_i / dx
    dy = adj[:, :, 1]
    e = (
        adj[:, :, 0] * px[:, None] + adj[:, :, 1] * py[:, None] + adj[:, :, 2]
    )  # (P, 3)
    d_val = jnp.sum(e, axis=-1)
    d_dx = jnp.sum(dx, axis=-1)
    d_dy = jnp.sum(dy, axis=-1)
    inv_d = 1.0 / jnp.where(d_val == 0, 1.0, d_val)

    bary = e * inv_d[:, None]  # (P, 3) screen barycentrics

    # ONE gather fetched every vertex attribute of the winning triangle
    # (TriangleAttrs.packed layout; already done above when shade_row
    # folds it into the setup gather).
    if av32 is not None:
        wp_v = av32[:, 0:9].reshape(-1, 3, 3)
        n_v = av32[:, 9:18].reshape(-1, 3, 3)
        uv_v = av32[:, 18:24].reshape(-1, 3, 2)
        lm_v = av32[:, 24:30].reshape(-1, 3, 2)
        material = jax.lax.bitcast_convert_type(av32[:, 30], jnp.int32)
        lightmapped = av32[:, 31] != 0
    else:  # hand-built attrs (tests) without the packed row
        wp_v = attrs.world_pos[p]
        n_v = attrs.normal[p]
        uv_v = attrs.uv[p]
        lm_v = attrs.lm_uv[p]
        material = attrs.material[p]
        lightmapped = attrs.lightmapped[p]

    def interp(av):  # av: (P, 3, C) -> (P, C)
        return jnp.sum(av * bary[..., None], axis=-2)

    world_pos = interp(wp_v)
    normal = interp(n_v)
    uv = interp(uv_v)
    lm_uv = interp(lm_v)

    def deriv(av):  # av: (P, 3, C) -> d/dx, d/dy each (P, C)
        n_val = jnp.sum(e[..., None] * av, axis=-2)
        n_dx = jnp.sum(dx[..., None] * av, axis=-2)
        n_dy = jnp.sum(dy[..., None] * av, axis=-2)
        ddx = (n_dx - n_val * (d_dx * inv_d)[..., None]) * inv_d[..., None]
        ddy = (n_dy - n_val * (d_dy * inv_d)[..., None]) * inv_d[..., None]
        return ddx, ddy

    dpdx, dpdy = deriv(wp_v)
    duvdx, duvdy = deriv(uv_v)

    return GBuffer(
        valid=valid,
        world_pos=world_pos,
        normal=normal,
        uv=uv,
        lm_uv=lm_uv,
        material=material,
        front_facing=front_facing,
        lightmapped=lightmapped,
        dpdx=dpdx,
        dpdy=dpdy,
        duvdx=duvdx,
        duvdy=duvdy,
        mat_tail=mat_tail,
    )


# ---------------------------------------------------------------------------
# PBR pieces (glam-pbr equivalents)
# ---------------------------------------------------------------------------


def _normalize(v, eps=1e-12):
    return v * jax.lax.rsqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps))


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def eval_sh_nonlinear(sh, normal):
    """Nonlinear L1 SH irradiance (shared-structs/src/lib.rs:357-388).

    sh: (P, 4, 3) [L0, L1x, L1y, L1z] rgb; normal: (P, 3). Returns (P, 3).
    """
    # Per-channel direction vectors: r1_div_r0[c] = (L1x[c], L1y[c], L1z[c]).
    r1 = jnp.stack([sh[:, 1, :], sh[:, 2, :], sh[:, 3, :]], axis=-2)  # (P, 3dir, 3c)
    r0 = sh[:, 0, :]  # (P, 3c)
    length = jnp.sqrt(jnp.sum(r1 * r1, axis=-2) + 1e-20)  # (P, 3c)
    a = (1.0 - length) / (1.0 + length)
    pexp = 1.0 + 2.0 * length
    ndot = jnp.sum(r1 * normal[..., :, None], axis=-2)  # (P, 3c)
    # q from the raw dot r_1_div_r_0 . normal, exactly as eval_scalar does.
    q = jnp.maximum(0.5 * (1.0 + ndot), 0.0)
    return r0 * (a + (1.0 - a) * (pexp + 1.0) * jnp.power(q, pexp))


def sh_channel_vectors(sh):
    """(P,4,3) -> per-color direction vectors (P,3,3c)->(red,green,blue) each (P,3)."""
    red = jnp.stack([sh[:, 1, 0], sh[:, 2, 0], sh[:, 3, 0]], axis=-1)
    green = jnp.stack([sh[:, 1, 1], sh[:, 2, 1], sh[:, 3, 1]], axis=-1)
    blue = jnp.stack([sh[:, 1, 2], sh[:, 2, 2], sh[:, 3, 2]], axis=-1)
    return red, green, blue


def ggx_specular(n, v, l, roughness, f0, f90):
    """D_GGX * V_SmithGGXCorrelated * F_Schlick (glam-pbr specular_brdf)."""
    h = _normalize(v + l)
    ndv = jnp.maximum(_dot(n, v), 1e-4)
    ndl = jnp.maximum(_dot(n, l), 0.0)
    ndh = jnp.maximum(_dot(n, h), 0.0)
    vdh = jnp.maximum(_dot(v, h), 0.0)

    a2 = roughness * roughness
    denom = ndh * ndh * (a2 - 1.0) + 1.0
    d = a2 / jnp.maximum(jnp.pi * denom * denom, 1e-8)

    lv = ndl * jnp.sqrt(ndv * ndv * (1.0 - a2) + a2)
    ll = ndv * jnp.sqrt(ndl * ndl * (1.0 - a2) + a2)
    vis = 0.5 / jnp.maximum(lv + ll, 1e-8)

    fresnel = f0 + (f90[..., None] - f0) * jnp.power(1.0 - vdh, 5.0)[..., None]
    return (d * vis)[..., None] * fresnel, ndl


def sh_specular_approximation(sh, normal, view, roughness_perceptual, f0, f90):
    """Port of spherical_harmonics_specular_approximation
    (shaders/src/lib.rs:777-815)."""
    red, green, blue = sh_channel_vectors(sh)
    avg_dir = (red + green + blue) / 3.0
    dir_len = jnp.sqrt(jnp.sum(avg_dir * avg_dir, axis=-1) + 1e-20)

    smoothness = 1.0 - roughness_perceptual
    adjusted_smoothness = smoothness * jnp.sqrt(dir_len)
    adjusted_roughness_p = 1.0 - adjusted_smoothness
    actual_roughness = adjusted_roughness_p * adjusted_roughness_p

    light = avg_dir / dir_len[..., None]
    strength = sh[:, 0, :] * dir_len[..., None]

    spec, ndl = ggx_specular(normal, view, light, actual_roughness, f0, f90)
    return spec * strength * ndl[..., None]


def compute_cotangent_frame_normal(
    geo_normal, map_normal_ts, dpdx, dpdy, duvdx, duvdy
):
    """'Normal Mapping Without Precomputed Tangents' (thetenthplanet.de/
    archives/1180), as compute_cotangent_frame (lib.rs:571-587) but with
    analytic derivatives. geo_normal must be unit length."""
    n = geo_normal
    # The reference feeds position = -view_vector (eye-relative); derivatives
    # of that equal derivatives of world position.
    dp2perp = jnp.cross(dpdy, n)
    dp1perp = jnp.cross(n, dpdx)
    t = dp2perp * duvdx[..., 0:1] + dp1perp * duvdy[..., 0:1]
    b = dp2perp * duvdx[..., 1:2] + dp1perp * duvdy[..., 1:2]
    t2 = jnp.sum(t * t, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    invmax = jax.lax.rsqrt(jnp.maximum(jnp.maximum(t2, b2), 1e-20))
    t = t * invmax
    b = b * invmax
    world = (
        t * map_normal_ts[..., 0:1]
        + b * map_normal_ts[..., 1:2]
        + n * map_normal_ts[..., 2:3]
    )
    return _normalize(world)


# ---------------------------------------------------------------------------
# The full material + lighting evaluation
# ---------------------------------------------------------------------------


def sample_spherical_harmonics(gbuf: GBuffer, scene: dict, uniforms: dict, env):
    """(P, 4, 3) SH coefficients per pixel: lightvol 3D samples for regular
    geometry, lightmap 2D samples where lightmapped (lib.rs:204-250), or a
    constant ambient fallback when the scene has neither. ``env`` is the
    static EnvBindings (texture ids are compile-time constants)."""
    p = gbuf.world_pos.shape[0]

    def unpack(rgb0, rgbx, rgby, rgbz):
        return jnp.stack([rgb0, rgbx, rgby, rgbz], axis=-2)

    scale = 255.0 / 127.0
    bias = -128.0 / 127.0
    sh = None
    if env.lightvol_tex_ids is not None:
        rescaled = (gbuf.world_pos - uniforms["probes_bottom_left"]) / uniforms[
            "probes_scale"
        ]
        z_layers = env.lightvol_z_layers
        if "lv_sh" in scene and env.lightvol_wh is not None:
            # SH-interleaved pool: the four volumes' trilinear fetch is
            # TWO gathers total with static addressing (vs 8 quad-gathers
            # + descriptor chains below) — see Scene.device_lightvol_sh.
            w, h = env.lightvol_wh
            t12 = sample_lightvol_sh(scene["lv_sh"], w, h, z_layers, rescaled)
            taps = [t12[..., 3 * i : 3 * i + 3] for i in range(4)]
        else:
            tex = scene["tex_hdr"]
            texels = hdr_pool(scene)
            taps = [
                sample_3d_from_layers(
                    texels, tex, jnp.full((p,), i, jnp.int32), rescaled, z_layers
                )[..., :3]
                for i in env.lightvol_tex_ids
            ]
        sh = unpack(
            taps[0], taps[1] * scale + bias, taps[2] * scale + bias,
            taps[3] * scale + bias,
        )
    if env.lightmap_tex_ids is not None:
        if "lm_sh" in scene and env.lightmap_wh is not None:
            # SH-interleaved lightmaps: one gather for all four textures
            # (see Scene.device_lightmap_sh).
            w, h = env.lightmap_wh
            t12 = sample_lightmap_sh(scene["lm_sh"], w, h, gbuf.lm_uv)
            taps = [t12[..., 3 * i : 3 * i + 3] for i in range(4)]
        else:
            tex = scene["tex_hdr"]
            texels = hdr_pool(scene)
            lvl = jnp.zeros((p,), jnp.int32)
            taps = [
                sample_bilinear_level(
                    texels, tex, jnp.full((p,), i, jnp.int32), gbuf.lm_uv, lvl, False
                )[..., :3]
                for i in env.lightmap_tex_ids
            ]
        sh_lm = unpack(
            taps[0], taps[1] * scale + bias, taps[2] * scale + bias,
            taps[3] * scale + bias,
        )
        sh = (
            sh_lm
            if sh is None
            else jnp.where(gbuf.lightmapped[:, None, None], sh_lm, sh)
        )
    if sh is None:
        import numpy as np

        ambient = np.asarray(env.ambient_sh, np.float32).reshape(4, 3)
        sh = jnp.broadcast_to(jnp.asarray(ambient), (p, 4, 3))
    return sh


def _material_rows(m: dict, mat):
    """(pf (P,12) f32, pi (P,8) i32, mtm (P,24) i32 or None,
    mlv (P,4,L,3) i32 or None) — from ONE mat_row gather when the scene
    publishes it, else the separate packed rows (minimal test scenes).
    mlv is the per-slot mip-placement table (scene.py device_materials):
    sampling selects the pixel's level inside the row with a select
    ladder instead of a per-pixel mip_owh2 gather."""
    if "mat_row" in m:
        row = m["mat_row"][mat]  # (P, 44 + 4*L*3)
        pf = row[..., 0:12]
        pi = jax.lax.bitcast_convert_type(row[..., 12:20], jnp.int32)
        mtm = jax.lax.bitcast_convert_type(row[..., 20:44], jnp.int32)
        mlv = None
        if row.shape[-1] > 44:
            L = (row.shape[-1] - 44) // 12
            mlv = jax.lax.bitcast_convert_type(
                row[..., 44 : 44 + 12 * L], jnp.int32
            ).reshape(*row.shape[:-1], 4, L, 3)
        return pf, pi, mtm, mlv
    pf = m["packed_f"][mat]
    pi = m["packed_i"][mat]
    mtm = m["mat_tex_meta"][mat] if "mat_tex_meta" in m else None
    return pf, pi, mtm, None


def _unpack_mq_row(row):
    """Split a (P, 24+4L) mat_row_mq row (scene.py device_matq layout)
    into (pf (P,12) f32, pi (P,8) i32, meta (P,4) i32, owh (P,L,4) —
    per level (offset, w, h, tail_offset))."""
    pf = row[..., 0:12]
    pi = jax.lax.bitcast_convert_type(row[..., 12:20], jnp.int32)
    meta = jax.lax.bitcast_convert_type(row[..., 20:24], jnp.int32)
    L = (row.shape[-1] - 24) // 4
    owh = jax.lax.bitcast_convert_type(
        row[..., 24 : 24 + 4 * L], jnp.int32
    ).reshape(*row.shape[:-1], L, 4)
    return pf, pi, meta, owh


def _material_rows_mq(m: dict, mat, gbuf=None):
    """mat_row_mq unpacked — from the shade_row tail when render_view
    already folded it in (zero extra gathers), else one row gather."""
    if gbuf is not None and gbuf.mat_tail is not None:
        return _unpack_mq_row(gbuf.mat_tail)
    return _unpack_mq_row(m["mat_row_mq"][mat])


def shade(
    gbuf: GBuffer,
    scene: dict,
    uniforms: dict,
    view_index: int,
    env=None,
    inline_tonemapping: bool = True,
    inline_srgb: bool = True,
    aniso_taps: int = 1,
    s16=None,
):
    """Returns (rgb (P,3) display-encoded, alpha (P,)).

    Follows fragment() then calculate_lighting_and_tonemap()
    (lib.rs:254-537). Misses are returned black with alpha 0.

    s16: optional pre-sampled (P, 16) material textures
    [albedo|normal|mr|emissive] from the material-path partition
    (render/frame.py _partition_material_sample) — used on PARTIAL matq
    scenes, where some materials sample interleaved and some classic.
    Without it, a partial pool ("matq_capable" in scene) falls back to
    the always-correct classic sampler for every lane.
    """
    texels = ldr_pool(scene)
    tex = scene["tex"]
    m = scene["materials"]
    mat = gbuf.material

    if s16 is not None:
        # Factors/flags still come from the material row (real pf/pi are
        # baked even for matq-incapable materials).
        pf, pi, _meta, _owh = _material_rows_mq(m, mat, gbuf)
        albedo = s16[..., 0:4] * pf[..., 0:4]
        normal_tex = s16[..., 4:8]
        mr = s16[..., 8:12]
        emissive_tex = s16[..., 12:16]
    elif "texels_mq" in scene and "mat_row_mq" in m \
            and "matq_capable" not in scene:
        # Interleaved material pool: the pixel's material state is ONE
        # row gather and all four textures' trilinear samples are TWO
        # pool gathers (Scene.device_matq) — the per-pixel fetch count
        # drops from ~10 rows to 3 (the stage is gather-row-bound).
        pf, pi, mq_meta, mq_owh = _material_rows_mq(m, mat, gbuf)
        s16 = sample_material_interleaved(
            scene["texels_mq"], mq_meta, mq_owh, gbuf.uv,
            gbuf.duvdx, gbuf.duvdy, aniso_taps,
            texels_tail=scene.get("texels_mq_tail"),
        )
        albedo = s16[..., 0:4] * pf[..., 0:4]
        normal_tex = s16[..., 4:8]
        mr = s16[..., 8:12]
        emissive_tex = s16[..., 12:16]
    else:
        # The pixel's ENTIRE material state in ONE gather: factors
        # (packed_f), texture ids/flags (packed_i, bitcast), all four
        # textures' sampling descriptors (mat_tex_meta, bitcast) and their
        # mip tables — see scene.py device_materials. Falls back to the
        # separate packed rows for hand-built test scenes.
        pf, pi, mtm, mlv = _material_rows(m, mat)

        # Every material texture samples with aniso/trilinear LOD derived
        # from its OWN mip-0 dimensions (sample_anisotropic computes it
        # from the analytic uv derivatives) — matching the reference, where
        # one GL sampler with anisotropy_clamp serves all four bindings
        # (texture_loading.rs:140-158) and LOD is per-texture by
        # construction.
        def material_sample(slot):
            meta = mtm[..., 6 * slot : 6 * slot + 6] if mtm is not None else None
            lv = mlv[..., slot, :, :] if mlv is not None else None
            return sample_anisotropic(
                texels, tex, pi[..., slot], gbuf.uv,
                gbuf.duvdx, gbuf.duvdy, aniso_taps, meta=meta, levels_owh=lv,
            )

        albedo = material_sample(0) * pf[..., 0:4]
        mr = material_sample(2)
        emissive_tex = material_sample(3)
        normal_tex = material_sample(1)

    metallic = mr[..., 2] * pf[..., 7]
    roughness = mr[..., 1] * pf[..., 8]
    emissive = emissive_tex[..., :3] * pf[..., 4:7]
    alpha = albedo[..., 3]
    albedo_rgb = albedo[..., :3]

    # Geometric normal, flipped for back faces (lib.rs:552-556).
    geo_n = _normalize(gbuf.normal)
    geo_n = jnp.where(gbuf.front_facing[..., None], geo_n, -geo_n)

    # Normal map (lib.rs:558-568): decode, scale xy, renormalize, rotate into
    # the cotangent frame.
    map_n = normal_tex[..., :3] * (255.0 / 127.0) - (128.0 / 127.0)
    scale = pf[..., 9][..., None]
    map_n = map_n * jnp.concatenate(
        [scale, scale, jnp.ones_like(scale)], axis=-1
    )
    map_n = _normalize(map_n)
    n = compute_cotangent_frame_normal(
        geo_n, map_n, gbuf.dpdx, gbuf.dpdy, gbuf.duvdx, gbuf.duvdy
    )

    eye = uniforms["eye"][view_index]
    view = _normalize(eye[None, :] - gbuf.world_pos)

    if env is None:
        from ..render.env import EnvBindings

        env = EnvBindings()
    sh = sample_spherical_harmonics(gbuf, scene, uniforms, env)

    diffuse = albedo_rgb * (1.0 - metallic[..., None]) * eval_sh_nonlinear(sh, n)

    # SH[0] *= pi^2 before specular (lib.rs:525-529).
    sh_boost = sh.at[:, 0, :].multiply(jnp.pi * jnp.pi)
    f0 = 0.04 * (1.0 - metallic[..., None]) + albedo_rgb * metallic[..., None]
    f90 = jnp.ones_like(metallic)
    specular = sh_specular_approximation(sh_boost, n, view, roughness, f0, f90)

    lit = diffuse + specular + emissive

    if inline_tonemapping:
        lit = aces_filmic(lit)
    if inline_srgb:
        lit = linear_to_srgb_approx(lit)

    # Unlit: raw albedo (srgb-encoded if inline_srgb), no tonemap
    # (lib.rs:310-318).
    unlit_rgb = linear_to_srgb_approx(albedo_rgb) if inline_srgb else albedo_rgb
    unlit = (pi[..., 4] & MAT_UNLIT) != 0
    rgb = jnp.where(unlit[..., None], unlit_rgb, lit)

    rgb = jnp.where(gbuf.valid[..., None], rgb, 0.0)
    alpha = jnp.where(gbuf.valid, alpha, 0.0)
    return rgb, alpha


def albedo_alpha(gbuf: GBuffer, scene: dict, aniso_taps: int = 1,
                 albedo4=None):
    """(albedo alpha, material alpha cutoff) for the alpha-clip test,
    using the same trilinear lod as full shading — matches sampling all
    textures before the discard in fragment_alpha_clipped
    (lib.rs:405-407). The cutoff rides the material row this already
    gathers, saving the caller a second per-lane material fetch.

    albedo4: optional pre-sampled (P, 4) albedo from the material-path
    partition (partial pools — render/frame.py sampled_albedo)."""
    texels = ldr_pool(scene)
    tex = scene["tex"]
    m = scene["materials"]
    if albedo4 is not None:
        pf, _pi, _meta, _owh = _material_rows_mq(m, gbuf.material, gbuf)
        albedo = albedo4 * pf[..., 0:4]
        return albedo[..., 3], pf[..., 10]
    mat = gbuf.material
    if "texels_mq" in scene and "mat_row_mq" in m \
            and "matq_capable" not in scene:
        # (partial pools take the classic path below — the clip worklist
        # is small and the classic sampler is correct for every material)
        pf, pi, mq_meta, mq_owh = _material_rows_mq(m, mat, gbuf)
        s16 = sample_material_interleaved(
            scene["texels_mq"], mq_meta, mq_owh, gbuf.uv,
            gbuf.duvdx, gbuf.duvdy, aniso_taps,
            texels_tail=scene.get("texels_mq_tail"),
        )
        albedo = s16[..., 0:4] * pf[..., 0:4]
        return albedo[..., 3], pf[..., 10]
    pf, pi, mtm, mlv = _material_rows(m, mat)
    meta = mtm[..., 0:6] if mtm is not None else None
    lv = mlv[..., 0, :, :] if mlv is not None else None
    albedo = sample_anisotropic(
        texels, tex, pi[..., 0], gbuf.uv, gbuf.duvdx, gbuf.duvdy, aniso_taps,
        meta=meta, levels_owh=lv,
    ) * pf[..., 0:4]
    return albedo[..., 3], pf[..., 10]
