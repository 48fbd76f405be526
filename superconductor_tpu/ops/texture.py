"""Gather-based texture sampling from flat texel pools.

wgpu's samplers (bilinear, mip, wrap modes — texture_loading.rs:140-158)
become explicit gathers here. Layout rationale: the pools are (N, 4) flat
arrays so a fetch is ONE gather row per tap; bilinear+trilinear = 4 or 8
taps. Addresses are computed in-register from the mip descriptor table.

sRGB decode happens after the gather (exact EOTF), matching wgpu's
Rgba8UnormSrgb views on albedo/emissive textures.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .tonemap import srgb_to_linear_exact

WRAP_REPEAT = 0
WRAP_CLAMP = 1
TEXFLAG_SRGB = 1


def ldr_pool(scene):
    """The LDR texel pool to sample: the quad-packed (N, 16) pool when the
    scene publishes one (Scene.quad_pools — one gather per bilinear tap),
    else the flat (N, 4) pool. Both paths are bit-exact equals."""
    return scene.get("texels_q", scene["texels"])


def hdr_pool(scene):
    """HDR counterpart of ldr_pool."""
    return scene.get("texels_hdr_q", scene["texels_hdr"])


def _wrap(coord, size, wrap_mode):
    rep = jnp.remainder(coord, size)
    clmp = jnp.clip(coord, 0, size - 1)
    return jnp.where(wrap_mode == WRAP_REPEAT, rep, clmp)


def _fetch(texels, index):
    return texels[index]


def sample_bilinear_level(texels, tex_desc, tex_id, uv, level, decode_srgb=True):
    """Bilinear sample of `tex_id` at mip `level` (integer, clamped).

    texels: (N, 4) u8 or f32 pool, OR the (N, 16) quad-packed pool
            (TexturePool.device_quad): row i carries texel i's full 2x2
            bilinear footprint [self, right, down, diag] with wrap baked
            in, so the 4 taps collapse to ONE gather — the deferred shade
            is gather-issue-bound (docs/KERNELS.md), and this quarters its
            dominant cost for 4x pool memory.
    tex_desc: dict of descriptor arrays (mip_offset/w/h, tex_mip_base/count,
              tex_wrap, tex_flags)
    tex_id: (P,) i32; uv: (P, 2) f32; level: (P,) i32
    Returns (P, 4) f32 (linear color space if decode_srgb). The quad and
    4-tap paths are bit-exact equals (same texel values, same lerp).
    """
    if "tex_meta" in tex_desc:  # packed: 2 descriptor gathers, not 7
        meta = tex_desc["tex_meta"][tex_id]
        base, count, wrap_mode = meta[..., 0], meta[..., 1], meta[..., 2]
        flags = meta[..., 3]
        lvl = jnp.clip(level, 0, count - 1)
        owh = tex_desc["mip_owh"][base + lvl]
        off, w, h = owh[..., 0], owh[..., 1], owh[..., 2]
    else:
        base = tex_desc["tex_mip_base"][tex_id]
        count = tex_desc["tex_mip_count"][tex_id]
        wrap_mode = tex_desc["tex_wrap"][tex_id]
        flags = None
        lvl = jnp.clip(level, 0, count - 1)
        entry = base + lvl
        off = tex_desc["mip_offset"][entry]
        w = tex_desc["mip_w"][entry]
        h = tex_desc["mip_h"][entry]

    out = _bilinear_core(texels, off, w, h, wrap_mode, uv)
    if texels.dtype == jnp.uint8:
        out = out * (1.0 / 255.0)
        if decode_srgb:
            if flags is None:
                flags = tex_desc["tex_flags"][tex_id]
            out = _srgb_decode(out, flags)
    return out


def _bilinear_core(texels, off, w, h, wrap_mode, uv):
    """One bilinear tap at the given mip placement -> raw (P, 4) f32
    (u8 pools NOT yet normalized; no sRGB decode)."""
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    if texels.shape[-1] == 16:  # quad-packed pool: one gather, 4 texels
        xi = _wrap(x0, w, wrap_mode)
        yi = _wrap(y0, h, wrap_mode)
        # CLAMP_TO_EDGE with a negative base texel: the classic path taps
        # the edge texel twice (full weight), but the baked neighbor of
        # texel 0 is texel 1 — zero the fraction instead, which weights
        # the edge texel fully (same value, associativity-only ulp diff).
        clamped = wrap_mode == WRAP_CLAMP
        fx = jnp.where((clamped & (x0 < 0))[..., None], 0.0, fx)
        fy = jnp.where((clamped & (y0 < 0))[..., None], 0.0, fy)
        q = _fetch(texels, off + yi * w + xi).astype(jnp.float32)
        t00, t10, t01, t11 = (
            q[..., 0:4], q[..., 4:8], q[..., 8:12], q[..., 12:16]
        )
    else:

        def tap(xi, yi):
            xi = _wrap(xi, w, wrap_mode)
            yi = _wrap(yi, h, wrap_mode)
            return _fetch(texels, off + yi * w + xi)

        t00 = tap(x0, y0).astype(jnp.float32)
        t10 = tap(x0 + 1, y0).astype(jnp.float32)
        t01 = tap(x0, y0 + 1).astype(jnp.float32)
        t11 = tap(x0 + 1, y0 + 1).astype(jnp.float32)

    return (
        t00 * (1 - fx) * (1 - fy)
        + t10 * fx * (1 - fy)
        + t01 * (1 - fx) * fy
        + t11 * fx * fy
    )


def _srgb_decode(out, flags):
    srgb = (flags & TEXFLAG_SRGB) != 0
    rgb = jnp.where(
        srgb[..., None], srgb_to_linear_exact(out[..., :3]), out[..., :3]
    )
    return jnp.concatenate([rgb, out[..., 3:]], axis=-1)


def _select_level(levels, lvl):
    """levels (P, L, 3) i32, lvl (P,) i32 -> (P, 3): row lvl of each
    lane's table via a static select ladder (clamps lvl to [0, L-1]).
    Pure VPU work — replaces a per-pixel mip_owh2 gather when the mip
    table already rides the material row (scene.py mat_row)."""
    out = levels[..., 0, :]
    for j in range(1, levels.shape[-2]):
        out = jnp.where((lvl >= j)[..., None], levels[..., j, :], out)
    return out


def sample_trilinear(texels, tex_desc, tex_id, uv, lod, decode_srgb=True,
                     meta=None, levels_owh=None):
    """Trilinear: blend the two nearest mips by the fractional lod.

    With the packed descriptor tables, BOTH levels' placements come from
    ONE mip_owh2 pair-row gather (entry E carries its own offset/w/h and
    the next mip's — scene.py descriptor_arrays), so a trilinear sample
    is 4 gathers total: tex_meta, mip_owh2, quad(l0), quad(l1) — and 3
    when the caller supplies `meta` (a pre-gathered (P, 4) tex_meta row,
    e.g. from the material-packed mat_tex_meta). With `levels_owh` (a
    (P, L, 3) in-register mip table from the same material row) the
    mip_owh2 gather disappears too: 2 gathers, both texel taps."""
    l0 = jnp.floor(lod).astype(jnp.int32)
    f = (lod - jnp.floor(lod))[..., None]
    if levels_owh is not None and meta is not None:
        count, wrap_mode = meta[..., 1], meta[..., 2]
        flags = meta[..., 3]
        lvl = jnp.clip(l0, 0, count - 1)
        # bit-exact vs the mip_owh2 path: zero the fraction for negative
        # lod (pure mip-0), clamp the second level within the chain (the
        # pair row bakes the same last-pairs-with-itself clamp)
        f = jnp.where((l0 < 0)[..., None], 0.0, f)
        a_owh = _select_level(levels_owh, lvl)
        b_owh = _select_level(levels_owh, jnp.clip(l0 + 1, 0, count - 1))
        a = _bilinear_core(
            texels, a_owh[..., 0], a_owh[..., 1], a_owh[..., 2],
            wrap_mode, uv,
        )
        b = _bilinear_core(
            texels, b_owh[..., 0], b_owh[..., 1], b_owh[..., 2],
            wrap_mode, uv,
        )
        if texels.dtype == jnp.uint8:
            a = a * (1.0 / 255.0)
            b = b * (1.0 / 255.0)
            if decode_srgb:
                a = _srgb_decode(a, flags)
                b = _srgb_decode(b, flags)
        return a * (1 - f) + b * f
    if "mip_owh2" in tex_desc and ("tex_meta" in tex_desc or meta is not None):
        if meta is None:
            meta = tex_desc["tex_meta"][tex_id]
        base, count, wrap_mode = meta[..., 0], meta[..., 1], meta[..., 2]
        flags = meta[..., 3]
        lvl = jnp.clip(l0, 0, count - 1)
        # Negative lod: the two-call path clips both levels to 0 (pure
        # mip-0 result); the pair row would lerp toward mip 1 — zero the
        # fraction instead so the paths stay bit-identical.
        f = jnp.where((l0 < 0)[..., None], 0.0, f)
        row = tex_desc["mip_owh2"][base + lvl]  # (P, 8): this mip + next
        a = _bilinear_core(
            texels, row[..., 0], row[..., 1], row[..., 2], wrap_mode, uv
        )
        b = _bilinear_core(
            texels, row[..., 4], row[..., 5], row[..., 6], wrap_mode, uv
        )
        # Match the two-call path exactly: its second call clips l0+1 to
        # count-1; the pair row bakes the same clamp (last entry pairs
        # with itself). Its first call would also re-tap level l0 when
        # l0+1 <= count-1 is false — identical by the same construction.
        if texels.dtype == jnp.uint8:
            a = a * (1.0 / 255.0)
            b = b * (1.0 / 255.0)
            if decode_srgb:
                a = _srgb_decode(a, flags)
                b = _srgb_decode(b, flags)
        return a * (1 - f) + b * f
    a = sample_bilinear_level(texels, tex_desc, tex_id, uv, l0, decode_srgb)
    b = sample_bilinear_level(texels, tex_desc, tex_id, uv, l0 + 1, decode_srgb)
    return a * (1 - f) + b * f


def mip_level_from_derivatives(dudx, dvdx, dudy, dvdy, tex_w, tex_h):
    """Isotropic LOD from analytic UV screen derivatives (the reference gets
    these implicitly from hardware ddx/ddy; we carry them analytically from
    the triangle plane equations)."""
    du2 = (dudx * tex_w) ** 2 + (dvdx * tex_h) ** 2
    dv2 = (dudy * tex_w) ** 2 + (dvdy * tex_h) ** 2
    rho2 = jnp.maximum(du2, dv2)
    return 0.5 * jnp.log2(jnp.maximum(rho2, 1e-12))


def sample_smoke_interleaved(pool32, w: int, h: int, wrap_mode: int, uv):
    """Both smoke textures' level-0 bilinear taps in ONE 32 B row gather.

    pool32: (w*h, 32) u8 — row i carries [quad_a(16) | quad_b(16)] at
    texel i (Scene.device_smoke; the two textures share dims, so the
    footprint is shared). Static placement: w/h/wrap are compile-time
    (EnvBindings.smoke_static), so there are no descriptor gathers.
    Returns (P, 8) f32 in [0,1] — identical math to two
    sample_bilinear_level(level=0, decode_srgb=False) calls."""
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None, None]
    fy = (y - y0)[..., None, None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    xi = _wrap(x0, w, wrap_mode)
    yi = _wrap(y0, h, wrap_mode)
    if wrap_mode == WRAP_CLAMP:
        fx = jnp.where((x0 < 0)[..., None, None], 0.0, fx)
        fy = jnp.where((y0 < 0)[..., None, None], 0.0, fy)
    q = pool32[yi * w + xi].astype(jnp.float32)  # (P, 32)
    qr = q.reshape(*q.shape[:-1], 2, 4, 4)  # (P, slot, corner, ch)
    t00, t10, t01, t11 = (
        qr[..., 0, :], qr[..., 1, :], qr[..., 2, :], qr[..., 3, :]
    )
    out = (
        t00 * (1 - fx) * (1 - fy)
        + t10 * fx * (1 - fy)
        + t01 * (1 - fx) * fy
        + t11 * fx * fy
    )
    return out.reshape(*q.shape[:-1], 8) * (1.0 / 255.0)


def sample_cubemap(texels_hdr, tex_desc, base_tex_id, direction, lod=None,
                   static=None):
    """Sample a cubemap stored as 6 consecutive textures (faces +X,-X,+Y,-Y,
    +Z,-Z in the usual wgpu/Vulkan order) with bilinear filtering.

    direction: (P, 3). Face selection per the standard cube-map equations.

    static: optional (face_offsets(6 ints), w, h) compile-time placement
    (EnvBindings.ibl_cubemap_static). Cubemap faces are equal-sized and
    their pool placement only changes on environment re-config — which
    recompiles anyway (render/env.py) — so the two per-pixel descriptor
    gathers (tex_meta + mip_owh) that sample_bilinear_level pays become
    a 6-entry constant lookup + in-register addressing. Full-screen
    passes (the skybox base layer) feel this directly: the pass drops
    from 3 gathers/pixel to 1. Only the lod=None single-tap path; taps
    the base level with CLAMP wrap (cubemaps load WRAP_CLAMP)."""
    d = direction
    ax, ay, az = jnp.abs(d[..., 0]), jnp.abs(d[..., 1]), jnp.abs(d[..., 2])
    x, y, z = d[..., 0], d[..., 1], d[..., 2]

    is_x = (ax >= ay) & (ax >= az)
    is_y = (ay > ax) & (ay >= az) & ~is_x
    is_z = ~is_x & ~is_y

    # face index: 0 +x, 1 -x, 2 +y, 3 -y, 4 +z, 5 -z
    face = jnp.where(
        is_x,
        jnp.where(x >= 0, 0, 1),
        jnp.where(is_y, jnp.where(y >= 0, 2, 3), jnp.where(z >= 0, 4, 5)),
    ).astype(jnp.int32)

    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-20)
    # (sc, tc) per face (Vulkan convention)
    sc = jnp.where(
        is_x,
        jnp.where(x >= 0, -z, z),
        jnp.where(is_y, x, jnp.where(z >= 0, x, -x)),
    )
    tc = jnp.where(is_y, jnp.where(y >= 0, z, -z), -y)
    u = 0.5 * (sc / ma + 1.0)
    v = 0.5 * (tc / ma + 1.0)
    uv = jnp.stack([u, v], axis=-1)
    if static is not None and lod is None:
        offs, w, h = static
        off = jnp.asarray(offs, jnp.int32)[face]
        out = _bilinear_core(texels_hdr, off, w, h, WRAP_CLAMP, uv)
        if texels_hdr.dtype == jnp.uint8:
            out = out * (1.0 / 255.0)
        return out
    tex_id = base_tex_id + face
    if lod is None:
        # No lod requested: one bilinear tap at the base level. Trilinear
        # with lod=0 would gather BOTH of the two finest levels and lerp
        # by 0 — a full extra descriptor+texel fetch chain per pixel on
        # the (full-screen) skybox pass, for nothing.
        lvl = jnp.zeros(d.shape[:-1], jnp.int32)
        return sample_bilinear_level(
            texels_hdr, tex_desc, tex_id, uv, lvl, decode_srgb=False
        )
    return sample_trilinear(texels_hdr, tex_desc, tex_id, uv, lod, decode_srgb=False)


def sample_3d_from_layers(
    texels_hdr, tex_desc, tex_id, point, z_layers
):
    """3D texture emulated as stacked 2D layers: xy bilinear per layer, then
    lerp across z — exactly sample_2d_array_as_3d (shaders/src/lib.rs:185-201).

    The texture with id `tex_id` must have its layers stored as z_layers
    consecutive mip entries of identical size (we abuse the mip table as a
    layer table; such "textures" have tex_mip_count == z_layers and are
    never mip-sampled).
    """
    xy = point[..., :2]
    z = point[..., 2] * z_layers - 0.5
    z0 = jnp.floor(z)
    fz = (z - z0)[..., None]
    zi = jnp.clip(z0.astype(jnp.int32), 0, z_layers - 1)
    zi1 = jnp.clip(zi + 1, 0, z_layers - 1)
    a = sample_bilinear_level(texels_hdr, tex_desc, tex_id, xy, zi, decode_srgb=False)
    b = sample_bilinear_level(texels_hdr, tex_desc, tex_id, xy, zi1, decode_srgb=False)
    # Match the reference exactly: out-of-range layers clamp; weights lerp.
    return a * (1 - fz) + b * fz


def sample_lightvol_sh(lv_sh, w: int, h: int, z_layers: int, point):
    """Trilinear sample of the SH-interleaved lightvol pool -> (P, 12).

    lv_sh: (w*h*z_layers, 48) pool from Scene.device_lightvol_sh — row
    (z*h*w + y*w + x) holds the 2x2 footprint of all four SH volumes
    (corner-major, 12 channels each, clamp wrap baked in). w/h/z_layers
    are static, so the whole fetch is TWO gathers (one per z layer) with
    in-register addressing — no descriptor reads. Same math as
    sample_3d_from_layers over four textures (xy bilinear per layer,
    z lerp, clamp semantics), returning the four volumes' rgb
    concatenated [L0, Lx, Ly, Lz]."""
    plane, fx, fy = _sh_plane_index(w, h, point[..., 0], point[..., 1])

    z = point[..., 2] * z_layers - 0.5
    z0 = jnp.floor(z)
    fz = (z - z0)[..., None]
    zi = jnp.clip(z0.astype(jnp.int32), 0, z_layers - 1)
    zi1 = jnp.clip(zi + 1, 0, z_layers - 1)

    def tap(zl):
        return _sh_bilinear(lv_sh[zl * (w * h) + plane], fx, fy)

    return tap(zi) * (1 - fz) + tap(zi1) * fz


def sample_lightmap_sh(lm_sh, w: int, h: int, uv):
    """Bilinear sample of the SH-interleaved lightmap pool -> (P, 12).

    2D twin of sample_lightvol_sh: ONE gather fetches all four SH
    lightmaps' footprints (lm_sh from Scene.device_lightmap_sh)."""
    plane, fx, fy = _sh_plane_index(w, h, uv[..., 0], uv[..., 1])
    return _sh_bilinear(lm_sh[plane], fx, fy)


def _sh_plane_index(w: int, h: int, u, v):
    """Texel index + bilinear fractions for the SH-interleaved pools
    (static dims, CLAMP wrap with baked neighbors: zero the fraction at
    the negative edge, same as the quad-pool path above)."""
    x = u * w - 0.5
    y = v * h - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    xi = jnp.clip(x0, 0, w - 1)
    yi = jnp.clip(y0, 0, h - 1)
    fx = jnp.where((x0 < 0)[..., None], 0.0, fx)
    fy = jnp.where((y0 < 0)[..., None], 0.0, fy)
    return yi * w + xi, fx, fy


def _sh_bilinear(q, fx, fy):
    q = q.astype(jnp.float32)  # (P, 48)
    t00, t10, t01, t11 = (
        q[..., 0:12], q[..., 12:24], q[..., 24:36], q[..., 36:48]
    )
    return (
        t00 * (1 - fx) * (1 - fy)
        + t10 * fx * (1 - fy)
        + t01 * (1 - fx) * fy
        + t11 * fx * fy
    )


def _matq_bilinear(texels_mq, owh, wrap_mode, uv):
    """One bilinear tap of the material-interleaved pool -> raw (P, 16)
    f32 (not yet normalized/decoded): all four material slots' bilinear
    results from ONE (P, 64) row gather (Scene.device_matq). Address
    math and lerp are _bilinear_core's, applied per slot with the shared
    footprint (equal dims are the pool's capability precondition)."""
    off, w, h = owh[..., 0], owh[..., 1], owh[..., 2]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None, None]
    fy = (y - y0)[..., None, None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    xi = _wrap(x0, w, wrap_mode)
    yi = _wrap(y0, h, wrap_mode)
    clamped = wrap_mode == WRAP_CLAMP
    fx = jnp.where((clamped & (x0 < 0))[..., None, None], 0.0, fx)
    fy = jnp.where((clamped & (y0 < 0))[..., None, None], 0.0, fy)
    q = texels_mq[off + yi * w + xi].astype(jnp.float32)  # (P, 64)
    qr = q.reshape(*q.shape[:-1], 4, 4, 4)  # (P, slot, corner, ch)
    t00, t10, t01, t11 = qr[..., 0, :], qr[..., 1, :], qr[..., 2, :], qr[..., 3, :]
    out = (
        t00 * (1 - fx) * (1 - fy)
        + t10 * fx * (1 - fy)
        + t01 * (1 - fx) * fy
        + t11 * fx * fy
    )
    return out.reshape(*q.shape[:-1], 16)


def _mq3_levels(texels_mq3, a_owh, b_owh, self_pair, wrap_mode, uv):
    """Both trilinear levels of all four material slots from ONE gather
    of the wide (N, 208) interleaved pool (Scene.device_matq mq3 rows:
    level-L quad + level-(L+1) 3x3, self-paired at the chain end).

    Returns (a16, b16) raw (P, 16) f32, bit-matching _bilinear_core at
    a_owh/b_owh: the level-b 2x2 is selected from the baked 3x3 by the
    floor(x/2) grid correspondence (requires clean halving chains —
    matq_plan mq3_ok).
    """
    off, w, h = a_owh[..., 0], a_owh[..., 1], a_owh[..., 2]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - jnp.floor(x))[..., None, None]
    fy = (y - jnp.floor(y))[..., None, None]
    xi = _wrap(x0, w, wrap_mode)
    yi = _wrap(y0, h, wrap_mode)
    clamped = wrap_mode == WRAP_CLAMP
    fx = jnp.where((clamped & (x0 < 0))[..., None, None], 0.0, fx)
    fy = jnp.where((clamped & (y0 < 0))[..., None, None], 0.0, fy)
    row = texels_mq3[off + yi * w + xi].astype(jnp.float32)  # (P, 208)

    qr = row[..., :64].reshape(*row.shape[:-1], 4, 4, 4)
    t00, t10, t01, t11 = qr[..., 0, :], qr[..., 1, :], qr[..., 2, :], qr[..., 3, :]
    a16 = (
        t00 * (1 - fx) * (1 - fy)
        + t10 * fx * (1 - fy)
        + t01 * (1 - fx) * fy
        + t11 * fx * fy
    ).reshape(*row.shape[:-1], 16)

    # --- level b from the baked 3x3 ---
    wb, hb = b_owh[..., 1], b_owh[..., 2]
    xb = uv[..., 0] * wb - 0.5
    yb = uv[..., 1] * hb - 0.5
    x1 = jnp.floor(xb).astype(jnp.int32)
    y1 = jnp.floor(yb).astype(jnp.int32)
    fx1 = (xb - jnp.floor(xb))[..., None, None]
    fy1 = (yb - jnp.floor(yb))[..., None, None]
    fx1 = jnp.where((clamped & (x1 < 0))[..., None, None], 0.0, fx1)
    fy1 = jnp.where((clamped & (y1 < 0))[..., None, None], 0.0, fy1)

    def window_pos(v1, v0, vi, vb_dim):
        # position of the level-b tap inside the baked 3-window, for the
        # REPEAT (unwrapped-consistent) and CLAMP (edge-duplicated)
        # conventions; p0 in {0,1}, p1 in {1,2} by construction.
        c_rep = jnp.where(self_pair, v0, v0 >> 1)
        p0_rep = v1 - (c_rep - 1)
        p1_rep = p0_rep + 1
        c_cl = jnp.where(self_pair, vi, vi >> 1)
        p0_cl = jnp.clip(v1, 0, vb_dim - 1) - (c_cl - 1)
        p1_cl = jnp.clip(v1 + 1, 0, vb_dim - 1) - (c_cl - 1)
        p0 = jnp.clip(jnp.where(clamped, p0_cl, p0_rep), 0, 2)
        p1 = jnp.clip(jnp.where(clamped, p1_cl, p1_rep), 0, 2)
        return p0, p1

    px0, px1 = window_pos(x1, x0, xi, wb)
    py0, py1 = window_pos(y1, y0, yi, hb)

    t3 = row[..., 64:].reshape(*row.shape[:-1], 4, 3, 3, 4)  # slot,yy,xx,ch

    def at(py, px):  # dynamic window coords -> (P, 4slots, 4ch)
        ry = jnp.where(
            (py == 0)[..., None, None, None], t3[..., 0, :, :],
            jnp.where((py == 1)[..., None, None, None], t3[..., 1, :, :],
                      t3[..., 2, :, :]),
        )
        return jnp.where(
            (px == 0)[..., None, None], ry[..., 0, :],
            jnp.where((px == 1)[..., None, None], ry[..., 1, :],
                      ry[..., 2, :]),
        )

    b00 = at(py0, px0)
    b10 = at(py0, px1)
    b01 = at(py1, px0)
    b11 = at(py1, px1)
    b16 = (
        b00 * (1 - fx1) * (1 - fy1)
        + b10 * fx1 * (1 - fy1)
        + b01 * (1 - fx1) * fy1
        + b11 * fx1 * fy1
    ).reshape(*row.shape[:-1], 16)
    return a16, b16


def _matq_srgb(out16, mask):
    """Per-slot sRGB decode by mask bit (bit s = slot s), alpha linear —
    the per-slot twin of _srgb_decode."""
    o = out16.reshape(*out16.shape[:-1], 4, 4)
    srgb = (mask[..., None] & jnp.asarray([1, 2, 4, 8], jnp.int32)) != 0
    rgb = jnp.where(
        srgb[..., None], srgb_to_linear_exact(o[..., :3]), o[..., :3]
    )
    out = jnp.concatenate([rgb, o[..., 3:]], axis=-1)
    return out.reshape(*out16.shape[:-1], 16)


def sample_material_interleaved(
    texels_mq, meta, owh, uv, duvdx, duvdy, taps: int, decode_srgb=True,
    texels_tail=None,
):
    """All four material textures of each pixel in TWO gathers (one per
    trilinear level) from the interleaved pool.

    meta: (P, 4) i32 [wrap, srgb_mask, count, pad] (mat_row_mq);
    owh: (P, L, 4) i32 per-level (offset, w, h, tail_offset). Returns
    (P, 16) f32: [albedo | normal | mr | emissive] RGBA each, identical
    math to four sample_anisotropic calls on equal-dims textures (shared
    uv -> shared footprint, lod, and level selection).

    texels_tail: the dedicated levels>=1 pool (Scene.device_matq tail).
    The second trilinear level is always >= 1 (clamped at the chain end),
    so its gather can hit this ~4x smaller table — gather rate is set by
    TABLE size (docs/TIMING.md) — addressed via the tail_offset column.
    None falls back to gathering both levels from the main pool."""
    wrap_mode, mask, count = meta[..., 0], meta[..., 1], meta[..., 2]
    w = owh[..., 0, 1].astype(jnp.float32)
    h = owh[..., 0, 2].astype(jnp.float32)
    dx2 = (duvdx[..., 0] * w) ** 2 + (duvdx[..., 1] * h) ** 2
    dy2 = (duvdy[..., 0] * w) ** 2 + (duvdy[..., 1] * h) ** 2
    wide = texels_mq.shape[-1] == 208  # mq3 rows: quad(L) + 3x3(L+1)

    def trilinear(uv_t, lod):
        l0 = jnp.floor(lod).astype(jnp.int32)
        f = (lod - jnp.floor(lod))[..., None]
        lvl = jnp.clip(l0, 0, count - 1)
        f = jnp.where((l0 < 0)[..., None], 0.0, f)
        a_owh = _select_level(owh, lvl)
        b_owh = _select_level(owh, jnp.clip(l0 + 1, 0, count - 1))
        if wide:
            a, b = _mq3_levels(
                texels_mq, a_owh, b_owh, l0 >= count - 1, wrap_mode, uv_t
            )
        else:
            a = _matq_bilinear(texels_mq, a_owh, wrap_mode, uv_t)
            if texels_tail is not None and owh.shape[-1] >= 4:
                b_towh = jnp.concatenate(
                    [b_owh[..., 3:4], b_owh[..., 1:3]], axis=-1
                )
                b = _matq_bilinear(texels_tail, b_towh, wrap_mode, uv_t)
            else:
                b = _matq_bilinear(texels_mq, b_owh, wrap_mode, uv_t)
        a = a * (1.0 / 255.0)
        b = b * (1.0 / 255.0)
        if decode_srgb:
            a = _matq_srgb(a, mask)
            b = _matq_srgb(b, mask)
        return a * (1 - f) + b * f

    if taps <= 1:
        lod = jnp.maximum(
            0.5 * jnp.log2(jnp.maximum(jnp.maximum(dx2, dy2), 1e-12)), 0.0
        )
        return trilinear(uv, lod)
    major_is_x = dx2 >= dy2
    rho_maj2 = jnp.maximum(dx2, dy2)
    rho_min2 = jnp.minimum(dx2, dy2)
    ratio2 = jnp.clip(
        rho_maj2 / jnp.maximum(rho_min2, 1e-12), 1.0, float(taps) ** 2
    )
    lod = jnp.maximum(0.5 * jnp.log2(jnp.maximum(rho_maj2 / ratio2, 1e-12)), 0.0)
    major = jnp.where(major_is_x[..., None], duvdx, duvdy)
    out = None
    for i in range(taps):
        t = (i + 0.5) / taps - 0.5
        s = trilinear(uv + major * t, lod)
        out = s if out is None else out + s
    return out / taps


def sample_anisotropic(
    texels, tex_desc, tex_id, uv, duvdx, duvdy, taps: int, decode_srgb=True,
    meta=None, levels_owh=None,
):
    """Anisotropic approximation: average `taps` trilinear samples along the
    major-axis uv derivative, lod chosen from the minor axis (clamped by the
    tap count) — the software stand-in for the reference's sampler
    anisotropy_clamp (texture_loading.rs:140-158). taps=1 degrades to plain
    trilinear with isotropic (major-axis) lod.

    meta: optional pre-gathered (P, 4+) tex_meta row (saves the per-pixel
    tex_meta gather here AND in the trilinear taps below). A (P, 6) row
    additionally carries mip-0 (w, h) in channels 4:6 (mat_tex_meta),
    which also saves the lod computation's mip_owh gather.
    """
    if meta is not None and meta.shape[-1] >= 6:
        w = meta[..., 4].astype(jnp.float32)
        h = meta[..., 5].astype(jnp.float32)
    elif meta is not None:
        base = meta[..., 0]
        owh = tex_desc["mip_owh"][base]
        w = owh[..., 1].astype(jnp.float32)
        h = owh[..., 2].astype(jnp.float32)
    elif "tex_meta" in tex_desc:
        base = tex_desc["tex_meta"][tex_id][..., 0]
        owh = tex_desc["mip_owh"][base]
        w = owh[..., 1].astype(jnp.float32)
        h = owh[..., 2].astype(jnp.float32)
    else:
        base = tex_desc["tex_mip_base"][tex_id]
        w = tex_desc["mip_w"][base].astype(jnp.float32)
        h = tex_desc["mip_h"][base].astype(jnp.float32)
    dx2 = (duvdx[..., 0] * w) ** 2 + (duvdx[..., 1] * h) ** 2
    dy2 = (duvdy[..., 0] * w) ** 2 + (duvdy[..., 1] * h) ** 2
    if taps <= 1:
        lod = jnp.maximum(0.5 * jnp.log2(jnp.maximum(jnp.maximum(dx2, dy2), 1e-12)), 0.0)
        return sample_trilinear(
            texels, tex_desc, tex_id, uv, lod, decode_srgb, meta=meta,
            levels_owh=levels_owh,
        )
    major_is_x = dx2 >= dy2
    rho_maj2 = jnp.maximum(dx2, dy2)
    rho_min2 = jnp.minimum(dx2, dy2)
    # effective anisotropy ratio clamped by the tap budget
    ratio2 = jnp.clip(rho_maj2 / jnp.maximum(rho_min2, 1e-12), 1.0, float(taps) ** 2)
    lod = jnp.maximum(0.5 * jnp.log2(jnp.maximum(rho_maj2 / ratio2, 1e-12)), 0.0)
    major = jnp.where(major_is_x[..., None], duvdx, duvdy)
    out = None
    for i in range(taps):
        t = (i + 0.5) / taps - 0.5
        s = sample_trilinear(
            texels, tex_desc, tex_id, uv + major * t, lod, decode_srgb,
            meta=meta, levels_owh=levels_owh,
        )
        out = s if out is None else out + s
    return out / taps
