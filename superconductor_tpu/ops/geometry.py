"""Geometry stage: draw-list expansion, vertex transform/skinning, and
homogeneous triangle setup.

Replaces the reference's vertex shaders (shaders/src/lib.rs:25-127,
depth_prepass_vertex :757-775) and the GPU's fixed-function triangle setup.

TPU-first design notes:

  * Draws are expanded to a flat (T_cap,) triangle-instance pair list on
    device with ``jnp.repeat(..., total_repeat_length=...)`` — no host
    round-trip, fully static shapes under jit.
  * Rasterization is done in 2D homogeneous coordinates (Olano & Greer,
    "Triangle Scan Conversion using 2D Homogeneous Coordinates"): edge
    functions come from the adjugate of the 3x3 matrix of (x_px*w, y_px*w,
    w) rows, so triangles crossing the w=0 plane never need clipping — the
    e_i(p) > 0 tests carve out exactly the visible region. This avoids
    data-dependent clipping entirely, which would be poison for XLA.
  * Perspective-correct interpolation falls out for free: with e_i the
    adjugate edge values at pixel p, attr(p) = (sum e_i a_i) / (sum e_i),
    and NDC depth z/w = (sum e_i z_i) / (sum e_i w_i).
  * Setup is packed as a (T_cap, 16) f32 SoA row per triangle:
    [a0,b0,c0, a1,b1,c1, a2,b2,c2, zc0,zc1,zc2, wc0,wc1,wc2, flags]
    (edge i: e_i(px,py) = a_i*px + b_i*py + c_i) so the Pallas raster
    kernel can DMA contiguous rows.
  * Alongside setup, the stage emits per-pair vertex attributes (world
    position, world normal, uv, lightmap uv, material) so the deferred
    shading pass is pure gathers — skinned geometry needs no second
    skinning pass at shading time.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..math3d import quat_rotate, similarity_apply

# flags bits in setup[:, 15] (stored as float of a small integer)
FLAG_BACKFACING = 1.0  # back-facing double-sided triangle (normal must flip)


class DrawList(NamedTuple):
    """One render pass's instances, padded to a static capacity.

    sim8:       (N, 8)  packed instance Similarity (already composed with the
                        primitive's node transform on host)
    first_tri:  (N,)    first triangle (first_index / 3) in the mega-buffer
    tri_count:  (N,)    number of triangles
    joints_offset: (N,) base row into the frame's joint palette (animated)
    lightmapped: (N,)   bool — primitive has a second UV set
    valid:      (N,)    bool mask (padding rows are False)
    """

    sim8: jax.Array
    first_tri: jax.Array
    tri_count: jax.Array
    joints_offset: jax.Array
    lightmapped: jax.Array
    valid: jax.Array


class TriangleSetup(NamedTuple):
    setup: jax.Array  # (T, 16) f32 — see module docstring
    tri_id: jax.Array  # (T,) i32 scene triangle id (into indices/3)
    inst_id: jax.Array  # (T,) i32 row into the DrawList
    bbox: jax.Array  # (T, 4) i32 [x0, y0, x1, y1] inclusive pixel bounds
    valid: jax.Array  # (T,) bool
    num_valid: jax.Array  # () i32 — number of pair rows in use (<= T)


class TriangleAttrs(NamedTuple):
    world_pos: jax.Array  # (T, 3, 3)
    normal: jax.Array  # (T, 3, 3) world-space, unnormalized
    uv: jax.Array  # (T, 3, 2) — material uv transform already applied
    lm_uv: jax.Array  # (T, 3, 2)
    material: jax.Array  # (T,) i32
    lightmapped: jax.Array  # (T,) bool


def expand_draws(draws: DrawList, t_cap: int):
    """Expand a draw list into per-triangle (inst_id, scene_tri) pairs."""
    counts = jnp.where(draws.valid, draws.tri_count, 0)
    offsets = jnp.cumsum(counts) - counts
    total = counts.sum()
    n = draws.first_tri.shape[0]
    pair_inst = jnp.repeat(
        jnp.arange(n, dtype=jnp.int32), counts, total_repeat_length=t_cap
    )
    pair_pos = jnp.arange(t_cap, dtype=jnp.int32)
    pair_valid = pair_pos < total
    pair_inst = jnp.where(pair_valid, pair_inst, 0)
    local = pair_pos - offsets[pair_inst]
    scene_tri = draws.first_tri[pair_inst] + local
    scene_tri = jnp.where(pair_valid, scene_tri, 0)
    return pair_inst, scene_tri, pair_valid, total


def skin_vertices(positions, normals, joint_indices, joint_weights, palette8):
    """Joint-palette skinning on packed Similarity joints.

    Parity with animated_vertex (shaders/src/lib.rs:64-127): weights are
    renormalized by their sum, position = sum_k w_k * (T_k + s_k*(q_k*p)),
    normal = sum_k w_k * (q_k * n). The palette is one global HBM array —
    no 2048-joint UBO limit (the reference wished for this,
    architecture.md "Joint Transform Buffers").
    """
    w = joint_weights / jnp.sum(joint_weights, axis=-1, keepdims=True)
    j = palette8[joint_indices]  # (..., 4, 8)
    p = similarity_apply(j, positions[..., None, :])  # (..., 4, 3)
    skinned_pos = jnp.sum(w[..., None] * p, axis=-2)
    n = quat_rotate(j[..., 4:8], normals[..., None, :])
    skinned_nrm = jnp.sum(w[..., None] * n, axis=-2)
    return skinned_pos, skinned_nrm


def _uv_transform(uv, offset, scale, rotation):
    """KHR_texture_transform as the reference applies it
    (MaterialSettings::transform_uv, shared-structs/src/lib.rs:252-258):
    offset + rot(rotation) * (scale * uv)."""
    c = jnp.cos(rotation)[..., None]
    s = jnp.sin(rotation)[..., None]
    su = uv * scale
    x = c[..., 0] * su[..., 0] - s[..., 0] * su[..., 1]
    y = s[..., 0] * su[..., 0] + c[..., 0] * su[..., 1]
    return offset + jnp.stack([x, y], axis=-1)


def geometry_pass(
    draws: DrawList,
    indices: jax.Array,
    positions: jax.Array,
    normals: jax.Array,
    uvs: jax.Array,
    lm_uvs: Optional[jax.Array],
    tri_material: jax.Array,
    materials: dict,
    view_proj: jax.Array,  # (4, 4)
    width: int,
    height: int,
    t_cap: int,
    flip_viewport: bool = False,
    joint_palette: Optional[jax.Array] = None,
    joint_indices: Optional[jax.Array] = None,
    joint_weights: Optional[jax.Array] = None,
    double_sided_from_material: bool = True,
):
    """Full geometry stage for one pass -> (TriangleSetup, TriangleAttrs)."""
    pair_inst, scene_tri, pair_valid, total = expand_draws(draws, t_cap)

    idx3 = indices[scene_tri[:, None] * 3 + jnp.arange(3)[None, :]].astype(jnp.int32)
    pos = positions[idx3]  # (T, 3, 3) model space
    nrm = normals[idx3]
    uv = uvs[idx3]
    lm = lm_uvs[idx3] if lm_uvs is not None else jnp.zeros_like(uv)
    mat = tri_material[scene_tri]

    if joint_palette is not None:
        ji = joint_indices[idx3] + draws.joints_offset[pair_inst][:, None, None]
        jw = joint_weights[idx3]
        pos, nrm = skin_vertices(pos, nrm, ji, jw, joint_palette)

    sim8 = draws.sim8[pair_inst]  # (T, 8)
    world = similarity_apply(sim8[:, None, :], pos)  # (T, 3, 3)
    world_nrm = quat_rotate(sim8[:, None, 4:8], nrm)

    # Material uv transform (vertex-stage in the reference, lib.rs:55).
    uv = _uv_transform(
        uv,
        materials["uv_offset"][mat][:, None, :],
        materials["uv_scale"][mat][:, None, :],
        materials["uv_rotation"][mat][:, None],
    )

    # Clip-space transform: one (T*3, 4) x (4, 4) matmul — MXU food.
    w1 = jnp.concatenate([world, jnp.ones_like(world[..., :1])], axis=-1)
    clip = (w1.reshape(-1, 4) @ view_proj.T).reshape(-1, 3, 4)

    double_sided = (
        (materials["flags"][mat] & 2) != 0
        if double_sided_from_material
        else jnp.ones_like(pair_valid)
    )

    setup = _setup_from_clip(
        clip, pair_valid, double_sided, width, height, flip_viewport
    )
    setup = TriangleSetup(
        setup=setup[0],
        tri_id=scene_tri.astype(jnp.int32),
        inst_id=pair_inst,
        bbox=setup[2],
        valid=setup[1],
        num_valid=total.astype(jnp.int32),
    )
    attrs = TriangleAttrs(
        world_pos=world,
        normal=world_nrm,
        uv=uv,
        lm_uv=lm,
        material=mat,
        lightmapped=draws.lightmapped[pair_inst],
    )
    return setup, attrs


def _setup_from_clip(clip, pair_valid, double_sided, width, height, flip_viewport):
    """Homogeneous triangle setup from clip coords (T, 3, 4)."""
    xc, yc, zc, wc = clip[..., 0], clip[..., 1], clip[..., 2], clip[..., 3]
    if flip_viewport:
        yc = -yc

    # Homogeneous viewport transform: x_v = (xc + wc) * W/2 = px * wc,
    # y_v = (wc - yc) * H/2 = py * wc (pixel y down).
    xv = (xc + wc) * (width * 0.5)
    yv = (wc - yc) * (height * 0.5)

    m00, m01, m02 = xv[:, 0], yv[:, 0], wc[:, 0]
    m10, m11, m12 = xv[:, 1], yv[:, 1], wc[:, 1]
    m20, m21, m22 = xv[:, 2], yv[:, 2], wc[:, 2]

    # adj rows: e_i(p) = adj_i . (px, py, 1), zero on the edge opposite
    # vertex i, equal to det/w_i at vertex i.
    a0 = m11 * m22 - m12 * m21
    b0 = m12 * m20 - m10 * m22
    c0 = m10 * m21 - m11 * m20
    a1 = m21 * m02 - m22 * m01
    b1 = m22 * m00 - m20 * m02
    c1 = m20 * m01 - m21 * m00
    a2 = m01 * m12 - m02 * m11
    b2 = m02 * m10 - m00 * m12
    c2 = m00 * m11 - m01 * m10

    det = m00 * a0 + m01 * b0 + m02 * c0

    # Orientation: glTF front faces are CCW in NDC (y up); the viewport
    # transform flips to pixel y-down, so front faces have det < 0 (det =
    # w0*w1*w2 * 2*signed_area for all-positive w). Edge signs are
    # normalized so e_i > 0 inside for every kept triangle; back-facing
    # double-sided triangles record FLAG_BACKFACING so shading flips the
    # normal (calculate_normal's front_facing handling, shaders/src/
    # lib.rs:544-560); back-facing single-sided triangles are culled.
    front_facing = det < 0.0
    keep = front_facing | double_sided
    flip = jnp.where(front_facing, -1.0, 1.0)

    valid = pair_valid & keep & (det != 0.0)

    edge = jnp.stack([a0, b0, c0, a1, b1, c1, a2, b2, c2], axis=-1) * flip[:, None]
    zrow = zc
    wrow = wc
    flags = jnp.where(front_facing, 0.0, FLAG_BACKFACING)
    setup = jnp.concatenate([edge, zrow, wrow, flags[:, None]], axis=-1).astype(
        jnp.float32
    )

    # Conservative screen bbox; w <= eps vertices make it unbounded -> full
    # screen (near-plane crossers are rare, correctness beats tightness).
    eps = 1e-6
    w_ok = wc > eps
    inv_w = jnp.where(w_ok, 1.0 / jnp.maximum(wc, eps), 0.0)
    px = xv * inv_w
    py = yv * inv_w
    big = jnp.float32(1e9)
    x0 = jnp.min(jnp.where(w_ok, px, big), axis=1)
    x1 = jnp.max(jnp.where(w_ok, px, -big), axis=1)
    y0 = jnp.min(jnp.where(w_ok, py, big), axis=1)
    y1 = jnp.max(jnp.where(w_ok, py, -big), axis=1)
    any_behind = ~jnp.all(w_ok, axis=1)
    all_behind = ~jnp.any(w_ok, axis=1)
    x0 = jnp.where(any_behind, 0.0, x0)
    y0 = jnp.where(any_behind, 0.0, y0)
    x1 = jnp.where(any_behind, jnp.float32(width - 1), x1)
    y1 = jnp.where(any_behind, jnp.float32(height - 1), y1)
    valid = valid & ~all_behind

    offscreen = (x1 < 0) | (y1 < 0) | (x0 > width - 1) | (y0 > height - 1)
    valid = valid & ~offscreen

    bx0 = jnp.clip(jnp.floor(x0 - 0.5), 0, width - 1).astype(jnp.int32)
    by0 = jnp.clip(jnp.floor(y0 - 0.5), 0, height - 1).astype(jnp.int32)
    bx1 = jnp.clip(jnp.ceil(x1 + 0.5), 0, width - 1).astype(jnp.int32)
    by1 = jnp.clip(jnp.ceil(y1 + 0.5), 0, height - 1).astype(jnp.int32)
    bbox = jnp.stack([bx0, by0, bx1, by1], axis=-1)

    return setup, valid, bbox


def make_draw_list(sim8, first_tri, tri_count, joints_offset=None, lightmapped=None,
                   valid=None) -> DrawList:
    """Convenience constructor with defaults for optional fields."""
    n = sim8.shape[0]
    z = jnp.zeros(n, jnp.int32)
    return DrawList(
        sim8=jnp.asarray(sim8, jnp.float32),
        first_tri=jnp.asarray(first_tri, jnp.int32),
        tri_count=jnp.asarray(tri_count, jnp.int32),
        joints_offset=z if joints_offset is None else jnp.asarray(joints_offset, jnp.int32),
        lightmapped=jnp.zeros(n, bool) if lightmapped is None else jnp.asarray(lightmapped, bool),
        valid=jnp.ones(n, bool) if valid is None else jnp.asarray(valid, bool),
    )
