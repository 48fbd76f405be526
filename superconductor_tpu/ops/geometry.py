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
    first_vertex: (N,)  first vertex row of the primitive's range
    vertex_count: (N,)  vertices in the range (shared-transform stage)
    joints_offset: (N,) base row into the frame's joint palette (animated)
    material:   (N,)    the draw's material (uv transform per vertex)
    lightmapped: (N,)   bool — primitive has a second UV set
    valid:      (N,)    bool mask (padding rows are False)
    """

    sim8: jax.Array
    first_tri: jax.Array
    tri_count: jax.Array
    first_vertex: jax.Array
    vertex_count: jax.Array
    joints_offset: jax.Array
    material: jax.Array
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
    # One (T, 32) f32 row carrying ALL of the above — the deferred stage's
    # per-pixel attribute fetch is ONE gather instead of six (gather lanes
    # dominate the shade stage, docs/KERNELS.md). Layout: world_pos(9),
    # normal(9), uv(6), lm_uv(6), material (i32 bitcast), lightmapped.
    # Built by pack_attrs(); the unpacked fields remain for the raster
    # ref path and tests (XLA dead-code-eliminates whichever goes unused).
    packed: Optional[jax.Array] = None


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


def expand_draw_vertices(draws: DrawList, v_cap: int):
    """Expand a draw list into (draw, vertex) pairs — the shared
    post-transform vertex stage. Returns (vp_inst, scene_vertex, voffsets,
    vp_valid, vtotal)."""
    counts = jnp.where(draws.valid, draws.vertex_count, 0)
    offsets = jnp.cumsum(counts) - counts
    total = counts.sum()
    n = draws.first_vertex.shape[0]
    vp_inst = jnp.repeat(
        jnp.arange(n, dtype=jnp.int32), counts, total_repeat_length=v_cap
    )
    pos = jnp.arange(v_cap, dtype=jnp.int32)
    vp_valid = pos < total
    vp_inst = jnp.where(vp_valid, vp_inst, 0)
    local = pos - offsets[vp_inst]
    scene_vertex = jnp.where(vp_valid, draws.first_vertex[vp_inst] + local, 0)
    return vp_inst, scene_vertex, offsets, vp_valid, total


class VertexStage(NamedTuple):
    """View-independent geometry: everything except the clip transform and
    edge setup. For stereo (and any num_views > 1) the expensive work —
    draw expansion, vertex gathers, joint-palette skinning, world
    transform, uv transforms, per-triangle attribute gathers + packing —
    is computed ONCE here and shared across eyes; geometry_view_setup()
    applies each eye's view_proj to the cached world-space vertices. This
    is the TPU analog of the reference's one-draw-both-eyes multiview
    (pipelines.rs:373: the vertex shader body runs per view, but the CPU
    scene walk and skinning palette are shared; here even the vertex-stage
    skinning is shared because it is view-independent by construction).

    w1:         (V_cap, 4) world-space homogeneous vertex positions
    row3:       (T_cap, 3) transformed-vertex rows per triangle corner
    pair_inst:  (T_cap,)   draw row per triangle pair
    scene_tri:  (T_cap,)   scene triangle id per pair
    pair_valid: (T_cap,)   bool — pair in use and index rows in range
    double_sided: (T_cap,) bool
    num_valid:  ()         i32 — pairs in use
    attrs:      TriangleAttrs (packed row included) — fully view-independent
    """

    w1: jax.Array
    row3: jax.Array
    pair_inst: jax.Array
    scene_tri: jax.Array
    pair_valid: jax.Array
    double_sided: jax.Array
    num_valid: jax.Array
    attrs: "TriangleAttrs"


def geometry_vertex_stage(
    draws: DrawList,
    indices: jax.Array,
    positions: jax.Array,
    normals: jax.Array,
    uvs: jax.Array,
    lm_uvs: Optional[jax.Array],
    tri_material: jax.Array,
    materials: dict,
    t_cap: int,
    v_cap: Optional[int] = None,
    joint_palette: Optional[jax.Array] = None,
    joint_indices: Optional[jax.Array] = None,
    joint_weights: Optional[jax.Array] = None,
    double_sided_from_material: bool = True,
) -> VertexStage:
    """View-independent half of geometry_pass -> VertexStage.

    Two sub-stages, like a GPU's post-transform vertex cache:
      1. vertex stage — every (draw, vertex) pair is skinned/transformed
         exactly ONCE (~3-6x fewer transforms than per-corner work, and
         triangles sharing a vertex read bit-identical clip coords, so
         shared edges are exactly complementary: no T-junction seams from
         per-corner rounding);
      2. triangle stage — gathers the three transformed rows per triangle.
    """
    v_cap = v_cap or t_cap

    # ---- vertex stage ----
    vp_inst, scene_v, voffsets, vp_valid, vtotal = expand_draw_vertices(
        draws, v_cap
    )
    pos = positions[scene_v]  # (V, 3) model space
    nrm = normals[scene_v]
    uv = uvs[scene_v]
    lm = lm_uvs[scene_v] if lm_uvs is not None else jnp.zeros_like(uv)

    if joint_palette is not None:
        ji = joint_indices[scene_v] + draws.joints_offset[vp_inst][:, None]
        jw = joint_weights[scene_v]
        pos, nrm = skin_vertices(pos, nrm, ji, jw, joint_palette)

    sim8 = draws.sim8[vp_inst]  # (V, 8)
    world_v = similarity_apply(sim8, pos)  # (V, 3)
    nrm_v = quat_rotate(sim8[:, 4:8], nrm)

    # Material uv transform (vertex-stage in the reference, lib.rs:55);
    # vertices belong to exactly one primitive = one draw material.
    dmat = draws.material[vp_inst]
    uv_v = _uv_transform(
        uv,
        materials["uv_offset"][dmat],
        materials["uv_scale"][dmat],
        materials["uv_rotation"][dmat],
    )

    w1 = jnp.concatenate([world_v, jnp.ones_like(world_v[..., :1])], axis=-1)

    # ---- triangle stage (view-independent part) ----
    pair_inst, scene_tri, pair_valid, total = expand_draws(draws, t_cap)
    idx3 = indices[scene_tri[:, None] * 3 + jnp.arange(3)[None, :]].astype(jnp.int32)
    # scene vertex id -> transformed-vertex row of this draw
    row3 = voffsets[pair_inst][:, None] + (
        idx3 - draws.first_vertex[pair_inst][:, None]
    )
    row_ok = jnp.all((row3 >= 0) & (row3 < vtotal), axis=1)
    row3 = jnp.clip(row3, 0, v_cap - 1)
    pair_valid = pair_valid & row_ok

    mat = tri_material[scene_tri]
    double_sided = (
        (materials["flags"][mat] & 2) != 0
        if double_sided_from_material
        else jnp.ones_like(pair_valid)
    )

    attrs = pack_attrs(
        TriangleAttrs(
            world_pos=world_v[row3],
            normal=nrm_v[row3],
            uv=uv_v[row3],
            lm_uv=lm[row3],
            material=mat,
            lightmapped=draws.lightmapped[pair_inst],
        )
    )
    return VertexStage(
        w1=w1,
        row3=row3,
        pair_inst=pair_inst,
        scene_tri=scene_tri.astype(jnp.int32),
        pair_valid=pair_valid,
        double_sided=double_sided,
        num_valid=total.astype(jnp.int32),
        attrs=attrs,
    )


def geometry_view_setup(
    stage: VertexStage,
    view_proj: jax.Array,  # (4, 4)
    width: int,
    height: int,
    flip_viewport: bool = False,
) -> TriangleSetup:
    """Per-view half of geometry_pass: clip transform + homogeneous edge
    setup from a cached VertexStage. Cost per extra view is one (V, 4) x
    (4, 4) matmul, a (T, 3, 4) gather, and the setup arithmetic — no
    skinning, no attribute work."""
    clip_v = stage.w1 @ view_proj.T  # (V, 4) — MXU food
    clip = clip_v[stage.row3]  # (T, 3, 4)
    setup = _setup_from_clip(
        clip, stage.pair_valid, stage.double_sided, width, height,
        flip_viewport, vertex_ids=stage.row3,
    )
    return TriangleSetup(
        setup=setup[0],
        tri_id=stage.scene_tri,
        inst_id=stage.pair_inst,
        bbox=setup[2],
        valid=setup[1],
        num_valid=stage.num_valid,
    )


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
    v_cap: Optional[int] = None,
    flip_viewport: bool = False,
    joint_palette: Optional[jax.Array] = None,
    joint_indices: Optional[jax.Array] = None,
    joint_weights: Optional[jax.Array] = None,
    double_sided_from_material: bool = True,
):
    """Full geometry stage for one pass -> (TriangleSetup, TriangleAttrs).

    Single-view convenience wrapper over geometry_vertex_stage (the
    view-independent work) + geometry_view_setup (clip + edge setup).
    Multi-view callers should call the two halves directly and reuse the
    VertexStage across views (render/frame.py does)."""
    stage = geometry_vertex_stage(
        draws,
        indices,
        positions,
        normals,
        uvs,
        lm_uvs,
        tri_material,
        materials,
        t_cap,
        v_cap=v_cap,
        joint_palette=joint_palette,
        joint_indices=joint_indices,
        joint_weights=joint_weights,
        double_sided_from_material=double_sided_from_material,
    )
    tri = geometry_view_setup(
        stage, view_proj, width, height, flip_viewport=flip_viewport
    )
    return tri, stage.attrs


def pack_attrs(attrs: TriangleAttrs) -> TriangleAttrs:
    """Fill TriangleAttrs.packed (see the field comment for the layout)."""
    t = attrs.material.shape[0]
    packed = jnp.concatenate(
        [
            attrs.world_pos.reshape(t, 9),
            attrs.normal.reshape(t, 9),
            attrs.uv.reshape(t, 6),
            attrs.lm_uv.reshape(t, 6),
            jax.lax.bitcast_convert_type(
                attrs.material.astype(jnp.int32), jnp.float32
            ).reshape(t, 1),
            attrs.lightmapped.astype(jnp.float32).reshape(t, 1),
        ],
        axis=-1,
    )
    return attrs._replace(packed=packed)


def _setup_from_clip(clip, pair_valid, double_sided, width, height,
                     flip_viewport, vertex_ids=None):
    """Homogeneous triangle setup from clip coords (T, 3, 4).

    vertex_ids (T, 3) int32, optional: a per-corner identity (e.g. the
    transformed-vertex row). When given, each edge's coefficients are
    computed with the edge's two vertices in CANONICAL (id-sorted) operand
    order and multiplied by an orientation sign. Two triangles sharing an
    edge then compute bit-identical products (same fma contraction), so
    their edge functions are exact negations of each other and a pixel
    center on the shared edge is covered by at least one of them —
    watertight rasterization without fixed-point snapping."""
    xc, yc, zc, wc = clip[..., 0], clip[..., 1], clip[..., 2], clip[..., 3]
    if flip_viewport:
        yc = -yc

    # Homogeneous viewport transform: x_v = (xc + wc) * W/2 = px * wc,
    # y_v = (wc - yc) * H/2 = py * wc (pixel y down).
    xv = (xc + wc) * (width * 0.5)
    yv = (wc - yc) * (height * 0.5)

    def edge_coeffs(j, k):
        # adj row opposite vertex i = cross(row_j, row_k), rows (xv, yv, wc)
        if vertex_ids is None:
            yj, wj, xj = yv[:, j], wc[:, j], xv[:, j]
            yk, wk, xk = yv[:, k], wc[:, k], xv[:, k]
            sign = 1.0
        else:
            swap = vertex_ids[:, j] > vertex_ids[:, k]
            sign = jnp.where(swap, -1.0, 1.0)

            def pick(arr):
                return (
                    jnp.where(swap, arr[:, k], arr[:, j]),
                    jnp.where(swap, arr[:, j], arr[:, k]),
                )

            (yj, yk) = pick(yv)
            (wj, wk) = pick(wc)
            (xj, xk) = pick(xv)
        a = (yj * wk - yk * wj) * sign
        b = (wj * xk - wk * xj) * sign
        c = (xj * yk - xk * yj) * sign
        return a, b, c

    a0, b0, c0 = edge_coeffs(1, 2)
    a1, b1, c1 = edge_coeffs(2, 0)
    a2, b2, c2 = edge_coeffs(0, 1)

    m00, m01, m02 = xv[:, 0], yv[:, 0], wc[:, 0]

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


def make_draw_list(sim8, first_tri, tri_count, first_vertex=None,
                   vertex_count=None, joints_offset=None, material=None,
                   lightmapped=None, valid=None) -> DrawList:
    """Convenience constructor with defaults for optional fields."""
    n = sim8.shape[0]
    z = jnp.zeros(n, jnp.int32)
    return DrawList(
        sim8=jnp.asarray(sim8, jnp.float32),
        first_tri=jnp.asarray(first_tri, jnp.int32),
        tri_count=jnp.asarray(tri_count, jnp.int32),
        first_vertex=z if first_vertex is None else jnp.asarray(first_vertex, jnp.int32),
        vertex_count=z if vertex_count is None else jnp.asarray(vertex_count, jnp.int32),
        joints_offset=z if joints_offset is None else jnp.asarray(joints_offset, jnp.int32),
        material=z if material is None else jnp.asarray(material, jnp.int32),
        lightmapped=jnp.zeros(n, bool) if lightmapped is None else jnp.asarray(lightmapped, bool),
        valid=jnp.ones(n, bool) if valid is None else jnp.asarray(valid, bool),
    )
