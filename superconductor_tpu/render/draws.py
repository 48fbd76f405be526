"""Host-side per-frame draw-list building: instances -> padded DrawLists.

The analog of push_entity_instances + upload_instances
(src/systems.rs:204-332, 334-365): every frame the host walks the visible
(model, instance) pairs, composes instance x primitive transforms, culls,
selects LODs, and emits flat arrays. Capacities are padded to powers of two
so the jitted frame function's shapes stay stable as the scene churns.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..math3d import Similarity
from ..scene.scene import Model, Scene
from .camera import Uniforms
from .culling import (
    BoundingSphereParams,
    CullingFrustum,
    test_bounding_spheres,
    test_obbs_sat_exact,
)
from .frame import FrameState
from .lod import select_lod


def _next_pow2(n: int) -> int:
    return 1 << max(0, (int(n) - 1)).bit_length() if n > 1 else 1


@dataclass
class DrawRows:
    sim8: List[np.ndarray] = field(default_factory=list)
    first_tri: List[int] = field(default_factory=list)
    tri_count: List[int] = field(default_factory=list)
    first_vertex: List[int] = field(default_factory=list)
    vertex_count: List[int] = field(default_factory=list)
    joints_offset: List[int] = field(default_factory=list)
    material: List[int] = field(default_factory=list)
    lightmapped: List[bool] = field(default_factory=list)

    def add(self, sim8, first_index, index_count, first_vertex=0,
            vertex_count=0, joints_offset=0, material=0, lightmapped=False):
        self.sim8.append(sim8)
        self.first_tri.append(first_index // 3)
        self.tri_count.append(index_count // 3)
        self.first_vertex.append(first_vertex)
        self.vertex_count.append(vertex_count)
        self.joints_offset.append(joints_offset)
        self.material.append(material)
        self.lightmapped.append(lightmapped)

    def to_arrays(self, cap: Optional[int] = None):
        n = len(self.first_tri)
        cap = cap or max(1, _next_pow2(n))
        sim8 = np.zeros((cap, 8), np.float32)
        sim8[:, 7] = 1.0  # identity quat w
        if n:
            sim8[:n] = np.stack(self.sim8)

        def col(vals, dtype=np.int32):
            out = np.zeros(cap, dtype)
            out[:n] = vals
            return out

        valid = np.zeros(cap, bool)
        valid[:n] = True
        from ..ops.geometry import DrawList

        return DrawList(
            sim8=sim8,
            first_tri=col(self.first_tri),
            tri_count=col(self.tri_count),
            first_vertex=col(self.first_vertex),
            vertex_count=col(self.vertex_count),
            joints_offset=col(self.joints_offset),
            material=col(self.material),
            lightmapped=col(self.lightmapped, bool),
            valid=valid,
        )


def pack_lines(segments, color_ids, cap: Optional[int] = None) -> dict:
    """Pad line segments to a pow2 cap: {pos (L,2,3), color, valid}."""
    n = len(segments)
    cap = cap or max(1, _next_pow2(n))
    pos = np.zeros((cap, 2, 3), np.float32)
    col = np.zeros(cap, np.int32)
    valid = np.zeros(cap, bool)
    if n:
        pos[:n] = np.asarray(segments, np.float32)
        col[:n] = np.asarray(color_ids, np.int32)
        valid[:n] = True
    return {"pos": pos, "color": col, "valid": valid}


def pack_particles(particles: Optional[List[dict]] = None, cap: Optional[int] = None) -> dict:
    """Pad particle dicts to a pow2 cap SoA (ParticleInstance fields,
    renderer-core/src/instance.rs:22-31)."""
    particles = particles or []
    n = len(particles)
    cap = cap or max(1, _next_pow2(n))

    def field(name, dim, default=0.0):
        out = np.full((cap, dim) if dim > 1 else (cap,), default, np.float32)
        for i, p in enumerate(particles):
            out[i] = p.get(name, default)
        return out

    return {
        "center": field("center", 3),
        "scale": field("scale", 2, 1.0),
        "colour": field("colour", 3, 1.0),
        "uv_offset": field("uv_offset", 2, 0.0),
        "uv_scale": field("uv_scale", 2, 1.0),
        "emissive_colour": field("emissive_colour", 3, 0.0),
        "use_emissive_lut": np.array(
            [p.get("use_emissive_lut", 0) for p in particles] + [0] * (cap - n),
            np.int32,
        ),
        "lut_y": field("lut_y", 1, 0.0),
        "valid": np.array([True] * n + [False] * (cap - n), bool),
    }


def build_frame_state(
    scene: Scene,
    instances: Sequence[Tuple[Model, Similarity]],
    uniforms: Uniforms,
    joint_palettes: Optional[dict] = None,
    cull_params: Optional[List[BoundingSphereParams]] = None,
    screen_height: int = 1080,
    draw_cap: Optional[int] = None,
    lines: Optional[dict] = None,
    particles: Optional[dict] = None,
    sat: Optional[tuple] = None,  # (view_matrix (4,4), CullingFrustum)
) -> FrameState:
    """Walk instances, cull, select LODs, emit the FrameState.

    joint_palettes: {id(instance_tuple) or index -> (J, 8) palette} for
    animated instances; palettes are concatenated and joints_offset set per
    draw (the reference chunks 2048-joint uniform buffers instead,
    src/components.rs:123-172).

    Culling mirrors push_entity_instances (src/systems.rs:258-291):
    bounding-sphere test against each view's planes (union for VR), then
    the optional exact SAT OBB refinement when ``sat`` is given — here the
    SAT runs vectorized over every candidate primitive at once.
    """
    static_rows = DrawRows()
    anim_rows = DrawRows()
    palettes: List[np.ndarray] = []
    palette_offset = 0

    # Collect candidates first so culling runs batched.
    candidates = []  # (inst_index, model, prim, sim)
    for inst_index, (model, instance_sim) in enumerate(instances):
        for prim in model.primitives:
            candidates.append((inst_index, model, prim, instance_sim * prim.transform))

    visible_mask = np.ones(len(candidates), bool)
    if candidates and cull_params:
        centers = np.stack([c[3].translation for c in candidates])
        radii = np.array(
            [c[3].scale * c[2].bounding_sphere_radius for c in candidates],
            np.float32,
        )
        vis = np.zeros(len(candidates), bool)
        for cp in cull_params:
            vis |= test_bounding_spheres(centers, radii, cp)
        visible_mask &= vis
    if candidates and sat is not None:
        view_m, frustum = sat
        idxs = np.where(visible_mask)[0]
        if len(idxs):
            def _bb(v):
                return np.zeros(3, np.float32) if v is None else np.asarray(v, np.float32)

            mins = np.stack([_bb(candidates[i][2].bbox_min) for i in idxs])
            maxs = np.stack([_bb(candidates[i][2].bbox_max) for i in idxs])
            sims = np.stack([candidates[i][3].to_array() for i in idxs])
            keep = test_obbs_sat_exact(mins, maxs, sims, view_m, frustum)
            visible_mask[idxs] &= keep

    seen_palette: dict = {}
    for ci, (inst_index, model, prim, sim) in enumerate(candidates):
        if not visible_mask[ci]:
            continue
        joints_offset = 0
        if model.animated and joint_palettes is not None:
            pal = joint_palettes.get(inst_index)
            if pal is not None and len(pal):
                if inst_index not in seen_palette:
                    seen_palette[inst_index] = palette_offset
                    palettes.append(np.asarray(pal, np.float32))
                    palette_offset += len(pal)
                joints_offset = seen_palette[inst_index]
        lod_index = select_lod(prim, sim, uniforms.eye[0], screen_height)
        lod = prim.lods[lod_index]
        rows = anim_rows if prim.animated else static_rows
        rows.add(
            sim.to_array(),
            lod.first_index,
            lod.index_count,
            first_vertex=lod.first_vertex,
            vertex_count=lod.vertex_count,
            joints_offset=joints_offset,
            material=prim.material,
            lightmapped=lod.lightmapped,
        )

    palette = (
        np.concatenate(palettes, axis=0)
        if palettes
        else np.zeros((1, 8), np.float32)
    )
    if palette.shape[0] < _next_pow2(palette.shape[0]):
        pad = _next_pow2(palette.shape[0]) - palette.shape[0]
        palette = np.concatenate([palette, np.zeros((pad, 8), np.float32)])

    return FrameState(
        uniforms=uniforms.as_device_dict(),
        draws_static=static_rows.to_arrays(draw_cap),
        draws_animated=anim_rows.to_arrays(draw_cap),
        joint_palette=palette.astype(np.float32),
        lines=lines if lines is not None else pack_lines([], []),
        particles=particles if particles is not None else pack_particles(),
    )
