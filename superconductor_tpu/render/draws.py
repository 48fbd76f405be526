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


_framestate_available: Optional[bool] = None


def _framestate_native() -> bool:
    """Whether the C++ draw builder is usable (SC_TPU_NO_NATIVE_DRAWS=1
    forces the numpy reference path)."""
    global _framestate_available
    import os

    if os.environ.get("SC_TPU_NO_NATIVE_DRAWS"):
        return False
    if _framestate_available is None:
        try:
            from ..native.framestate import available

            _framestate_available = available()
        except Exception:
            _framestate_available = False
    return _framestate_available


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
        return _pack_compact(
            {
                "sim8": np.stack(self.sim8)
                if n
                else np.zeros((0, 8), np.float32),
                "first_tri": self.first_tri,
                "tri_count": self.tri_count,
                "first_vertex": self.first_vertex,
                "vertex_count": self.vertex_count,
                "material": self.material,
                "lightmapped": self.lightmapped,
                "inst": np.zeros(n, np.int32),
                "joints_offset": self.joints_offset,
            },
            None,
            cap,
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


def _model_frame_arrays(model: Model) -> dict:
    """Per-model SoA of primitive metadata, cached on the Model — the
    vectorized form of the per-primitive attribute walk so build_frame_state
    composes/culls/LOD-selects whole models with numpy, not Python loops.
    LOD tables are padded to the model's deepest chain by repeating the last
    level; coverage thresholds pad with -inf so padding never selects."""
    cache = model.__dict__.get("_frame_arrays")
    if cache is not None:
        return cache
    prims = model.primitives
    n = len(prims)
    lmax = max((len(p.lods) for p in prims), default=1)

    def lod_col(get, dtype):
        out = np.zeros((n, lmax), dtype)
        for i, p in enumerate(prims):
            vals = [get(l) for l in p.lods]
            vals += [vals[-1]] * (lmax - len(vals))
            out[i] = vals
        return out

    cov = np.full((n, lmax), -np.inf, np.float32)
    for i, p in enumerate(prims):
        if p.lod_coverages:
            c = np.asarray(p.lod_coverages, np.float32)[:lmax]
            cov[i, : len(c)] = c

    def _bb(v):
        return np.zeros(3, np.float32) if v is None else np.asarray(v, np.float32)

    cache = {
        "prim8": np.stack([p.transform.to_array() for p in prims])
        if n
        else np.zeros((0, 8), np.float32),
        "radius": np.array([p.bounding_sphere_radius for p in prims], np.float32),
        "material": np.array([p.material for p in prims], np.int32),
        "animated": np.array([p.animated for p in prims], bool),
        "n_lods": np.array([max(1, len(p.lods)) for p in prims], np.int32),
        "bbox_min": np.stack([_bb(p.bbox_min) for p in prims])
        if n
        else np.zeros((0, 3), np.float32),
        "bbox_max": np.stack([_bb(p.bbox_max) for p in prims])
        if n
        else np.zeros((0, 3), np.float32),
        "lod_cov": cov,
        "lod_first_tri": lod_col(lambda l: l.first_index // 3, np.int32),
        "lod_tri_count": lod_col(lambda l: l.index_count // 3, np.int32),
        "lod_first_vertex": lod_col(lambda l: l.first_vertex, np.int32),
        "lod_vertex_count": lod_col(lambda l: l.vertex_count, np.int32),
        "lod_lightmapped": lod_col(lambda l: l.lightmapped, bool),
    }
    model.__dict__["_frame_arrays"] = cache
    return cache


_BIG_TABLE_CACHE: dict = {}

_LOD_KEYS = (
    "lod_cov",
    "lod_first_tri",
    "lod_tri_count",
    "lod_first_vertex",
    "lod_vertex_count",
    "lod_lightmapped",
)
_FLAT_KEYS = ("prim8", "radius", "material", "animated", "n_lods",
              "bbox_min", "bbox_max")


def _big_tables(mas: list) -> dict:
    """Concatenated per-model SoA tables for a frame's unique model list.

    The concatenation (including padding every model's LOD tables to the
    frame's deepest chain) is invariant while the same models are drawn, so
    it is cached keyed on the identity of the per-model cache dicts. NOTE:
    nothing watches `model.primitives` for mutation — editing a loaded
    model requires Model.invalidate_frame_cache(), which pops the
    _frame_arrays dict and thereby changes this cache's key too. Bounded
    to keep churny scenes from accumulating stale entries."""
    key = tuple(id(ma) for ma in mas)
    hit = _BIG_TABLE_CACHE.get(key)
    if hit is not None:
        return hit[1]  # hit[0] pins the ma dicts so their ids stay unique
    lmax = max(ma["lod_cov"].shape[1] for ma in mas)
    tables = {
        k: np.concatenate([ma[k] for ma in mas]) for k in _FLAT_KEYS
    }
    for k in _LOD_KEYS:
        tables[k] = np.concatenate(
            [
                np.pad(ma[k], ((0, 0), (0, lmax - ma[k].shape[1])), mode="edge")
                for ma in mas
            ]
        )
    counts = np.array([ma["prim8"].shape[0] for ma in mas], np.int32)
    tables["prim_counts"] = counts
    tables["prim_base"] = np.concatenate([[0], counts.cumsum()[:-1]]).astype(
        np.int32
    )
    # uint8 views + scalar flags for the native (C++) fast path
    tables["animated_u8"] = np.ascontiguousarray(tables["animated"]).view(
        np.uint8
    )
    tables["lod_lightmapped_u8"] = np.ascontiguousarray(
        tables["lod_lightmapped"]
    ).view(np.uint8)
    tables["any_lods"] = bool((tables["n_lods"] > 1).any())
    if len(_BIG_TABLE_CACHE) >= 64:
        _BIG_TABLE_CACHE.clear()
    _BIG_TABLE_CACHE[key] = (list(mas), tables)
    return tables


def _register_palettes(instances, joint_palettes, inst_visible):
    """Concatenate joint palettes for visible animated instances, in
    instance order; returns (palette list, per-instance offsets)."""
    palettes: List[np.ndarray] = []
    palette_offset = 0
    inst_pal_offset = np.zeros(len(instances), np.int32)
    if joint_palettes is not None:
        for inst_index, (model, _s) in enumerate(instances):
            if not (inst_visible[inst_index] and model.animated):
                continue
            pal = joint_palettes.get(inst_index)
            if pal is not None and len(pal):
                inst_pal_offset[inst_index] = palette_offset
                palettes.append(np.asarray(pal, np.float32))
                palette_offset += len(pal)
    return palettes, inst_pal_offset


def _pack_compact(c: dict, inst_pal_offset, draw_cap):
    """Pad a compact draw dict (n visible rows) to a pow2-cap DrawList.

    joints_offset comes from inst_pal_offset[c["inst"]] when palette
    offsets are per-instance (build_frame_state paths), or from an explicit
    c["joints_offset"] (DrawRows)."""
    from ..ops.geometry import DrawList

    n = len(c["first_tri"])
    cap = draw_cap or max(1, _next_pow2(n))
    sim8 = np.zeros((cap, 8), np.float32)
    sim8[:, 7] = 1.0
    sim8[:n] = c["sim8"]

    def col(vals, dtype=np.int32):
        out = np.zeros(cap, dtype)
        out[:n] = vals
        return out

    joints = (
        c["joints_offset"]
        if inst_pal_offset is None
        else inst_pal_offset[c["inst"]]
    )
    valid = np.zeros(cap, bool)
    valid[:n] = True
    return DrawList(
        sim8=sim8,
        first_tri=col(c["first_tri"]),
        tri_count=col(c["tri_count"]),
        first_vertex=col(c["first_vertex"]),
        vertex_count=col(c["vertex_count"]),
        joints_offset=col(joints),
        material=col(c["material"]),
        lightmapped=col(c["lightmapped"], bool),
        valid=valid,
    )


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

    joint_palettes: {instance index -> (J, 8) palette} for animated
    instances; palettes are concatenated and joints_offset set per draw
    (the reference chunks 2048-joint uniform buffers instead,
    src/components.rs:123-172).

    Culling mirrors push_entity_instances (src/systems.rs:258-291):
    bounding-sphere test against each view's planes (union for VR), then
    the optional exact SAT OBB refinement when ``sat`` is given.

    The whole walk is vectorized: per-model primitive metadata is cached as
    SoA (_model_frame_arrays), instance transforms compose against all of a
    model's primitives at once (similarity_compose8), and culling/LOD/pack
    are batched numpy — the reference's per-instance-x-primitive hot loop
    (src/systems.rs:204-332) with no per-candidate Python cost.
    """
    from ..math3d import similarity_compose8

    # --- compose candidates (instance x primitive) in ONE batched call:
    # unique models contribute their cached SoA once; every candidate row is
    # a gather from those tables, so cost scales with candidates, not with
    # Python-level instances-x-primitives iterations ---
    uniq: dict = {}  # id(model) -> (uid, ma)
    inst_uid = np.empty(len(instances), np.int32)
    for inst_index, (model, _s) in enumerate(instances):
        ent = uniq.get(id(model))
        if ent is None:
            ent = (len(uniq), _model_frame_arrays(model))
            uniq[id(model)] = ent
        inst_uid[inst_index] = ent[0]
    mas = [ma for (_uid, ma) in sorted(uniq.values(), key=lambda e: e[0])]

    if mas:
        tables = _big_tables(mas)

        def big(key):
            return tables[key]

        prim_counts = tables["prim_counts"]
        prim_base = tables["prim_base"]
    else:
        prim_counts = prim_base = np.zeros(0, np.int32)

    counts = prim_counts[inst_uid] if len(instances) else np.zeros(0, np.int32)
    n_cand = int(counts.sum())

    use_native = n_cand > 0 and sat is None and _framestate_native()
    if use_native:
        # --- native (C++) fast path: the same compose/cull/LOD/pack walk in
        # src/framestate.cpp; the numpy path below remains the reference
        # implementation (and handles the optional exact-SAT refinement) ---
        from ..native.framestate import build_draws_native

        inst8 = np.ascontiguousarray(
            np.stack([s.to_array() for (_m, s) in instances]), np.float32
        )
        eye = np.asarray(uniforms.eye[0], np.float32)
        aspect = 1920 / screen_height
        y = np.tan(np.radians(59.0) / 2.0)
        static_c, anim_c, inst_visible = build_draws_native(
            inst8,
            inst_uid,
            tables,
            [cp.planes for cp in cull_params] if cull_params else None,
            tables["any_lods"],
            eye,
            float(y * y * aspect),
            copy=False,  # _pack_compact repacks the rows before returning
        )
        palettes, inst_pal_offset = _register_palettes(
            instances, joint_palettes, inst_visible
        )
        draws_static = _pack_compact(static_c, inst_pal_offset, draw_cap)
        draws_animated = _pack_compact(anim_c, inst_pal_offset, draw_cap)
    elif n_cand:
        # ragged arange: candidate -> primitive row in the big tables
        ends = counts.cumsum()
        cand_inst = np.repeat(np.arange(len(instances), dtype=np.int32), counts)
        prim_row = (
            np.arange(n_cand, dtype=np.int32)
            - np.repeat(ends - counts, counts)
            + np.repeat(prim_base[inst_uid], counts)
        )
        inst8 = np.stack([s.to_array() for (_m, s) in instances]).astype(
            np.float32
        )
        cand8 = similarity_compose8(
            inst8[cand_inst], big("prim8")[prim_row]
        ).astype(np.float32)

        def cat(key):
            return big(key)[prim_row]

        cat_lod = cat  # LOD tables are pre-padded in _big_tables

        radii = cand8[:, 3] * cat("radius")
        centers = cand8[:, 0:3]

        # --- culling (batched across every candidate) ---
        visible_mask = np.ones(n_cand, bool)
        if cull_params:
            vis = np.zeros(n_cand, bool)
            for cp in cull_params:
                vis |= test_bounding_spheres(centers, radii, cp)
            visible_mask &= vis
        if sat is not None:
            view_m, frustum = sat
            idxs = np.where(visible_mask)[0]
            if len(idxs):
                keep = test_obbs_sat_exact(
                    cat("bbox_min")[idxs],
                    cat("bbox_max")[idxs],
                    cand8[idxs],
                    view_m,
                    frustum,
                )
                visible_mask[idxs] &= keep

        # --- LOD select (screen_coverage, batched; select_lod semantics) ---
        n_lods = cat("n_lods")
        lod = np.zeros(n_cand, np.int32)
        if (n_lods > 1).any():
            eye = np.asarray(uniforms.eye[0], np.float32)
            d = np.linalg.norm(centers - eye[None], axis=1)
            vr = radii / np.where(d <= 0.0, 1.0, d)
            aspect = 1920 / screen_height
            y = np.tan(np.radians(59.0) / 2.0)
            cov = np.where(
                d <= 0.0, np.inf, np.pi * vr * vr / (y * y * aspect)
            ).astype(np.float32)
            lod = (cat_lod("lod_cov") > cov[:, None]).sum(1).astype(np.int32)
            lod = np.minimum(lod, n_lods - 1)

        # --- palettes: register in instance order for visible animated ---
        inst_visible = np.zeros(len(instances), bool)
        inst_visible[np.unique(cand_inst[visible_mask])] = True
        palettes, inst_pal_offset = _register_palettes(
            instances, joint_palettes, inst_visible
        )

        # --- pack visible candidates into static/animated DrawLists ---
        animated = cat("animated")
        material = cat("material")
        lt_first = cat_lod("lod_first_tri")
        lt_count = cat_lod("lod_tri_count")
        lv_first = cat_lod("lod_first_vertex")
        lv_count = cat_lod("lod_vertex_count")
        lt_lm = cat_lod("lod_lightmapped")

        def compact(select):
            k = np.where(visible_mask & select)[0]
            lk = lod[k]
            return {
                "sim8": cand8[k],
                "first_tri": lt_first[k, lk],
                "tri_count": lt_count[k, lk],
                "first_vertex": lv_first[k, lk],
                "vertex_count": lv_count[k, lk],
                "material": material[k],
                "lightmapped": lt_lm[k, lk],
                "inst": cand_inst[k],
            }

        draws_static = _pack_compact(compact(~animated), inst_pal_offset, draw_cap)
        draws_animated = _pack_compact(compact(animated), inst_pal_offset, draw_cap)
    else:
        palettes = []
        draws_static = DrawRows().to_arrays(draw_cap)
        draws_animated = DrawRows().to_arrays(draw_cap)

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
        draws_static=draws_static,
        draws_animated=draws_animated,
        joint_palette=palette.astype(np.float32),
        lines=lines if lines is not None else pack_lines([], []),
        particles=particles if particles is not None else pack_particles(),
    )
