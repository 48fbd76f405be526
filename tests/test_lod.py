"""MSFT_lod chains + screen-coverage selection, end to end."""

import json
import struct

import numpy as np

from superconductor_tpu import Camera, Scene, Similarity, make_uniforms
from superconductor_tpu.assets.models import load_model
from superconductor_tpu.render.draws import build_frame_state
from superconductor_tpu.render.lod import select_lod


def make_lod_glb():
    """Node 0: high-detail quad mesh + MSFT_lod -> node 1 (low-detail tri).

    Mirrors the reference's LOD layout: the LOD node is listed in
    extensions.MSFT_lod.ids and must be ignored as a top-level mesh
    (models.rs:304-338); screencoverage thresholds in extras.
    """
    hi = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
    )
    hi_idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    lo = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    lo_idx = np.array([0, 1, 2], np.uint16)
    blob = hi.tobytes() + hi_idx.tobytes() + lo.tobytes() + lo_idx.tobytes()
    o1 = 0
    o2 = o1 + hi.nbytes
    o3 = o2 + hi_idx.nbytes
    o4 = o3 + lo.nbytes
    doc = {
        "asset": {"version": "2.0"},
        "nodes": [
            {
                "mesh": 0,
                "extensions": {"MSFT_lod": {"ids": [1]}},
                "extras": {"MSFT_screencoverage": [0.5, 0.0]},
            },
            {"mesh": 1},
        ],
        "meshes": [
            {"primitives": [{"attributes": {"POSITION": 0}, "indices": 1}]},
            {"primitives": [{"attributes": {"POSITION": 2}, "indices": 3}]},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3",
             "min": hi.min(0).tolist(), "max": hi.max(0).tolist()},
            {"bufferView": 1, "componentType": 5123, "count": 6, "type": "SCALAR"},
            {"bufferView": 2, "componentType": 5126, "count": 3, "type": "VEC3",
             "min": lo.min(0).tolist(), "max": lo.max(0).tolist()},
            {"bufferView": 3, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": o1, "byteLength": hi.nbytes},
            {"buffer": 0, "byteOffset": o2, "byteLength": hi_idx.nbytes},
            {"buffer": 0, "byteOffset": o3, "byteLength": lo.nbytes},
            {"buffer": 0, "byteOffset": o4, "byteLength": lo_idx.nbytes},
        ],
        "buffers": [{"byteLength": len(blob)}],
    }
    j = json.dumps(doc).encode()
    j += b" " * (-len(j) % 4)
    blob += b"\0" * (-len(blob) % 4)
    out = struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(j) + 8 + len(blob))
    out += struct.pack("<II", len(j), 0x4E4F534A) + j
    out += struct.pack("<II", len(blob), 0x004E4942) + blob
    return out


def test_lod_chain_loads_and_selects():
    scene = Scene()
    model = load_model(scene, make_lod_glb(), name="lod")
    # LOD node must NOT appear as its own primitive
    assert len(model.primitives) == 1
    prim = model.primitives[0]
    assert len(prim.lods) == 2
    assert prim.lods[0].index_count == 6  # high detail
    assert prim.lods[1].index_count == 3  # low detail
    assert prim.lod_coverages == [0.5, 0.0]

    # close camera -> big coverage -> LOD 0; far -> LOD 1
    near = select_lod(prim, Similarity(), np.array([0, 0, 2.0]), 1080)
    far = select_lod(prim, Similarity(), np.array([0, 0, 100.0]), 1080)
    assert near == 0
    assert far == 1


def test_lod_selection_feeds_draws():
    scene = Scene()
    model = load_model(scene, make_lod_glb(), name="lod")
    cam_far = Camera(position=np.array([0, 0, 100.0], np.float32))
    uniforms = make_uniforms(cam_far, 64, 64)
    state = build_frame_state(scene, [(model, Similarity())], uniforms)
    # far away: the 1-triangle LOD is drawn
    assert int(np.asarray(state.draws_static.tri_count)[0]) == 1


def _drawlist_tuple(state):
    d = state.draws_static
    return tuple(
        np.asarray(getattr(d, f)).tobytes()
        for f in ("sim8", "first_tri", "tri_count", "first_vertex",
                  "vertex_count", "joints_offset", "material",
                  "lightmapped", "valid")
    )


def test_big_table_cache_consistency():
    """The cached cross-model tables (draws._big_tables) must give results
    identical to a cold rebuild for every model subset/order, including
    mixed LOD-chain depths (the padded-table path)."""
    import superconductor_tpu.render.draws as D
    from superconductor_tpu.utils.procgen import add_pbr_sphere

    scene = Scene()
    lod_model = load_model(scene, make_lod_glb(), name="lod")  # 2 LODs
    sphere = add_pbr_sphere(scene, stacks=4, slices=4)  # 1 LOD
    cam = Camera(position=np.array([0, 0, 6.0], np.float32))
    uniforms = make_uniforms(cam, 64, 64)

    combos = [
        [(lod_model, Similarity())],
        [(sphere, Similarity())],
        [(lod_model, Similarity()), (sphere, Similarity([2, 0, 0]))],
        [(sphere, Similarity([2, 0, 0])), (lod_model, Similarity())],
        [(sphere, Similarity()), (sphere, Similarity([1, 0, 0])),
         (lod_model, Similarity([-2, 0, 0]))],
    ]
    warm = []
    for insts in combos:
        build_frame_state(scene, insts, uniforms)  # populate caches
        warm.append(_drawlist_tuple(build_frame_state(scene, insts, uniforms)))
    for insts, w in zip(combos, warm):
        D._BIG_TABLE_CACHE.clear()
        for m in (lod_model, sphere):
            m.invalidate_frame_cache()
        cold = _drawlist_tuple(build_frame_state(scene, insts, uniforms))
        assert cold == w
