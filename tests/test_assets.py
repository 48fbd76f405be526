import numpy as np

from superconductor_tpu.assets.gltf import parse_gltf
from superconductor_tpu.assets.models import load_model
from superconductor_tpu.scene.scene import Scene


def test_parse_box_glb(box_glb):
    g = parse_gltf(box_glb)
    pos = g.accessor(0)
    assert pos.shape == (8, 3)
    idx = g.accessor_index(1)
    assert idx.shape == (36,)
    assert idx.max() == 7


def test_load_box_model(box_glb):
    scene = Scene()
    model = load_model(scene, box_glb, name="box")
    assert len(model.primitives) == 1
    prim = model.primitives[0]
    assert prim.lods[0].index_count == 36
    assert prim.bounding_sphere_radius > 0.8
    assert scene.positions.array.length == 8
    assert scene.indices.array.length == 36
    # unlit flag propagated
    mat = scene.materials[prim.material]
    assert mat.flags & 1


def test_load_sponza_cubes(sponza_cubes_glb):
    scene = Scene()
    model = load_model(scene, sponza_cubes_glb, name="sponza_cubes")
    assert len(model.primitives) == 1
    assert scene.indices.array.length > 0
    # double-sided material
    assert model.primitives[0].double_sided


def test_growable_and_range_alloc():
    from superconductor_tpu.scene.buffers import AllocatedArray, RangeAllocator

    ra = RangeAllocator(16)
    a = ra.allocate(8)
    b = ra.allocate(8)
    assert {a, b} == {0, 8}
    assert ra.allocate(1) is None
    ra.deallocate(a, 8)
    assert ra.allocate(4) == 0
    ra.grow(32)
    assert ra.allocate(16) == 16

    arr = AllocatedArray((3,), np.float32, 4)
    s1 = arr.insert(np.ones((3, 3), np.float32))
    s2 = arr.insert(np.full((5, 3), 2.0, np.float32))
    assert arr.capacity >= 8
    np.testing.assert_array_equal(arr.host[s1 : s1 + 3], 1.0)
    np.testing.assert_array_equal(arr.host[s2 : s2 + 5], 2.0)


def test_unload_model_frees_ranges(box_glb):
    from superconductor_tpu.assets.models import unload_model

    scene = Scene()
    m1 = load_model(scene, box_glb, name="a")
    used_after_one = scene.positions.alloc.used()
    m2 = load_model(scene, box_glb, name="b")
    assert scene.positions.alloc.used() == 2 * used_after_one
    unload_model(scene, m1)
    assert scene.positions.alloc.used() == used_after_one
    assert "a" not in scene.models and "b" in scene.models
    # freed space is reused by the next load
    m3 = load_model(scene, box_glb, name="c")
    assert scene.positions.alloc.used() == 2 * used_after_one


def test_decode_insert_split_matches_load_model():
    """decode_model (worker-thread half) + insert_model (frame-thread
    half) must produce the same scene state as the one-shot load_model —
    the async asset path's correctness contract (VERDICT r4 #6; the
    reference runs all of Model::load on its executor, models.rs:280)."""
    import os

    from superconductor_tpu.assets.models import decode_model, insert_model

    fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fixtures",
        "hero_helmet.glb",
    )
    with open(fixture, "rb") as f:
        data = f.read()

    s1 = Scene()
    m1 = load_model(s1, data, name="hero")

    # Decode off-scene (worker-safe: touches no Scene), insert separately.
    decoded = decode_model(data)
    assert decoded.textures and decoded.materials and decoded.primitives
    s2 = Scene()
    m2 = insert_model(s2, decoded, name="hero")

    assert len(m1.primitives) == len(m2.primitives)
    for p1, p2 in zip(m1.primitives, m2.primitives):
        assert p1.material == p2.material
        assert p1.blend_mode == p2.blend_mode
        assert len(p1.lods) == len(p2.lods)
        for l1, l2 in zip(p1.lods, p2.lods):
            assert (l1.first_index, l1.index_count, l1.first_vertex,
                    l1.vertex_count) == (
                l2.first_index, l2.index_count, l2.first_vertex,
                l2.vertex_count)
    assert m1.bounding_sphere_radius == m2.bounding_sphere_radius
    np.testing.assert_array_equal(s1.positions.host, s2.positions.host)
    np.testing.assert_array_equal(s1.indices.host, s2.indices.host)
    # Texture pools byte-identical (same chains, same placement).
    np.testing.assert_array_equal(
        s1.textures.texels.host, s2.textures.texels.host
    )
    # Material rows identical.
    d1, d2 = s1.device_arrays(), s2.device_arrays()
    for k in d1["materials"]:
        np.testing.assert_array_equal(
            np.asarray(d1["materials"][k]), np.asarray(d2["materials"][k]),
            err_msg=k,
        )
