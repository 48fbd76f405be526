"""Cross-validate the Pallas tile rasterizer (interpret mode on CPU)
against the brute-force reference rasterizer on identical setup data."""

import numpy as np
import pytest

import jax.numpy as jnp

from superconductor_tpu import Camera, Scene, Similarity, make_uniforms
from superconductor_tpu.assets.models import load_model
from superconductor_tpu.ops.binning import bin_triangles, gather_sorted_setup
from superconductor_tpu.ops.geometry import geometry_pass, make_draw_list
from superconductor_tpu.ops.raster_pallas import rasterize_pallas
from superconductor_tpu.ops.raster_ref import rasterize_ref


def _setup_box_scene(box_glb, width, height, rotate_y=0.6):
    from superconductor_tpu.math3d import quat_from_axis_angle

    scene = Scene()
    model = load_model(scene, box_glb, name="box")
    camera = Camera(position=np.array([0.6, 0.8, 2.0], np.float32))
    uniforms = make_uniforms(camera, width, height)
    sim = Similarity(rotation=quat_from_axis_angle([0, 1, 0], rotate_y))
    prim = model.primitives[0]
    lod = prim.lods[0]
    draws = make_draw_list(
        sim.to_array()[None],
        np.array([lod.first_index // 3]),
        np.array([lod.index_count // 3]),
        first_vertex=np.array([lod.first_vertex]),
        vertex_count=np.array([lod.vertex_count]),
        material=np.array([prim.material]),
    )
    dev = scene.device_arrays()
    tri, attrs = geometry_pass(
        draws,
        dev["indices"],
        dev["positions"],
        dev["normals"],
        dev["uvs"],
        dev["lightmap_uvs"],
        dev["tri_material"],
        dev["materials"],
        jnp.asarray(uniforms.view_proj[0]),
        width,
        height,
        t_cap=16,
    )
    return tri


@pytest.mark.parametrize("size", [(64, 128), (96, 256)])
def test_pallas_matches_ref(box_glb, size):
    height, width = size
    tri = _setup_box_scene(box_glb, width, height)

    vis_ref = rasterize_ref(tri, height, width)
    bins = bin_triangles(tri, width, height, p_cap=128)
    sorted_setup = gather_sorted_setup(tri, bins)
    vis_pal = rasterize_pallas(sorted_setup, bins, height, width, interpret=True)

    ref_pair = np.asarray(vis_ref.pair)
    pal_pair = np.asarray(vis_pal.pair)
    # identical coverage
    np.testing.assert_array_equal(ref_pair >= 0, pal_pair >= 0)
    # identical winners (box faces don't overlap in depth per pixel)
    np.testing.assert_array_equal(ref_pair, pal_pair)
    np.testing.assert_allclose(
        np.asarray(vis_ref.depth), np.asarray(vis_pal.depth), atol=1e-6
    )
    # sanity: box actually covered some pixels
    assert (ref_pair >= 0).mean() > 0.05


def test_binning_counts(box_glb):
    height, width = 64, 256
    tri = _setup_box_scene(box_glb, width, height)
    bins = bin_triangles(tri, width, height, p_cap=128)
    # every valid triangle appears at least once
    order = np.asarray(bins.order)
    valid_ids = set(np.where(np.asarray(tri.valid))[0].tolist())
    binned_ids = set(order[: int(bins.num_pairs)].tolist())
    assert valid_ids <= binned_ids | valid_ids  # no crash; and:
    assert valid_ids.issubset(set(order.tolist()))
    # tile ranges partition the real pairs
    assert int(np.asarray(bins.tile_count).sum()) == int(bins.num_pairs)
