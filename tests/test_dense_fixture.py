"""The committed dense_terrain.glb fixture: the full authored-asset path at
production scale — EXT_meshopt_compression decode, MSFT_lod chains with
screen-coverage selection, embedded PNG textures, normal mapping — the same
path demo/src/lib.rs:57-193 feeds the reference with Sponza (absent here).

tools/make_dense_fixture.py regenerates the file deterministically.
"""

import os

import numpy as np
import pytest

import superconductor_tpu as sc
from superconductor_tpu.assets.models import load_model
from superconductor_tpu.math3d import look_at, mat3_to_quat, mat4_inverse
from superconductor_tpu.render.culling import sphere_culling_params
from superconductor_tpu.render.draws import build_frame_state

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "dense_terrain.glb"
)


@pytest.fixture(scope="module")
def terrain_scene():
    scene = sc.Scene()
    model = load_model(scene, open(FIXTURE, "rb").read(), name="terrain")
    return scene, model


def test_fixture_lod_chain_and_textures(terrain_scene):
    scene, model = terrain_scene
    assert len(model.primitives) == 1
    p = model.primitives[0]
    tris = [l.index_count // 3 for l in p.lods]
    assert len(tris) == 3
    assert tris[0] > 100_000, tris  # dense LOD0
    assert tris[0] > 3 * tris[1] > 9 * tris[2], tris
    assert p.lod_coverages == [0.6, 0.2, 0.05]
    # albedo + normal textures bound (beyond the 3 dummies)
    mat = scene.materials[p.material]
    assert mat.albedo_tex >= 3 and mat.normal_tex >= 3
    # meshopt wire size well below raw (the compression actually engaged);
    # the GLB also carries ~0.6 MB of PNG textures on top of the mesh data
    raw_bytes = sum(
        (l.index_count * 4) + (l.vertex_count * 32) for l in p.lods
    )
    assert os.path.getsize(FIXTURE) < 0.75 * raw_bytes


def _aim(pos, target):
    cam = sc.Camera(position=np.asarray(pos, np.float32))
    cam.rotation = mat3_to_quat(
        mat4_inverse(look_at(cam.position, target))[:3, :3]
    )
    return cam


def test_fixture_lod_selection_by_distance(terrain_scene):
    scene, model = terrain_scene
    p = model.primitives[0]
    lod_tris = [l.index_count // 3 for l in p.lods]

    def tris_drawn(dist):
        cam = _aim([0, 2.0, dist], [0, 0, 0])
        uniforms = sc.make_uniforms(cam, 320, 180)
        state = build_frame_state(
            scene, [(model, sc.Similarity())], uniforms,
            cull_params=[sphere_culling_params(uniforms.view_proj[0])],
            screen_height=180,
        )
        v = np.asarray(state.draws_static.valid)
        return int(np.asarray(state.draws_static.tri_count)[v].sum())

    near, far = tris_drawn(6.0), tris_drawn(220.0)
    assert near == lod_tris[0], (near, lod_tris)  # close-up: full detail
    assert far in lod_tris[1:], (far, lod_tris)  # distant: a coarser LOD


def test_fixture_renders(terrain_scene):
    scene, model = terrain_scene
    # far enough that coverage picks the coarsest LOD: keeps the O(T*H*W)
    # ref raster tractable on CPU while still driving the textured path
    cam = _aim([0, 5.0, 15.0], [0, 0, 0])
    uniforms = sc.make_uniforms(cam, 160, 120, z_near=0.5)
    state = build_frame_state(
        scene, [(model, sc.Similarity())], uniforms,
        cull_params=[sphere_culling_params(uniforms.view_proj[0])],
        screen_height=120,
    )
    config = sc.RenderConfig(
        width=160, height=120, t_cap=1 << 13, raster="ref"
    )
    env = sc.EnvBindings(
        ambient_sh=(0.8, 0.8, 0.8, 0.1, 0.1, 0.1, 0.3, 0.3, 0.3, 0.05, 0.05,
                    0.05),
        clear_color=(0.0, 0.0, 0.2),
    )
    img = np.asarray(
        sc.render_frame(scene.device_arrays(), state, config, env)
    )[0]
    # corner pixel = clear color; the distant terrain still covers a
    # visible patch of the frame with non-background shading
    background = img[0, 0, :3].astype(int)
    hit = (np.abs(img[..., :3].astype(int) - background) > 12).any(-1)
    assert 0.03 < hit.mean() < 0.9, hit.mean()