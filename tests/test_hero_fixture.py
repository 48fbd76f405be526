"""The committed hero_helmet.glb fixture — the DamagedHelmet-class headline
asset (BASELINE config 2). It exercises the FULL authored-asset path in one
file: GLB parse, EXT_meshopt_compression vertex+index decode, MSFT_lod
chains, KHR_texture_basisu KTX2 (BasisLZ/ETC1S through the native
transcoder) plus an uncompressed-RGBA8 KTX2 normal map, TWO PBR materials
(riveted shell + emissive-visor faceplate with
KHR_materials_emissive_strength) — the same path the reference feeds with
DamagedHelmet/Sponza (demo/src/lib.rs:57-193, models.rs,
textures.rs:929-1097).

tools/make_hero_fixture.py regenerates the file deterministically; bench.py
renders it as the headline scene.
"""

import os
import sys

import numpy as np
import pytest

import superconductor_tpu as sc
from superconductor_tpu.assets.models import load_model
from superconductor_tpu.math3d import look_at, mat3_to_quat, mat4_inverse
from superconductor_tpu.render.culling import sphere_culling_params
from superconductor_tpu.render.draws import build_frame_state

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "hero_helmet.glb"
)


@pytest.fixture(scope="module")
def hero_scene():
    scene = sc.Scene()
    model = load_model(scene, open(FIXTURE, "rb").read(), name="hero_helmet")
    return scene, model


def test_two_materials_and_lod_chains(hero_scene):
    scene, model = hero_scene
    # shell + faceplate, each with a 3-level MSFT_lod chain
    assert len(model.primitives) == 2
    mats = sorted(p.material for p in model.primitives)
    assert mats[0] != mats[1]
    lod0_total = 0
    for p in model.primitives:
        assert len(p.lods) == 3
        assert p.lod_coverages == [0.5, 0.15, 0.03]
        tris = [l.index_count // 3 for l in p.lods]
        assert tris[0] > 3 * tris[1] > 9 * tris[2], tris
        lod0_total += tris[0]
    # DamagedHelmet-class density at LOD0 (the helmet: 15,452)
    assert 14_000 < lod0_total < 18_000, lod0_total


def test_textures_and_emissive_bindings(hero_scene):
    scene, model = hero_scene
    by_mat = {p.material: p for p in model.primitives}
    shell, faceplate = None, None
    for mid in by_mat:
        m = scene.materials[mid]
        if m.emissive_factor != (0.0, 0.0, 0.0):
            faceplate = m
        else:
            shell = m
    assert shell is not None and faceplate is not None
    # all maps bound beyond the dummy slots (ETC1S albedo/mr decoded by the
    # native transcoder; RGBA8 KTX2 normal map)
    for m in (shell, faceplate):
        assert m.albedo_tex >= 3
        assert m.normal_tex >= 3
        assert m.metallic_roughness_tex >= 3
    # KHR_materials_emissive_strength folded into the factor (4.0)
    assert faceplate.emissive_factor == (4.0, 4.0, 4.0)
    assert faceplate.emissive_tex >= 3
    # 512^2 albedo with a full mip chain landed in the LDR pool
    assert scene.textures.tex_mip_count[shell.albedo_tex] == 10


def _aim(pos, target):
    cam = sc.Camera(position=np.asarray(pos, np.float32))
    cam.rotation = mat3_to_quat(
        mat4_inverse(look_at(cam.position, target))[:3, :3]
    )
    return cam


def _state(scene, model, dist, w=160, h=120):
    cam = _aim([0, 0.25, dist], [0, 0, 0])
    uniforms = sc.make_uniforms(cam, w, h, z_near=0.5)
    state = build_frame_state(
        scene, [(model, sc.Similarity())], uniforms,
        cull_params=[sphere_culling_params(uniforms.view_proj[0])],
        screen_height=h,
    )
    return state, uniforms


def test_lod_selection_by_distance(hero_scene):
    scene, model = hero_scene
    lod_tris = [
        sum(p.lods[i].index_count // 3 for p in model.primitives)
        for i in range(3)
    ]

    def tris_drawn(dist):
        state, _ = _state(scene, model, dist)
        v = np.asarray(state.draws_static.valid)
        return int(np.asarray(state.draws_static.tri_count)[v].sum())

    near, far = tris_drawn(1.2), tris_drawn(12.0)
    assert near == lod_tris[0], (near, lod_tris)  # close-up: full detail
    assert far in lod_tris[1:], (far, lod_tris)  # distant: a coarser LOD


def test_renders_with_visor_glow(hero_scene):
    scene, model = hero_scene
    # far enough that coverage picks a coarse LOD (keeps the O(T*H*W) ref
    # raster tractable on CPU) while the emissive visor still spans pixels
    state, _ = _state(scene, model, 3.5)
    config = sc.RenderConfig(width=160, height=120, t_cap=1 << 13,
                             raster="ref")
    env = sc.EnvBindings(
        ambient_sh=(0.8, 0.8, 0.8, 0.1, 0.1, 0.1, 0.3, 0.3, 0.3,
                    0.05, 0.05, 0.05),
        clear_color=(0.0, 0.0, 0.2),
    )
    img = np.asarray(
        sc.render_frame(scene.device_arrays(), state, config, env)
    )[0]
    background = img[0, 0, :3].astype(int)
    hit = (np.abs(img[..., :3].astype(int) - background) > 12).any(-1)
    assert 0.08 < hit.mean() < 0.9, hit.mean()
    # the emissive visor stripe (strength-4 red-orange) survives tonemapping
    # as saturated red pixels — proof the faceplate material, its emissive
    # texture, and the UV band all line up facing the camera
    r = img[..., 0].astype(int)
    g = img[..., 1].astype(int)
    b = img[..., 2].astype(int)
    glow = (r > 150) & (r > g + 30) & (g >= b)
    assert int(glow.sum()) > 50, int(glow.sum())


def test_generator_is_deterministic(tmp_path):
    """tools/make_hero_fixture.py reproduces the committed bytes exactly."""
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools"),
    )
    try:
        import make_hero_fixture
    finally:
        sys.path.pop(0)
    out = tmp_path / "hero_regen.glb"
    make_hero_fixture.main(str(out))
    assert out.read_bytes() == open(FIXTURE, "rb").read()
