import numpy as np
import pytest

from superconductor_tpu import (
    Camera,
    EnvBindings,
    RenderConfig,
    Scene,
    Similarity,
    make_uniforms,
    render_frame,
)
from superconductor_tpu.assets.models import load_model
from superconductor_tpu.math3d import quat_from_axis_angle
from superconductor_tpu.render.draws import build_frame_state


def render_box(box_glb, width=96, height=96, rotate=None, **cfg_kwargs):
    scene = Scene()
    model = load_model(scene, box_glb, name="box")
    camera = Camera(position=np.array([0.0, 0.0, 2.0], np.float32))
    uniforms = make_uniforms(camera, width, height)
    sim = Similarity()
    if rotate is not None:
        sim = Similarity(rotation=rotate)
    state = build_frame_state(scene, [(model, sim)], uniforms)
    config = RenderConfig(
        width=width, height=height, t_cap=64, t_cap_anim=8, raster="ref",
        **cfg_kwargs,
    )
    env = EnvBindings(clear_color=(0.0, 0.0, 1.0))
    img = np.asarray(render_frame(scene.device_arrays(), state, config, env))
    return img[0]


def test_box_unlit_render(box_glb):
    img = render_box(box_glb)
    h, w = img.shape[:2]
    center = img[h // 2, w // 2]
    # Unlit red-ish material, srgb-encoded: r = (1.0)^(1/2.2)*255=255,
    # g = 0.2^(1/2.2)*255 ~ 122, b = 0.1^(1/2.2)*255 ~ 89.
    assert center[0] == 255
    assert abs(int(center[1]) - 122) <= 3
    assert abs(int(center[2]) - 89) <= 3
    # Corner is background (clear color blue, tonemapped+srgb).
    corner = img[2, 2]
    assert corner[2] > 150 and corner[0] < 60
    # The box occupies a centered square: front face half-size 0.5 at
    # distance 1.5 with fov 60 -> ndc half-extent = 0.5/(1.5*tan30)/1 ~ 0.577
    frac = (img[..., 0] == 255).mean()
    assert 0.25 < frac < 0.45


def test_box_coverage_matches_analytic(box_glb):
    img = render_box(box_glb, width=128, height=128)
    # Face spans ndc +-0.577 -> pixel half-extent 0.577*64 = 36.9 px.
    xs = np.where(img[64, :, 0] == 255)[0]
    assert xs.min() == pytest.approx(64 - 37, abs=2)
    assert xs.max() == pytest.approx(64 + 37 - 1, abs=2)


def test_box_rotated_renders(box_glb):
    img = render_box(
        box_glb, rotate=quat_from_axis_angle([0, 1, 0], 0.7)
    )
    assert (img[..., 0] == 255).mean() > 0.2


def test_depth_ordering(box_glb):
    # Two boxes: small box in front of big box; front box must win.
    scene = Scene()
    model = load_model(scene, box_glb, name="box")
    # Second material: green unlit
    from superconductor_tpu.scene.scene import MaterialSettings, MAT_UNLIT

    green = scene.add_material(
        MaterialSettings(base_color_factor=(0.0, 1.0, 0.0, 1.0), flags=MAT_UNLIT)
    )
    # Clone primitive with green material by inserting the same mesh again.
    import copy

    prim = model.primitives[0]
    green_model = copy.deepcopy(model)
    # point the cloned primitive's triangles at the green material
    first_tri = prim.lods[0].first_index // 3
    ntris = prim.lods[0].index_count // 3
    # easier: new triangles with the green material
    pos = scene.positions.host[: scene.positions.array.length].copy()
    nrm = scene.normals.host[: scene.normals.array.length].copy()
    uv = scene.uvs.host[: scene.uvs.array.length].copy()
    idx = scene.indices.host[: scene.indices.array.length].copy()
    first, count, fv, vc = scene.insert_static_mesh(pos, nrm, uv, np.zeros_like(uv), idx - idx.min(), green)
    green_model.primitives[0].lods[0].first_index = first
    green_model.primitives[0].lods[0].index_count = count
    green_model.primitives[0].lods[0].first_vertex = fv
    green_model.primitives[0].lods[0].vertex_count = vc

    camera = Camera(position=np.array([0.0, 0.0, 3.0], np.float32))
    uniforms = make_uniforms(camera, 96, 96)
    state = build_frame_state(
        scene,
        [
            (model, Similarity(translation=[0, 0, -2.0], scale=2.0)),  # far, red
            (green_model, Similarity(translation=[0, 0, 0.0], scale=0.5)),  # near
        ],
        uniforms,
    )
    config = RenderConfig(width=96, height=96, t_cap=128, t_cap_anim=8, raster="ref")
    img = np.asarray(
        render_frame(scene.device_arrays(), state, config, EnvBindings())
    )[0]
    center = img[48, 48]
    assert center[1] == 255 and center[0] < 140  # green wins in front
    # Red box: half-size 1 at distance 5 -> ndc 0.346 -> +-16.6 px around 48.
    edge = img[48, 36]
    assert edge[0] == 255 and edge[1] < 140  # red big box behind
    # Outside both boxes: background.
    assert img[48, 10, 0] < 60


def test_frame_capacity_stats(box_glb):
    import jax.numpy as jnp

    from superconductor_tpu.render.frame import frame_capacity_stats
    from superconductor_tpu.utils.profiler import frame_capacity_report

    scene = Scene()
    model = load_model(scene, box_glb, name="box")
    camera = Camera(position=np.array([0, 0, 2.0], np.float32))
    uniforms = make_uniforms(camera, 64, 64)
    state = build_frame_state(scene, [(model, Similarity())], uniforms)
    config = RenderConfig(width=64, height=64, t_cap=8, t_cap_anim=8)
    ntri, npairs = frame_capacity_stats(scene.device_arrays(), state, config)
    # 12 triangles > t_cap 8: the report must flag it
    warnings = frame_capacity_report(state, int(ntri), int(npairs), config)
    assert warnings and "t_cap" in warnings[0]


def test_non_inline_tonemap_matches_inline_for_lit(box_glb):
    """inline vs deferred tonemapping agree for lit geometry (the unlit
    reference materials differ by design: the composite pass tonemaps them
    while the inline path does not)."""
    from superconductor_tpu.scene.scene import MaterialSettings

    scene = Scene()
    model = load_model(scene, box_glb, name="box")
    # make the material LIT (strip the unlit flag)
    scene.materials[model.primitives[0].material].flags = 0
    scene._materials_dirty = True
    camera = Camera(position=np.array([0, 0, 2.0], np.float32))
    uniforms = make_uniforms(camera, 48, 48)
    state = build_frame_state(scene, [(model, Similarity())], uniforms)
    from superconductor_tpu.utils.procgen import default_ambient_sh

    env = EnvBindings(ambient_sh=default_ambient_sh())
    imgs = {}
    for inline in (True, False):
        config = RenderConfig(
            width=48, height=48, t_cap=32, t_cap_anim=8, raster="ref",
            inline_tonemapping=inline, inline_srgb=inline,
        )
        imgs[inline] = np.asarray(
            render_frame(scene.device_arrays(), state, config, env)
        )[0].astype(int)
    diff = np.abs(imgs[True] - imgs[False])
    assert diff.max() <= 1  # rounding only


def test_texture_gallery_renders():
    import os

    import pytest

    from superconductor_tpu.utils.gallery import SPONZA_TEX_DIR, build_gallery

    if not os.path.isdir(SPONZA_TEX_DIR):
        pytest.skip("reference assets unavailable")
    scene = Scene()
    model = build_gallery(scene, tex_limit=4)
    assert len(model.primitives) == 4
    # box 0 sits at (6, 0, 0); park the camera right in front of it
    camera = Camera(position=np.array([4.2, 0.2, 0], np.float32))
    from superconductor_tpu.math3d import look_at, mat3_to_quat, mat4_inverse

    v = look_at(camera.position, [6, 0, 0])
    camera.rotation = mat3_to_quat(mat4_inverse(v)[:3, :3])
    uniforms = make_uniforms(camera, 64, 64)
    state = build_frame_state(scene, [(model, Similarity())], uniforms)
    config = RenderConfig(width=64, height=64, t_cap=256, t_cap_anim=8, raster="ref")
    from superconductor_tpu.utils.procgen import default_ambient_sh

    env = EnvBindings(ambient_sh=default_ambient_sh())
    img = np.asarray(render_frame(scene.device_arrays(), state, config, env))[0]
    assert img[..., :3].std() > 3  # textured boxes visible


def test_double_sided_backface_renders_and_flips_normal():
    """A single-sided quad vanishes from behind; a double-sided one renders
    with the normal flipped toward the viewer (glTF spec behavior,
    calculate_normal's front_facing flip)."""
    import sys

    sys.path.insert(0, "tests")
    from test_blend import make_quad_model

    from superconductor_tpu.scene.scene import MAT_DOUBLE_SIDED, MaterialSettings
    from superconductor_tpu.utils.procgen import default_ambient_sh

    for double_sided, expect_visible in ((False, False), (True, True)):
        scene = Scene()
        flags = MAT_DOUBLE_SIDED if double_sided else 0
        mat = scene.add_material(
            MaterialSettings(
                base_color_factor=(1, 0, 0, 1), metallic_factor=0.0, flags=flags
            )
        )
        model = make_quad_model(scene, mat)
        # camera BEHIND the quad (quad faces +z, camera at -z)
        camera = Camera(position=np.array([0, 0, -1.5], np.float32))
        from superconductor_tpu.math3d import quat_from_axis_angle

        camera.rotation = quat_from_axis_angle([0, 1, 0], np.pi)
        uniforms = make_uniforms(camera, 48, 48)
        state = build_frame_state(scene, [(model, Similarity())], uniforms)
        config = RenderConfig(width=48, height=48, t_cap=16, t_cap_anim=8, raster="ref")
        env = EnvBindings(ambient_sh=default_ambient_sh())
        img = np.asarray(render_frame(scene.device_arrays(), state, config, env))[0]
        # sample off the quad's diagonal (exact e=0 knife-edge pixels can
        # round out under different fma orderings; see docs/KERNELS.md)
        visible = img[24, 18, 0] > 30
        assert visible == expect_visible, (double_sided, img[24, 18])


def test_khr_texture_transform_tiles_uv():
    """uv_scale=2 with REPEAT wrap tiles the texture twice across the quad
    (KHR_texture_transform in the vertex stage + repeat wrap in sampling)."""
    import sys

    sys.path.insert(0, "tests")
    from test_blend import make_quad_model

    from superconductor_tpu.scene.scene import (
        MAT_UNLIT,
        MaterialSettings,
        TEXFLAG_SRGB,
    )

    scene = Scene()
    # 2x1 texture: left black, right white, one mip
    tex_img = np.zeros((1, 2, 4), np.uint8)
    tex_img[0, 1] = 255
    tex_img[..., 3] = 255
    tex = scene.textures.add_texture([tex_img], flags=TEXFLAG_SRGB)

    for scale, expected_stripes in ((1.0, 2), (2.0, 4)):
        mat = scene.add_material(
            MaterialSettings(
                albedo_tex=tex, flags=MAT_UNLIT, uv_scale=(scale, scale)
            )
        )
        model = make_quad_model(scene, mat)
        camera = Camera(position=np.array([0, 0, 1.2], np.float32))
        uniforms = make_uniforms(camera, 64, 64)
        state = build_frame_state(scene, [(model, Similarity())], uniforms)
        config = RenderConfig(
            width=64, height=64, t_cap=64, t_cap_anim=8, raster="ref"
        )
        img = np.asarray(
            render_frame(scene.device_arrays(), state, config, EnvBindings())
        )[0]
        row = img[32, :, 0].astype(float)
        # quad spans ~cols 9..55; trim the wrap-blended edges and compare
        # stripe means: scale 1 -> [dark, bright]; scale 2 -> [d, b, d, b]
        quad = row[11:53]
        stripes = np.array_split(quad, expected_stripes)
        means = [float(s2.mean()) for s2 in stripes]
        for k in range(len(means) - 1):
            if k % 2 == 0:
                assert means[k] < means[k + 1] - 40, (scale, means)
            else:
                assert means[k] > means[k + 1] + 40, (scale, means)


def test_material_textures_use_own_lod():
    """Each material texture's mip LOD comes from its OWN dimensions: at
    the same uv footprint, a 4x4 texture samples mip 0 while a 16x16 one
    samples mip ~2 (round-1 gap: normal/MR/emissive shared the albedo's
    LOD and only albedo was anisotropic)."""
    import jax.numpy as jnp
    import numpy as np

    from superconductor_tpu.ops.texture import sample_anisotropic
    from superconductor_tpu.scene.scene import Scene, build_mip_chain

    scene = Scene()

    def chain(size, colors):
        # distinct solid color per mip level
        levels = build_mip_chain(np.zeros((size, size, 4), np.uint8))
        return [
            np.full_like(lvl, colors[i]) for i, lvl in enumerate(levels)
        ]

    small = scene.textures.add_texture(chain(4, [10, 50, 90]))
    big = scene.textures.add_texture(chain(16, [10, 50, 90, 130, 170]))
    dev = scene.device_arrays()

    uv = jnp.array([[0.5, 0.5]])
    # footprint: one texel of the 4x4 per pixel -> lod 0 for 4x4, lod 2
    # for 16x16
    duv = jnp.array([[0.25, 0.0]])
    dzero = jnp.zeros((1, 2))
    s_small = sample_anisotropic(
        dev["texels"], dev["tex"], jnp.array([small]), uv, duv, dzero, 1,
        decode_srgb=False,
    )
    s_big = sample_anisotropic(
        dev["texels"], dev["tex"], jnp.array([big]), uv, duv, dzero, 1,
        decode_srgb=False,
    )
    assert abs(float(s_small[0, 0]) * 255 - 10) < 2, s_small
    assert abs(float(s_big[0, 0]) * 255 - 90) < 25, s_big


def _pbr_sphere_frame_inputs(width=160, height=120):
    from superconductor_tpu.utils.procgen import (
        add_pbr_sphere,
        default_ambient_sh,
    )

    scene = Scene()
    model = add_pbr_sphere(scene, stacks=24, slices=24)
    camera = Camera(position=np.array([0.0, 0.25, 2.3], np.float32))
    uniforms = make_uniforms(camera, width, height)
    state = build_frame_state(scene, [(model, Similarity())], uniforms)
    env = EnvBindings(
        ambient_sh=default_ambient_sh(), clear_color=(0.1, 0.12, 0.25)
    )
    return scene.device_arrays(), state, env


def test_opaque_compact_matches_fullscreen():
    """Compacted opaque shading (RenderConfig.opaque_px_cap worklist,
    render_view) is pixel-exact vs the full-screen shade: the same
    per-lane material/lighting math runs, just gathered to covered pixels
    and scattered back over the skybox base."""
    from superconductor_tpu.render.frame import render_frame_stats

    dev, state, env = _pbr_sphere_frame_inputs()
    base = dict(width=160, height=120, t_cap=2048, t_cap_anim=8, raster="ref")

    img_full, st_full = render_frame_stats(
        dev, state, RenderConfig(opaque_px_cap=0, **base), env
    )
    # the full-screen path (cap 0, or statically when cap >= band pixels)
    # reports true coverage too, so a host can size the cap from one
    # full-screen stats frame; nothing is droppable on that path
    img_big, st_big = render_frame_stats(
        dev, state, RenderConfig(opaque_px_cap=1 << 20, **base), env
    )
    assert np.array_equal(np.asarray(img_full), np.asarray(img_big))

    # compact path: sphere covers ~33% of 160x120 -> 8192 lanes suffice
    img_c, st_c = render_frame_stats(
        dev, state, RenderConfig(opaque_px_cap=8192, **base), env
    )
    covered = int(st_c["opaque_px_needed"])
    assert 0 < covered <= 8192
    # all three paths agree on the coverage count
    assert int(st_full["opaque_px_needed"]) == covered
    assert int(st_big["opaque_px_needed"]) == covered
    assert np.array_equal(np.asarray(img_full), np.asarray(img_c))


def test_opaque_granule_compact_matches_fullscreen():
    """Granule-compacted opaque shading (OPAQUE_GRANULE=128 row-granules,
    used when width % 128 == 0) is pixel-exact vs both the full-screen
    shade and the per-pixel compacted path, and the coverage stat reports
    the granule-DILATED pixel count consistently on the full-screen and
    granule paths (so a host sizes the cap for the path it will select)."""
    from superconductor_tpu.render.frame import render_frame_stats

    dev, state, env = _pbr_sphere_frame_inputs()
    # width divisible by the granule -> granule path active when compacted
    base = dict(width=256, height=96, t_cap=2048, t_cap_anim=8, raster="ref")

    img_full, st_full = render_frame_stats(
        dev, state, RenderConfig(opaque_px_cap=0, **base), env
    )
    dilated = int(st_full["opaque_px_needed"])
    assert dilated % 128 == 0 and 0 < dilated < 256 * 96

    img_g, st_g = render_frame_stats(
        dev, state, RenderConfig(opaque_px_cap=dilated, **base), env
    )
    assert int(st_g["opaque_px_needed"]) == dilated
    assert np.array_equal(np.asarray(img_full), np.asarray(img_g))

    # per-pixel path (opaque_granules=False): also exact, smaller stat
    img_p, st_p = render_frame_stats(
        dev,
        state,
        RenderConfig(opaque_px_cap=dilated, worklist_granules=False, **base),
        env,
    )
    assert 0 < int(st_p["opaque_px_needed"]) <= dilated
    assert np.array_equal(np.asarray(img_full), np.asarray(img_p))

    # overflow: a cap below the dilated need drops granules (image differs)
    # and reports the same dilated need — the host's grow signal
    img_of, st_of = render_frame_stats(
        dev, state, RenderConfig(opaque_px_cap=dilated // 4, **base), env
    )
    assert int(st_of["opaque_px_needed"]) == dilated
    assert not np.array_equal(np.asarray(img_full), np.asarray(img_of))


def test_opaque_compact_overflow_grows_and_recovers():
    """When coverage exceeds opaque_px_cap the stat exceeds the cap (the
    host's grow-and-re-render signal) and growing the cap exactly as the
    ECS render system does restores the full image — never-drop."""
    from superconductor_tpu.ecs.systems import _next_pow2
    from superconductor_tpu.render.frame import render_frame_stats

    dev, state, env = _pbr_sphere_frame_inputs()
    base = dict(width=160, height=120, t_cap=2048, t_cap_anim=8, raster="ref")

    img_full, _ = render_frame_stats(
        dev, state, RenderConfig(opaque_px_cap=0, **base), env
    )
    img_of, st_of = render_frame_stats(
        dev, state, RenderConfig(opaque_px_cap=2048, **base), env
    )
    needed = int(st_of["opaque_px_needed"])
    assert needed > 2048  # overflow reported
    assert not np.array_equal(np.asarray(img_full), np.asarray(img_of))

    grown = _next_pow2(needed * 2)
    img_g, st_g = render_frame_stats(
        dev, state, RenderConfig(opaque_px_cap=grown, **base), env
    )
    assert int(st_g["opaque_px_needed"]) == needed
    assert np.array_equal(np.asarray(img_full), np.asarray(img_g))


def test_layer_caps_variants():
    """RenderConfig.layer_caps(): None and empty fall back to the shared
    cap; short tuples repeat their last entry; long tuples truncate."""
    base = dict(blend_layers=4, shade_px_cap=1 << 10)
    assert RenderConfig(**base).layer_caps() == (1 << 10,) * 4
    assert RenderConfig(shade_px_caps=(), **base).layer_caps() == (1 << 10,) * 4
    assert RenderConfig(shade_px_caps=(64, 16), **base).layer_caps() == (
        64, 16, 16, 16,
    )
    assert RenderConfig(
        shade_px_caps=(64, 32, 16, 8, 4), **base
    ).layer_caps() == (64, 32, 16, 8)


def test_stats_to_host_shapes():
    """stats_to_host: scalars -> int, vectors/lists -> list of int, and it
    is idempotent on already-converted dicts."""
    import jax.numpy as jnp

    from superconductor_tpu.render.frame import stats_to_host

    dev_stats = {
        "pairs_needed": jnp.int32(7),
        "shade_px_needed_k": jnp.array([4, 2, 0], jnp.int32),
    }
    host = stats_to_host(dev_stats)
    assert host == {"pairs_needed": 7, "shade_px_needed_k": [4, 2, 0]}
    assert stats_to_host(host) == host


def _cubemap_sphere_frame_inputs(width=256, height=96):
    """PBR sphere against a real gradient cubemap (the sky-worklist paths
    must be exercised with an actual cubemap gather, not clear_color)."""
    from superconductor_tpu.utils.procgen import (
        add_pbr_sphere,
        default_ambient_sh,
        gradient_cubemap,
    )

    scene = Scene()
    model = add_pbr_sphere(scene, stacks=24, slices=24)
    base = gradient_cubemap(scene, size=16)
    camera = Camera(position=np.array([0.0, 0.25, 2.3], np.float32))
    uniforms = make_uniforms(camera, width, height)
    state = build_frame_state(scene, [(model, Similarity())], uniforms)
    env = EnvBindings.from_scene(
        scene, ambient_sh=default_ambient_sh(), ibl_cubemap_base=base
    )
    return scene.device_arrays(), state, env


def test_sky_worklist_matches_fullscreen():
    """The sky worklist (RenderConfig.sky_px_cap) evaluates the skybox
    only on uncovered pixels; the image must be pixel-exact vs the
    full-screen sky, and the sky_px_needed stat must agree between the
    two paths so a host can size the cap from one full-screen frame."""
    from superconductor_tpu.render.frame import render_frame_stats

    dev, state, env = _cubemap_sphere_frame_inputs()
    # granule 32: the sphere interior fully covers some 32-px granules,
    # so the worklist is a strict subset of the screen
    base = dict(width=256, height=96, t_cap=2048, t_cap_anim=8, raster="ref",
                opaque_px_cap=12288, granule_px=32)

    img_full, st_full = render_frame_stats(
        dev, state, RenderConfig(**base), env
    )
    need = int(st_full["sky_px_needed"])
    npx = 256 * 96
    assert 0 < need < npx and need % 32 == 0

    img_wl, st_wl = render_frame_stats(
        dev, state, RenderConfig(sky_px_cap=need, **base), env
    )
    assert int(st_wl["sky_px_needed"]) == need
    assert np.array_equal(np.asarray(img_full), np.asarray(img_wl))

    # per-pixel worklists: also exact, stat counts true miss pixels
    img_p, st_p = render_frame_stats(
        dev, state,
        RenderConfig(sky_px_cap=need, worklist_granules=False, **base), env
    )
    assert 0 < int(st_p["sky_px_needed"]) <= need
    assert np.array_equal(np.asarray(img_full), np.asarray(img_p))

    # overflow: a cap below the need blackens dropped sky pixels (the
    # grow signal fires; never silently wrong-but-plausible)
    img_of, st_of = render_frame_stats(
        dev, state, RenderConfig(sky_px_cap=need // 4, **base), env
    )
    assert int(st_of["sky_px_needed"]) == need
    assert not np.array_equal(np.asarray(img_full), np.asarray(img_of))


def test_shade_row_pad_bit_exact():
    """RenderConfig.shade_row_pad only changes the gather layout (aligned
    512 B rows, pad sliced off post-gather) — bit-identical images."""
    dev, state, env = _pbr_sphere_frame_inputs()
    base = dict(width=160, height=120, t_cap=2048, t_cap_anim=8,
                raster="ref", opaque_px_cap=8192)
    img0 = np.asarray(
        render_frame(dev, state, RenderConfig(**base), env)
    )
    img128 = np.asarray(
        render_frame(dev, state, RenderConfig(shade_row_pad=128, **base), env)
    )
    assert np.array_equal(img0, img128)
