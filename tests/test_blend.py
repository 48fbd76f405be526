"""Alpha-clip and alpha-blend pass tests (reference raster path on CPU)."""

import numpy as np

from superconductor_tpu import (
    Camera,
    EnvBindings,
    RenderConfig,
    Scene,
    Similarity,
    make_uniforms,
    render_frame,
)
from superconductor_tpu.math3d import Similarity as Sim
from superconductor_tpu.render.draws import build_frame_state
from superconductor_tpu.scene.scene import (
    BLEND_ALPHA_BLENDED,
    BLEND_ALPHA_CLIPPED,
    MAT_UNLIT,
    MaterialSettings,
    Model,
    Primitive,
    PrimitiveLod,
    TEXFLAG_SRGB,
)


def quad_mesh():
    """Unit quad in the xy plane facing +z (CCW from +z)."""
    pos = np.array(
        [[-0.5, -0.5, 0], [0.5, -0.5, 0], [0.5, 0.5, 0], [-0.5, 0.5, 0]],
        np.float32,
    )
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    uv = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint32)
    return pos, nrm, uv, idx


def make_quad_model(scene, material, transform=None):
    pos, nrm, uv, idx = quad_mesh()
    first, count, fv, vc = scene.insert_static_mesh(
        pos, nrm, uv, np.zeros_like(uv), idx, material
    )
    prim = Primitive(
        material=material,
        blend_mode=scene.materials[material].blend_mode,
        double_sided=False,
        animated=False,
        lods=[PrimitiveLod(first_index=first, index_count=count, first_vertex=fv, vertex_count=vc)],
        bounding_sphere_radius=0.71,
        bbox_min=pos.min(0),
        bbox_max=pos.max(0),
    )
    prim.transform = transform or Sim.identity()
    m = Model(primitives=[prim])
    m.bounding_sphere_radius = 0.71
    return m


def checkerboard_alpha_texture(scene):
    """8x8 texture: left half alpha 0, right half alpha 255."""
    img = np.full((8, 8, 4), 255, np.uint8)
    img[:, :4, 3] = 0
    img[:, :4, :3] = 0
    # one mip level only (sharp alpha edge for the test)
    return scene.textures.add_texture([img], flags=TEXFLAG_SRGB)


def test_alpha_clip_discards_left_half():
    scene = Scene()
    tex = checkerboard_alpha_texture(scene)
    clip_mat = scene.add_material(
        MaterialSettings(
            base_color_factor=(0, 1, 0, 1),
            flags=MAT_UNLIT,
            blend_mode=BLEND_ALPHA_CLIPPED,
            albedo_tex=tex,
        )
    )
    model = make_quad_model(scene, clip_mat)
    camera = Camera(position=np.array([0, 0, 1.2], np.float32))
    uniforms = make_uniforms(camera, 64, 64)
    state = build_frame_state(scene, [(model, Similarity())], uniforms)
    config = RenderConfig(
        width=64, height=64, t_cap=32, t_cap_anim=8, raster="ref",
        enable_clip=True,
    )
    env = EnvBindings(clear_color=(0, 0, 1))
    img = np.asarray(render_frame(scene.device_arrays(), state, config, env))[0]
    # Right half of the quad visible (alpha=1, green-ish), left half
    # discarded (background blue).
    assert img[32, 44, 1] > 150  # right: green quad
    assert img[32, 20, 2] > 150 and img[32, 20, 1] < 100  # left: background


def test_alpha_blend_composites():
    scene = Scene()
    red = scene.add_material(
        MaterialSettings(
            base_color_factor=(1, 0, 0, 1), flags=MAT_UNLIT
        )
    )
    half_green = scene.add_material(
        MaterialSettings(
            base_color_factor=(0, 1, 0, 0.5),
            flags=MAT_UNLIT,
            blend_mode=BLEND_ALPHA_BLENDED,
        )
    )
    back = make_quad_model(scene, red)
    front = make_quad_model(scene, half_green)
    camera = Camera(position=np.array([0, 0, 2.0], np.float32))
    uniforms = make_uniforms(camera, 64, 64)
    state = build_frame_state(
        scene,
        [
            (back, Similarity(translation=[0, 0, -0.5], scale=2.0)),
            (front, Similarity()),
        ],
        uniforms,
    )
    config = RenderConfig(
        width=64, height=64, t_cap=64, t_cap_anim=8, raster="ref",
        enable_blend=True,
    )
    img = np.asarray(
        render_frame(scene.device_arrays(), state, config, EnvBindings())
    )[0]
    c = img[32, 32].astype(int)
    # 50/50 mix of unlit red (srgb 255,0,0) and unlit green (0,255,0):
    # blended in display space -> (127, 127, 0)-ish.
    assert abs(c[0] - 128) <= 6 and abs(c[1] - 128) <= 6 and c[2] < 10
    # outside the small quad but inside the big one (red spans cols
    # 10..54, green 18..46): pure red
    e = img[32, 14].astype(int)
    assert e[0] == 255 and e[1] < 10


def test_blend_layers_sorted():
    """Two stacked half-transparent quads must blend back-to-front."""
    scene = Scene()
    m1 = scene.add_material(
        MaterialSettings(
            base_color_factor=(1, 0, 0, 0.5), flags=MAT_UNLIT,
            blend_mode=BLEND_ALPHA_BLENDED,
        )
    )
    m2 = scene.add_material(
        MaterialSettings(
            base_color_factor=(0, 1, 0, 0.5), flags=MAT_UNLIT,
            blend_mode=BLEND_ALPHA_BLENDED,
        )
    )
    q1 = make_quad_model(scene, m1)  # red, farther
    q2 = make_quad_model(scene, m2)  # green, nearer
    camera = Camera(position=np.array([0, 0, 2.0], np.float32))
    uniforms = make_uniforms(camera, 48, 48)
    state = build_frame_state(
        scene,
        [
            (q1, Similarity(translation=[0, 0, -0.3])),
            (q2, Similarity(translation=[0, 0, 0.3])),
        ],
        uniforms,
    )
    config = RenderConfig(
        width=48, height=48, t_cap=64, t_cap_anim=8, raster="ref",
        enable_blend=True,
    )
    img = np.asarray(
        render_frame(scene.device_arrays(), state, config, EnvBindings())
    )[0]
    c = img[24, 24].astype(int)
    # over(green 0.5, over(red 0.5, black)) = 0.5*green + 0.25*red
    assert abs(c[1] - 128) <= 6
    assert abs(c[0] - 64) <= 6


def _render_stacked_quads(k_init, n_quads=6, shade_px_cap=1 << 17,
                          updates=1):
    """ECS render of n stacked half-transparent quads with blend_layers
    starting at k_init -> (image, final RenderConfig)."""
    from superconductor_tpu.ecs.app import App
    from superconductor_tpu.ecs.components import (
        Instance,
        InstanceOf,
        ModelComponent,
    )
    from superconductor_tpu.ecs.resources import (
        CameraResource,
        FrameOutput,
        RenderSettings,
        SceneResource,
    )
    from superconductor_tpu.ecs.systems import CorePlugin

    app = App()
    app.add_plugin(
        CorePlugin(
            config=RenderConfig(
                width=48, height=48, t_cap=64, t_cap_anim=8, raster="ref",
                blend_layers=k_init, shade_px_cap=shade_px_cap,
            )
        )
    )
    w = app.world
    scene = w.resource(SceneResource).scene
    colors = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0), (0, 1, 1), (1, 0, 1)]
    for i in range(n_quads):
        m = scene.add_material(
            MaterialSettings(
                base_color_factor=(*colors[i % len(colors)], 0.5),
                flags=MAT_UNLIT,
                blend_mode=BLEND_ALPHA_BLENDED,
            )
        )
        model = make_quad_model(scene, m)
        e = w.spawn(ModelComponent(model))
        w.spawn(
            Instance(Sim(translation=[0, 0, -0.5 + 0.15 * i])), InstanceOf(e)
        )
    w.resource(CameraResource).camera.position = np.array([0, 0, 2.0], np.float32)
    for _ in range(updates):
        app.update()
    return (
        np.asarray(w.resource(FrameOutput).image)[0],
        w.resource(RenderSettings).config,
    )


def test_blend_layers_grow_never_drop():
    """Six stacked half-transparent quads with blend_layers=4: the ECS must
    see layers_needed=6 in the frame stats, grow blend_layers, and re-render
    — producing the same image as a hand-set blend_layers=8 config, with no
    manual tuning (never-drop; the reference draws every blended fragment,
    rendering.rs:550)."""
    img_auto, cfg_auto = _render_stacked_quads(k_init=4)
    assert cfg_auto.blend_layers == 8, cfg_auto.blend_layers
    img_manual, cfg_manual = _render_stacked_quads(k_init=8)
    assert cfg_manual.blend_layers == 8  # no spurious growth when K suffices
    assert np.array_equal(img_auto, img_manual)
    # and the 6-layer composite really differs from the truncated one: the
    # farthest quad's red contribution must be present
    center = img_auto[24, 24].astype(int)
    assert center.sum() > 0


def test_shade_px_cap_grow_never_drop():
    """The transparent-shading worklist (shade_px_cap) must grow on overflow
    and re-render, never silently leave covered pixels unshaded. The stacked
    quads cover far more than 16 pixels; starting from shade_px_cap=16 the
    ECS must match a generous hand-set cap exactly."""
    img_auto, cfg_auto = _render_stacked_quads(k_init=8, shade_px_cap=16)
    assert cfg_auto.shade_px_cap > 16, cfg_auto.shade_px_cap
    img_manual, cfg_manual = _render_stacked_quads(k_init=8)
    assert cfg_manual.shade_px_cap == 1 << 17  # no spurious growth
    assert np.array_equal(img_auto, img_manual)


def _two_quads_inputs():
    """Two overlapping half-transparent quads -> (dev, state, base cfg kw)."""
    scene = Scene()
    m1 = scene.add_material(
        MaterialSettings(
            base_color_factor=(1, 0, 0, 0.5), flags=MAT_UNLIT,
            blend_mode=BLEND_ALPHA_BLENDED,
        )
    )
    m2 = scene.add_material(
        MaterialSettings(
            base_color_factor=(0, 1, 0, 0.5), flags=MAT_UNLIT,
            blend_mode=BLEND_ALPHA_BLENDED,
        )
    )
    q1 = make_quad_model(scene, m1)
    q2 = make_quad_model(scene, m2)
    camera = Camera(position=np.array([0, 0, 2.0], np.float32))
    uniforms = make_uniforms(camera, 48, 48)
    state = build_frame_state(
        scene,
        [
            (q1, Similarity(translation=[0, 0, -0.3])),
            (q2, Similarity(translation=[0, 0, 0.3], scale=0.5)),
        ],
        uniforms,
    )
    base = dict(width=48, height=48, t_cap=64, t_cap_anim=8, raster="ref",
                enable_blend=True)
    return scene.device_arrays(), state, base


def test_shade_px_caps_per_layer_exact():
    """Per-layer blend-shading worklists (RenderConfig.shade_px_caps) are
    pixel-exact vs the shared shade_px_cap path; the per-layer stat vector
    is monotone decreasing (layer occupancy is nested); and a deep-layer
    overflow is reported and recovered by growth — never-drop."""
    from superconductor_tpu.ecs.systems import _next_pow2
    from superconductor_tpu.render.frame import render_frame_stats

    dev, state, base = _two_quads_inputs()

    img_shared, st = render_frame_stats(
        dev, state, RenderConfig(**base), EnvBindings()
    )
    needed = [int(n) for n in np.asarray(st["shade_px_needed_k"])]
    assert needed[0] >= needed[1] > 0  # overlap region has 2 layers
    assert all(a >= b for a, b in zip(needed, needed[1:]))  # monotone
    assert int(st["shade_px_needed"]) == needed[0]

    caps = tuple(_next_pow2(n * 2) for n in needed)
    img_layers, st2 = render_frame_stats(
        dev, state, RenderConfig(shade_px_caps=caps, **base), EnvBindings()
    )
    assert np.array_equal(np.asarray(img_shared), np.asarray(img_layers))
    assert [int(n) for n in np.asarray(st2["shade_px_needed_k"])] == needed

    # overflow layer 1 (short tuple repeats its last entry): the stat still
    # reports the TRUE need, the image loses the overlap blend, and growing
    # exactly as the ECS does restores it bit-exactly
    small_cap = max(4, 1 << max(0, (needed[1] - 1).bit_length() - 1))
    assert small_cap < needed[1]
    img_of, st_of = render_frame_stats(
        dev, state,
        RenderConfig(shade_px_caps=(caps[0], small_cap), **base),
        EnvBindings(),
    )
    assert [int(n) for n in np.asarray(st_of["shade_px_needed_k"])] == needed
    assert not np.array_equal(np.asarray(img_shared), np.asarray(img_of))
    grown = tuple(_next_pow2(n * 2) for n in needed)
    img_g, _ = render_frame_stats(
        dev, state, RenderConfig(shade_px_caps=grown, **base), EnvBindings()
    )
    assert np.array_equal(np.asarray(img_shared), np.asarray(img_g))


def test_first_sighting_overflow_sizes_layers_from_needs():
    """When the FIRST stats sighting already overflows the shared
    shade_px_cap, the grow must size every layer from its own need —
    not floor at the old shared cap, which would lock all K layers at
    >= the shared size and permanently disable the tighten branch."""
    img, cfg = _render_stacked_quads(k_init=8, shade_px_cap=64)
    assert cfg.shade_px_caps is not None
    assert cfg.shade_px_caps[0] > 64  # layer 0 grew past the tiny cap
    # deep layers sized from their own (zero) needs, NOT >= layer 0's cap
    assert cfg.shade_px_caps[-1] == 512
    assert cfg.shade_px_caps[-1] < cfg.shade_px_caps[0]
    # never-drop: the recovered image matches an ample manual config
    img_manual, _ = _render_stacked_quads(k_init=8)
    assert np.array_equal(img, img_manual)


def test_ecs_tightens_per_layer_caps():
    """After a clean stats frame the ECS tightens shade_px_caps from the
    per-layer stat vector (pure perf, applied next frame); the tuned config
    renders pixel-identically and the tuple does not flap across frames."""
    img1, cfg1 = _render_stacked_quads(k_init=8)
    assert cfg1.shade_px_caps is not None
    assert list(cfg1.shade_px_caps) == sorted(cfg1.shade_px_caps, reverse=True)
    img2, cfg2 = _render_stacked_quads(k_init=8, updates=3)
    assert cfg2.shade_px_caps == cfg1.shade_px_caps  # stable, no flap
    assert np.array_equal(img1, img2)
