"""Per-pass k-buffer depths (RenderConfig.clip_layers / particle_layers).

Each transparent pass sees different worst-case overlap — a deep smoke
stack must not make the clip/blend kernels pay its K (K VMEM planes,
K-step insert chain, K resolve iterations). The split keeps the shared
never-drop contract: per-pass layers_needed stats, per-pass growth, and
a first-clean-frame tighten in the ECS render system.
"""

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
)

from test_blend import make_quad_model


def _mixed_scene(n_blend=6, n_clip=2):
    """n_blend stacked half-transparent quads + n_clip stacked opaque-ish
    clip quads (alpha 1.0 > cutoff so they resolve), distinct depths."""
    scene = Scene()
    dev_models = []
    for i in range(n_blend):
        m = scene.add_material(
            MaterialSettings(
                base_color_factor=(1, 0, 0, 0.5), flags=MAT_UNLIT,
                blend_mode=BLEND_ALPHA_BLENDED,
            )
        )
        dev_models.append(
            (make_quad_model(scene, m), Sim(translation=[0, 0, -0.5 + 0.1 * i]))
        )
    for i in range(n_clip):
        m = scene.add_material(
            MaterialSettings(
                base_color_factor=(0, 1, 0, 1.0), flags=MAT_UNLIT,
                blend_mode=BLEND_ALPHA_CLIPPED,
            )
        )
        dev_models.append(
            (make_quad_model(scene, m),
             Sim(translation=[0.55, 0.55, 0.3 + 0.1 * i]))
        )
    cam = Camera(position=np.array([0, 0, 2.0], np.float32))
    uniforms = make_uniforms(cam, 48, 48)
    state = build_frame_state(scene, dev_models, uniforms)
    return scene.device_arrays(), state


def test_split_k_image_parity():
    """clip_layers=2 must produce the same image as the inherited
    blend_layers=8 when no pixel has more than 2 clip fragments."""
    dev, state = _mixed_scene()
    base = dict(width=48, height=48, t_cap=64, t_cap_anim=8, raster="ref",
                enable_clip=True, enable_blend=True, blend_layers=8)
    img_u = np.asarray(
        render_frame(dev, state, RenderConfig(**base), EnvBindings())
    )
    img_s = np.asarray(
        render_frame(
            dev, state,
            RenderConfig(clip_layers=2, **base),
            EnvBindings(),
        )
    )
    assert np.array_equal(img_u, img_s)


def test_transparent_granule_worklists_image_parity():
    """At a granule-compatible width (128) the clip resolve and per-layer
    blend worklists compact 128-px row-granules; the image must be
    identical to the per-pixel worklist form (worklist_granules=False) —
    the granule machinery changes only HOW lanes are gathered/composited,
    never which pixels shade."""
    dev, state = _mixed_scene()
    # uniforms were built for 48x48; rebuild the frame for 128x64
    scene = None  # state carries the device scene; only config changes
    base = dict(width=128, height=64, t_cap=64, t_cap_anim=8, raster="ref",
                enable_clip=True, enable_blend=True, blend_layers=8,
                shade_px_cap=4096)
    img_g = np.asarray(
        render_frame(dev, state, RenderConfig(**base), EnvBindings())
    )
    img_p = np.asarray(
        render_frame(
            dev, state, RenderConfig(worklist_granules=False, **base),
            EnvBindings(),
        )
    )
    assert np.array_equal(img_g, img_p)
    # A non-default granule size (64: two granules per 128-px row) must
    # also be exact — RenderConfig.granule_px only regroups lanes.
    img_g64 = np.asarray(
        render_frame(
            dev, state, RenderConfig(granule_px=64, **base), EnvBindings()
        )
    )
    assert np.array_equal(img_g64, img_p)


def test_split_k_stats_per_pass():
    from superconductor_tpu.render.frame import (
        render_frame_stats,
        stats_to_host,
    )

    dev, state = _mixed_scene(n_blend=6, n_clip=2)
    cfg = RenderConfig(
        width=48, height=48, t_cap=64, t_cap_anim=8, raster="ref",
        enable_clip=True, enable_blend=True, blend_layers=8,
    )
    _, stats = render_frame_stats(dev, state, cfg, EnvBindings())
    stats = stats_to_host(stats)
    assert stats["blend_layers_needed"] == 6
    assert stats["clip_layers_needed"] == 2
    assert stats["particle_layers_needed"] == 0
    assert stats["layers_needed"] == 6  # back-compat aggregate


def _ecs_mixed(k_init, updates):
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
                blend_layers=k_init,
            )
        )
    )
    w = app.world
    scene = w.resource(SceneResource).scene
    for i in range(6):
        m = scene.add_material(
            MaterialSettings(
                base_color_factor=(1, 0, 0, 0.5), flags=MAT_UNLIT,
                blend_mode=BLEND_ALPHA_BLENDED,
            )
        )
        e = w.spawn(ModelComponent(make_quad_model(scene, m)))
        w.spawn(Instance(Sim(translation=[0, 0, -0.5 + 0.1 * i])),
                InstanceOf(e))
    for i in range(2):
        m = scene.add_material(
            MaterialSettings(
                base_color_factor=(0, 1, 0, 1.0), flags=MAT_UNLIT,
                blend_mode=BLEND_ALPHA_CLIPPED,
            )
        )
        e = w.spawn(ModelComponent(make_quad_model(scene, m)))
        w.spawn(Instance(Sim(translation=[0.55, 0.55, 0.3 + 0.1 * i])),
                InstanceOf(e))
    w.resource(CameraResource).camera.position = np.array(
        [0, 0, 2.0], np.float32
    )
    for _ in range(updates):
        app.update()
    return (
        np.asarray(w.resource(FrameOutput).image)[0],
        w.resource(RenderSettings).config,
    )


def test_ecs_grows_blend_and_tightens_clip():
    """6 blend layers force blend_layers 4 -> 8; the clip pass must NOT
    inherit that depth — the first clean stats frame pins clip_layers to
    its own need (2) — and the image must match a hand-set config."""
    img_auto, cfg = _ecs_mixed(k_init=4, updates=4)
    assert cfg.blend_layers == 8, cfg
    assert cfg.clip_layers == 2, cfg
    img_manual, cfg_m = _ecs_mixed(k_init=8, updates=4)
    assert cfg_m.clip_layers == 2
    assert np.array_equal(img_auto, img_manual)


def test_ecs_tighten_is_stable():
    """After the tighten settles, further updates must not flap the config
    (flapping = recompile every frame)."""
    _, cfg1 = _ecs_mixed(k_init=8, updates=4)
    _, cfg2 = _ecs_mixed(k_init=8, updates=6)
    assert cfg1 == cfg2


def test_sorted_pair_mode_matches_ref_all_passes():
    """Sorted-pair mode (pallas raster leaves sorted bin positions; shade
    tables gathered into sorted order — no full-screen id remap) must be
    image-exact vs the ref raster on a scene exercising opaque + clip +
    blend passes. Guards the vis_row offset bookkeeping (clip rows at
    [p_cap, 2*p_cap)) and the per-pass table reindexing."""
    dev, state = _mixed_scene()
    base = dict(
        width=48, height=48, t_cap=64, p_cap=256,
        enable_clip=True, enable_blend=True, blend_layers=8,
    )
    ref = np.asarray(
        render_frame(dev, state, RenderConfig(raster="ref", **base),
                     EnvBindings())
    )
    pal = np.asarray(
        render_frame(dev, state, RenderConfig(raster="pallas", **base),
                     EnvBindings())
    )
    np.testing.assert_array_equal(ref, pal)
