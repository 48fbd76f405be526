"""Line and particle pipeline tests (reference raster path on CPU)."""

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
from superconductor_tpu.render.draws import (
    build_frame_state,
    pack_lines,
    pack_particles,
)
from superconductor_tpu.utils.procgen import default_ambient_sh


def test_lines_render_with_depth():
    scene = Scene()
    camera = Camera(position=np.array([0, 0, 2.0], np.float32))
    uniforms = make_uniforms(camera, 64, 64)
    # A white horizontal line through the origin (color id 15 = white).
    lines = pack_lines(
        [[[-0.8, 0.0, 0.0], [0.8, 0.0, 0.0]]], [15]
    )
    state = build_frame_state(scene, [], uniforms, lines=lines)
    config = RenderConfig(
        width=64, height=64, t_cap=8, t_cap_anim=8, raster="ref",
        enable_lines=True,
    )
    img = np.asarray(
        render_frame(scene.device_arrays(), state, config, EnvBindings())
    )[0]
    # Line crosses the middle row; white pixels present there.
    mid = img[31:34, :, :3]
    assert (mid == 255).all(axis=-1).any()
    # Elsewhere: black background.
    assert img[8, 8, :3].max() == 0


def test_particles_render_and_blend():
    scene = Scene()
    camera = Camera(position=np.array([0, 0, 2.0], np.float32))
    uniforms = make_uniforms(camera, 64, 64)
    particles = pack_particles(
        [
            {
                "center": [0, 0, 0],
                "scale": [1.0, 1.0],
                "colour": [1.0, 0.2, 0.2],
                "emissive_colour": [2.0, 2.0, 2.0],
            }
        ]
    )
    state = build_frame_state(scene, [], uniforms, particles=particles)
    config = RenderConfig(
        width=64, height=64, t_cap=8, t_cap_anim=8, raster="ref",
        enable_particles=True,
    )
    env = EnvBindings(ambient_sh=default_ambient_sh())
    img = np.asarray(render_frame(scene.device_arrays(), state, config, env))[0]
    # Center shows the (procedural fallback) puff; corners stay background.
    assert img[32, 32, :3].sum() > 60
    assert img[4, 4, :3].sum() < 30


def test_particles_behind_opaque_hidden(box_glb):
    from superconductor_tpu.assets.models import load_model

    scene = Scene()
    model = load_model(scene, box_glb, name="box")
    camera = Camera(position=np.array([0, 0, 2.0], np.float32))
    uniforms = make_uniforms(camera, 64, 64)
    particles = pack_particles(
        [
            {
                "center": [0, 0, -3.0],  # behind the box
                "scale": [0.5, 0.5],
                "colour": [0, 1, 0],
                "emissive_colour": [10.0, 10.0, 10.0],
            }
        ]
    )
    state = build_frame_state(
        scene, [(model, Similarity())], uniforms, particles=particles
    )
    config = RenderConfig(
        width=64, height=64, t_cap=32, t_cap_anim=8, raster="ref",
        enable_particles=True,
    )
    img = np.asarray(
        render_frame(scene.device_arrays(), state, config, EnvBindings())
    )[0]
    # The box (unlit red) hides the particle at the center.
    assert img[32, 32, 0] == 255 and img[32, 32, 1] < 130


def test_sorted_pair_mode_matches_remap_lines_particles(box_glb):
    """Pallas sorted-pair mode (lines pass reindexes line_colors by
    bins.order; particle pass reindexes ParticleAttrs.packed) must match
    the classic full-screen-remap path ON THE SAME KERNEL bit-exactly —
    guards the per-pass sorted-table plumbing of render_view. (vs-ref
    comparison is not used here: the pallas and ref rasters differ by
    ulps on particle quads regardless of this feature.)"""
    import jax

    from superconductor_tpu.assets.models import load_model
    from superconductor_tpu.render import frame as frame_mod
    from superconductor_tpu.render.draws import pack_lines

    scene = Scene()
    model = load_model(scene, box_glb, name="box")
    camera = Camera(position=np.array([0.3, 0.4, 2.0], np.float32))
    uniforms = make_uniforms(camera, 64, 64)
    particles = pack_particles(
        [
            {
                "center": [0.6, 0.2, 0.5],
                "scale": [0.8, 0.8],
                "colour": [1.0, 0.2, 0.2],
                "emissive_colour": [2.0, 2.0, 2.0],
            },
            {
                "center": [-0.5, -0.3, 0.8],
                "scale": [0.6, 0.6],
                "colour": [0.2, 1.0, 0.2],
                "emissive_colour": [1.0, 2.0, 1.0],
            },
        ]
    )
    lines = pack_lines(
        [[[-1, 0.8, 0], [1, 0.8, 0]], [[-0.8, -1, 0], [-0.8, 1, 0]]],
        [0, 5],
    )
    state = build_frame_state(
        scene, [(model, Similarity())], uniforms,
        particles=particles, lines=lines,
    )
    config = RenderConfig(
        width=64, height=64, t_cap=32, t_cap_anim=8, p_cap=256,
        enable_particles=True, enable_lines=True, raster="pallas",
    )
    env = EnvBindings(ambient_sh=default_ambient_sh())
    dev = scene.device_arrays()

    def run():
        # fresh jit per flag value: the flag is read at trace time
        return np.asarray(jax.jit(
            frame_mod.render_frame_impl, static_argnames=("config", "env")
        )(dev, state, config, env))

    assert frame_mod.SORTED_PAIR_MODE
    srt = run()
    frame_mod.SORTED_PAIR_MODE = False
    try:
        classic = run()
    finally:
        frame_mod.SORTED_PAIR_MODE = True
    np.testing.assert_array_equal(srt, classic)


def test_smoke_pool_matches_classic_sampling():
    """The dedicated interleaved smoke pool (Scene.device_smoke +
    EnvBindings.smoke_static) is bit-exact vs sampling the smoke maps
    and LUT from the shared LDR quad pool — same quad rows, same lerp,
    only the table and addressing change."""
    import numpy as np

    from superconductor_tpu import (
        Camera,
        EnvBindings,
        RenderConfig,
        Scene,
        make_uniforms,
        render_frame,
    )
    from superconductor_tpu.render.draws import build_frame_state, pack_particles
    from superconductor_tpu.scene.scene import TEXFLAG_SRGB, WRAP_CLAMP

    rng = np.random.default_rng(5)

    def tex(size, lo=0, hi=255):
        return rng.integers(lo, hi, (size, size, 4), np.uint8)

    scene = Scene()
    a_id = scene.textures.add_texture([tex(64)], wrap=WRAP_CLAMP)
    b_id = scene.textures.add_texture([tex(64, lo=40)], wrap=WRAP_CLAMP)
    lut_id = scene.textures.add_texture(
        [tex(32)], wrap=WRAP_CLAMP, flags=TEXFLAG_SRGB
    )
    scene.smoke_tex = (a_id, b_id, lut_id)

    cam = Camera(position=np.array([0.3, 0.4, 4.0], np.float32))
    uniforms = make_uniforms(cam, 192, 96)
    parts = [
        {"center": [-0.6, 0.1, -0.8], "scale": [1.6, 1.4],
         "colour": [0.9, 0.85, 0.95], "emissive_colour": [0.4, 0.25, 0.1]},
        {"center": [0.5, -0.2, 0.0], "scale": [1.8, 1.8],
         "colour": [0.8, 0.9, 1.0], "emissive_colour": [0.5, 0.4, 0.6],
         "use_emissive_lut": 1, "lut_y": 0.35},
    ]
    state = build_frame_state(
        scene, [], uniforms, particles=pack_particles(parts)
    )
    config = RenderConfig(
        width=192, height=96, raster="ref", enable_particles=True,
    )
    env = EnvBindings.from_scene(
        scene, ambient_sh=(0.6, 0.6, 0.65, 0.2, 0.1, 0.1,
                           0.2, 0.2, 0.2, 0.1, 0.1, 0.1)
    )
    assert env.smoke_static is not None
    dev = scene.device_arrays()
    assert "smoke_ab" in dev and "smoke_lut" in dev
    assert dev["smoke_ab"].shape == (64 * 64, 32)

    img_pool = np.asarray(render_frame(dev, state, config, env))[0]

    dev2 = dict(dev)
    dev2.pop("smoke_ab")
    dev2.pop("smoke_lut")
    img_classic = np.asarray(render_frame(dev2, state, config, env))[0]
    assert (img_pool[..., :3] > 0).any()  # particles actually rendered
    assert np.array_equal(img_pool, img_classic)
