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
