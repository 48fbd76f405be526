"""Stereo multiview (config 5): dual-eye render, parallax, composite."""

import numpy as np

from superconductor_tpu import (
    EnvBindings,
    Camera,
    RenderConfig,
    Scene,
    Similarity,
    render_frame,
)
from superconductor_tpu.render.draws import build_frame_state
from superconductor_tpu.render.stereo import (
    composite_side_by_side,
    stereo_uniforms_from_camera,
)
from superconductor_tpu.render.culling import sphere_culling_params


def test_stereo_renders_two_views_with_parallax(box_glb):
    from superconductor_tpu.assets.models import load_model

    scene = Scene()
    model = load_model(scene, box_glb, name="box")
    cam = Camera(position=np.array([0, 0, 1.6], np.float32))
    uniforms = stereo_uniforms_from_camera(cam, 96, 96, ipd=0.3)

    # Per-eye culling union (CullingParams::Vr, src/resources.rs:166-184).
    culls = [
        sphere_culling_params(uniforms.view_proj[0]),
        sphere_culling_params(uniforms.view_proj[1]),
    ]
    state = build_frame_state(
        scene, [(model, Similarity())], uniforms, cull_params=culls
    )
    config = RenderConfig(
        width=96, height=96, t_cap=64, t_cap_anim=8, raster="ref", num_views=2
    )
    frames = np.asarray(
        render_frame(scene.device_arrays(), state, config, EnvBindings())
    )
    assert frames.shape == (2, 96, 96, 4)

    left_red = frames[0][..., 0] == 255
    right_red = frames[1][..., 0] == 255
    assert left_red.sum() > 100 and right_red.sum() > 100
    # Parallax: with a large IPD the box's horizontal center differs
    # noticeably between the eyes (left eye sees it shifted right).
    lx = np.where(left_red.any(axis=0))[0].mean()
    rx = np.where(right_red.any(axis=0))[0].mean()
    assert lx - rx > 4

    sbs = composite_side_by_side(frames)
    assert sbs.shape == (96, 192, 4)
    np.testing.assert_array_equal(sbs[:, :96], frames[0])
    np.testing.assert_array_equal(sbs[:, 96:], frames[1])
