"""Full-frame parity: Pallas raster path vs brute-force reference path.

The two visibility implementations are independent; identical frames mean
binning, the kernel and the pair-id remap are all consistent.
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
from superconductor_tpu.math3d import quat_from_axis_angle
from superconductor_tpu.render.draws import build_frame_state
from superconductor_tpu.utils.metrics import psnr
from superconductor_tpu.utils.procgen import add_pbr_sphere, default_ambient_sh


def test_frame_pallas_vs_ref_psnr():
    width, height = 160, 96
    scene = Scene()
    model = add_pbr_sphere(scene, stacks=24, slices=24)
    camera = Camera(position=np.array([0.0, 0.2, 2.4], np.float32))
    uniforms = make_uniforms(camera, width, height)
    sim = Similarity(rotation=quat_from_axis_angle([0, 1, 0], 0.4))
    state = build_frame_state(scene, [(model, sim)], uniforms)
    env = EnvBindings(
        ambient_sh=default_ambient_sh(), clear_color=(0.1, 0.1, 0.3)
    )
    dev = scene.device_arrays()

    imgs = {}
    for raster in ("ref", "pallas"):
        config = RenderConfig(
            width=width,
            height=height,
            t_cap=2048,
            t_cap_anim=8,
            p_cap=8192,
            raster=raster,
        )
        imgs[raster] = np.asarray(render_frame(dev, state, config, env))[0]

    # Geometry hit masks must agree exactly; shading is identical math, so
    # the only differences allowed are ties on shared edges.
    db = psnr(imgs["ref"], imgs["pallas"])
    assert db > 45.0, f"PSNR too low: {db}"
    # sanity: scene is actually lit and textured (not all one color)
    assert imgs["ref"][..., :3].std() > 20
