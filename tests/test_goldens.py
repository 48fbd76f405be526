"""Golden-image regression tests (PSNR >= 40 dB vs committed PNGs).

Regenerate after intentional visual changes:
    SC_REGEN_GOLDENS=1 python -m pytest tests/test_goldens.py
BASELINE.json's quality gate is 35 dB; the self-regression bar is higher
because only float-rounding drift is acceptable between commits.
"""

import os

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
from superconductor_tpu.math3d import (
    look_at,
    mat3_to_quat,
    mat4_inverse,
    quat_from_axis_angle,
)
from superconductor_tpu.render.draws import build_frame_state
from superconductor_tpu.utils.metrics import psnr
from superconductor_tpu.utils.procgen import add_pbr_sphere, default_ambient_sh

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _check(name: str, img: np.ndarray):
    import imageio.v3 as iio

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    if os.environ.get("SC_REGEN_GOLDENS") or not os.path.exists(path):
        iio.imwrite(path, img)
        if not os.environ.get("SC_REGEN_GOLDENS"):
            pytest.skip(f"golden {name} created; rerun to compare")
        return
    golden = iio.imread(path)
    db = psnr(golden, img)
    assert db >= 40.0, f"{name}: PSNR {db:.1f} dB vs golden"


def test_golden_unlit_box(box_glb):
    from superconductor_tpu.assets.models import load_model

    scene = Scene()
    model = load_model(scene, box_glb, name="box")
    camera = Camera(position=np.array([0.9, 0.8, 1.8], np.float32))
    v = look_at(camera.position, [0, 0, 0])
    camera.rotation = mat3_to_quat(mat4_inverse(v)[:3, :3])
    uniforms = make_uniforms(camera, 128, 128)
    state = build_frame_state(
        scene,
        [(model, Similarity(rotation=quat_from_axis_angle([0, 1, 0], 0.4)))],
        uniforms,
    )
    config = RenderConfig(width=128, height=128, t_cap=32, t_cap_anim=8, raster="ref")
    img = np.asarray(
        render_frame(
            scene.device_arrays(), state, config, EnvBindings(clear_color=(0.1, 0.15, 0.3))
        )
    )[0]
    _check("unlit_box", img)


def test_golden_pbr_sphere():
    scene = Scene()
    model = add_pbr_sphere(scene, stacks=32, slices=32)
    camera = Camera(position=np.array([0.0, 0.25, 2.3], np.float32))
    uniforms = make_uniforms(camera, 160, 120)
    state = build_frame_state(
        scene,
        [(model, Similarity(rotation=quat_from_axis_angle([0, 1, 0], 0.6)))],
        uniforms,
    )
    config = RenderConfig(width=160, height=120, t_cap=4096, t_cap_anim=8, raster="ref")
    env = EnvBindings(ambient_sh=default_ambient_sh(), clear_color=(0.1, 0.12, 0.25))
    img = np.asarray(render_frame(scene.device_arrays(), state, config, env))[0]
    _check("pbr_sphere", img)


def test_golden_sponza_cubes_real_assets(sponza_cubes_glb):
    """Real-asset golden: sponza_cubes.glb + the BC6H/BCn lightvol + the
    noon.ktx2 IBL cubemap — the demo scene configuration of
    demo/src/lib.rs:114-192 on the assets bundled with the reference."""
    import dataclasses

    from superconductor_tpu.assets.environment import (
        load_ibl_cubemap,
        load_lightvol,
    )
    from superconductor_tpu.assets.models import load_model

    assets = "/root/reference/demo/web/assets"
    scene = Scene()
    model = load_model(scene, sponza_cubes_glb, name="sponza_cubes")
    lv = f"{assets}/lighting/bcn"
    load_lightvol(
        scene,
        open(f"{lv}/lightvol.ktx2", "rb").read(),
        open(f"{lv}/lightvol_x.ktx2", "rb").read(),
        open(f"{lv}/lightvol_y.ktx2", "rb").read(),
        open(f"{lv}/lightvol_z.ktx2", "rb").read(),
        # ProbesArrayInfo::new(center (0,6,0), scale (24,12,12)) of the
        # reference demo (demo/src/lib.rs:120-123): scale is the volume's
        # full world extent, so rescaled coords span [0,1] over the volume
        bottom_left=(-12.0, 0.0, -6.0),
        scale=(24.0, 12.0, 12.0),
    )
    load_ibl_cubemap(scene, open(f"{assets}/cubemaps/noon.ktx2", "rb").read())

    camera = Camera(position=np.array([7.0, 2.0, 2.5], np.float32))
    v = look_at(camera.position, [0, 1.2, 0])
    camera.rotation = mat3_to_quat(mat4_inverse(v)[:3, :3])
    uniforms = make_uniforms(camera, 192, 108)
    uniforms.probes_bottom_left = np.asarray(
        scene.lightvol["bottom_left"], np.float32
    )
    uniforms.probes_scale = np.asarray(scene.lightvol["scale"], np.float32)
    state = build_frame_state(scene, [(model, Similarity())], uniforms)
    config = RenderConfig(width=192, height=108, t_cap=4096, raster="ref")
    env = EnvBindings.from_scene(scene)
    img = np.asarray(
        render_frame(scene.device_arrays(), state, config, env)
    )[0]
    # sanity: the frame is lit scene content, not black or clear color
    assert img[..., :3].mean() > 10
    _check("sponza_cubes_real", img)
